"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference engine is batch-only (SURVEY.md section 2.9), so like
``streaming/windows.py`` these are scale-out extensions.  The pattern here
is the one Structured Streaming prescribes for operators its built-ins
can't express: group by key, hold explicit per-key state across
micro-batches, emit in update mode, bound state with a watermark/timeout.

``first_event_per_key`` is streaming first-occurrence filtering -- the
streaming face of exact dedup: an unbounded firehose keyed by user (or by
content hash for document dedup) where only each key's first record may
pass downstream.  State per key is a single boolean, so state size is
O(distinct keys) regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

FIRST_EVENT_SCHEMA = (
    "user_id bigint, first_ts timestamp, first_event_id bigint,"
    " first_value double"
)
_STATE_SCHEMA = "first_ts timestamp, first_event_id bigint"


def first_event_per_key(
    events: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit each key's FIRST event (min (ts, event_id)) across the
    whole stream, in update mode.

    Streaming path: ``applyInPandasWithState`` holding the current
    winner's (ts, event_id) per key; a key emits on the micro-batch
    where it is first seen and AGAIN whenever a later batch delivers a
    late-but-earlier event inside the watermark (the update-mode row
    replaces the previous winner downstream, the same convergence
    contract as ``dedup_stream``).  Events older than the watermark are
    dropped by the engine before reaching the state function, so the
    output converges to the batch twin's minimum over all events that
    survived the watermark.

    Batch path (same function on a non-streaming frame): a row_number
    window -- the SQL-expressible twin the DuckDB oracle checks.
    """
    if not events.isStreaming:
        win = Window.partitionBy("user_id").orderBy("ts", "event_id")
        return (
            events.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(
                "user_id",
                F.col("ts").alias("first_ts"),
                F.col("event_id").alias("first_event_id"),
                F.col("value").alias("first_value"),
            )
        )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(["ts", "event_id"]).iloc[0]
            cand = (top["ts"], top["event_id"], top["value"])
            if best is None or (cand[0], cand[1]) < (best[0], best[1]):
                best = cand
        if best is None:
            return
        if state.exists:
            cur_ts, cur_id = state.get
            # suppress unless this batch brought a strictly earlier
            # event (late data inside the watermark)
            if (pd.Timestamp(cur_ts), cur_id) <= (
                    pd.Timestamp(best[0]), best[1]):
                return
        state.update((best[0], int(best[1])))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "first_ts": [best[0]],
                "first_event_id": [best[1]],
                "first_value": [best[2]],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            FIRST_EVENT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


DEDUP_STREAM_SCHEMA = (
    "content_hash string, keep_id bigint, text string"
)
_DEDUP_STATE_SCHEMA = "keep_id bigint, text string"


def dedup_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact document dedup: of all docs sharing a content
    hash across the WHOLE stream, only the lowest-doc_id first arrival
    passes downstream -- the streaming face of
    ``extensions.dedup.dedup_exact``'s keep-one semantics, for feeding a
    training-data pipeline from a firehose.

    Streaming path: one (keep_id, text) record of state per distinct
    content hash (``applyInPandasWithState``, update mode): a hash
    emits on the micro-batch where it is first seen, and again whenever
    a later batch delivers a LOWER doc_id (update-mode row replaces the
    previous winner downstream), so the stream converges to the batch
    twin's global minimum over everything that has arrived. State is
    O(distinct documents) no matter how long the stream runs.

    Batch path (same function on a non-streaming frame): the
    row_number-window twin, SQL-expressible for oracle checks.
    """
    hashed = docs.select(
        F.md5(F.col("text")).alias("content_hash"), "doc_id", "text"
    )
    if not docs.isStreaming:
        win = Window.partitionBy("content_hash").orderBy("doc_id")
        return (
            hashed.withColumn("rn", F.row_number().over(win))
            .filter(F.col("rn") == 1)
            .select(
                "content_hash", F.col("doc_id").alias("keep_id"), "text"
            )
        )

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values("doc_id").iloc[0]
            if best is None or top["doc_id"] < best[0]:
                best = (int(top["doc_id"]), top["text"])
        if best is None:
            return
        if state.exists:
            kept_id, kept_text = state.get
            if best[0] >= kept_id:
                return
        state.update((best[0], best[1]))
        yield pd.DataFrame(
            {
                "content_hash": [key[0]],
                "keep_id": [best[0]],
                "text": [best[1]],
            }
        )

    return hashed.groupBy("content_hash").applyInPandasWithState(
        fn,
        DEDUP_STREAM_SCHEMA,
        _DEDUP_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
