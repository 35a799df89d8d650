"""Sequence packing: lay a document corpus end-to-end into fixed-length
training sequences (the GPT-style "concatenate and chunk" batching that
every LLM pre-training pipeline runs between data curation and the
trainer).

Semantics
---------
Documents are concatenated in ``doc_id`` order into one global token
stream; the stream is cut every ``seq_len`` tokens.  ``pack_sequences``
returns one row per (document x sequence) overlap:

    (doc_id, seq_id, doc_off, seq_off, n_tok)

i.e. tokens ``[doc_off, doc_off + n_tok)`` of the document land at
``[seq_off, seq_off + n_tok)`` of training sequence ``seq_id``.  A
document shorter than the remaining room contributes one row; a
document straddling a boundary is split across consecutive sequences
(no padding, no document loss -- the standard packing contract).
Zero-token documents contribute nothing.

Scale design
------------
The only global state is the prefix sum of token counts in ``doc_id``
order.  A single ``Window.orderBy(doc_id)`` would funnel the whole
corpus through ONE task, so the prefix sum is computed in the
two-phase range-partitioned form (the same trick as
``RDD.zipWithIndex``):

1. bucket each doc by a monotonic range of ``doc_id``
   (``n_buckets`` ~ cluster parallelism; bucket boundaries from the
   1-row global min/max scalar),
2. per-bucket token totals -- ONE map-side-combinable ``groupBy`` over
   ``n_buckets`` rows, cumulated driver-side into bucket base offsets
   (a ~KB literal map, broadcast into the plan),
3. per-bucket cumulative sums -- a window partitioned BY BUCKET, so
   every task sorts only its own range slice.

Total: one scalar agg, one tiny agg, one bucket-partitioned window.
No global sort, no single-task stage; the span fan-out is a narrow
``explode(sequence(...))``.  Token counts are whitespace tokens
(``text.tokens_col``) by default -- swap ``n_tokens_col`` in for a
real tokenizer's counts when available.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = ["pack_sequences", "packing_stats", "shuffle_shards",
           "assemble_sequences", "release_cached",
           "build_token_vocab", "write_token_shards",
           "read_token_shards"]

# counts tables persisted by _with_prefix_sum (three consumers: the
# min/max scalar, the bucket totals, and the window) -- same lifecycle
# pattern as dedup._PERSISTED
_PERSISTED: list[DataFrame] = []


def release_cached() -> None:
    """Unpersist every token-count table cached by prior packing calls."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


def _with_prefix_sum(
    counts: DataFrame, n_buckets: int
) -> DataFrame | None:
    """(doc_id, n_tok) -> + ``start`` = tokens before this doc in
    doc_id order, via the two-phase range-partitioned prefix sum.
    ``None`` when the input is empty."""
    counts = counts.persist()
    _PERSISTED.append(counts)
    lo, hi = counts.agg(
        F.min("doc_id"), F.max("doc_id")
    ).first()
    if lo is None:
        return None
    span = int(hi) - int(lo) + 1
    if span > 2 ** 62:
        # (doc_id - lo) must stay well inside int64 on the executors
        raise ValueError(
            f"doc_id span [{lo}, {hi}] is too wide to range-bucket; "
            "remap ids to a narrower range first")
    nb = max(1, min(int(n_buckets), span))
    # exact integer bucketing, monotonic in doc_id (so (bucket, doc_id)
    # order == doc_id order): width W >= span/nb guarantees the max id
    # lands in bucket <= nb-1.  Double arithmetic here would wrap or
    # round past 2**53 for hash-derived 64-bit ids and silently
    # scramble the prefix order.
    width = -(-span // nb)
    bucket = F.expr(
        f"CAST((doc_id - {int(lo)}) DIV {width} AS INT)")
    b = counts.withColumn("bucket", bucket)
    totals = (
        b.groupBy("bucket").agg(F.sum("n_tok").alias("tot"))
        .orderBy("bucket").collect()
    )
    base, acc = {}, 0
    for r in totals:
        base[int(r["bucket"])] = acc
        acc += int(r["tot"])
    base_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in base.items() for x in kv]
        ),
        F.col("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return b.withColumn(
        "start",
        base_col + F.coalesce(F.sum("n_tok").over(w), F.lit(0)),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_tokens_col: Column | None = None,
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing plan: one row per (doc x sequence)
    overlap -- see the module docstring for the contract."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    # count NON-EMPTY split fields: split keeps empty edge fields, so
    # '\\thello' or a '\\n'-only doc would otherwise count phantom
    # tokens (F.trim strips only spaces, not \\t/\\n)
    default_n = F.size(F.filter(
        tokens_col(F.col(text_col)), lambda t: t != F.lit("")
    ))
    n_tok = (
        n_tokens_col if n_tokens_col is not None else default_n
    ).cast("bigint")
    counts = (
        docs.select("doc_id", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
    )
    placed = _with_prefix_sum(counts, n_buckets)
    if placed is None:
        return docs.sparkSession.createDataFrame(
            [],
            "doc_id bigint, seq_id bigint, doc_off bigint, "
            "seq_off bigint, n_tok bigint",
        )
    L = F.lit(int(seq_len))
    # integer DIV: double division would round past 2**53 total tokens
    first_seq = F.expr(f"start DIV {int(seq_len)}")
    last_seq = F.expr(f"(start + n_tok - 1) DIV {int(seq_len)}")
    seg_start = F.greatest(F.col("start"), F.col("seq_id") * L)
    seg_end = F.least(
        F.col("start") + F.col("n_tok"), (F.col("seq_id") + 1) * L
    )
    return (
        placed.select(
            "doc_id", "start", "n_tok",
            F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        )
        .select(
            "doc_id",
            "seq_id",
            (seg_start - F.col("start")).alias("doc_off"),
            (seg_start - F.col("seq_id") * L).alias("seq_off"),
            (seg_end - seg_start).alias("n_tok"),
        )
    )


def packing_stats(
    docs: DataFrame,
    seq_len: int = 2048,
    n_tokens_col: Column | None = None,
    n_buckets: int = 256,
    text_col: str = "text",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Per-sequence packing summary: how many documents feed each
    sequence, how many are mid-document continuations, and the fill
    level (the last sequence is the only one allowed to be short).
    Pass ``spans`` (a ``pack_sequences`` result) to summarize an
    existing plan instead of recomputing it."""
    if spans is None:
        spans = pack_sequences(
            docs, seq_len, n_tokens_col, n_buckets, text_col)
    return (
        spans.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("doc_off") > 0).cast("bigint"))
            .alias("n_continuations"),
            F.sum("n_tok").alias("n_tok"),
        )
        .select(
            "seq_id", "n_docs", "n_continuations", "n_tok",
            F.round(F.col("n_tok") / F.lit(int(seq_len)), 6)
            .alias("fill"),
        )
    )


def shuffle_shards(
    spans: DataFrame,
    n_shards: int,
    seed: str = "",
) -> DataFrame:
    """Deterministic training-order shuffle: assign every packed
    sequence (a ``pack_sequences`` result, or any frame with a
    ``seq_id`` column) to an output shard and a position within it.

    Real pipelines randomize sequence order before the trainer reads
    shards round-robin; doing it with ``rand()`` makes reruns
    unreproducible.  Here both decisions are the keyed md5 hash of
    ``seq_id`` (the same engine-portable scheme as
    ``sampling.sample_by_hash``): shard = hash mod ``n_shards``,
    position = rank of (hash, seq_id) within the shard.  Returns
    ``(seq_id, shard, pos)``, one row per distinct sequence.

    100-TB shape: one distinct on seq_id (map-side combinable) and one
    window partitioned BY SHARD -- each task sorts only its own
    shard's ids, never a global order.  Choose ``n_shards`` >= cluster
    parallelism so no task sorts more than ~total/n_shards rows.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    from .sampling import _keyed_hash

    seqs = spans.select("seq_id").distinct()
    h = _keyed_hash(F.col("seq_id"), seed, "shard")
    win = Window.partitionBy("shard").orderBy(
        F.col("h").asc(), F.col("seq_id").asc())
    return (
        seqs.select(
            "seq_id",
            F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"),
            h.alias("h"),
        )
        .withColumn("pos", F.row_number().over(win).cast("bigint"))
        .select("seq_id", "shard", "pos")
    )


def assemble_sequences(
    tokens: DataFrame,
    spans: DataFrame,
    tokens_col: str = "tokens",
    strict: bool = True,
) -> DataFrame:
    """Materialize the training sequences a :func:`pack_sequences` plan
    describes: join each (doc x sequence) span back to the document's
    token array, slice its ``[doc_off, doc_off + n_tok)`` piece, and
    reassemble per ``seq_id`` in ``seq_off`` order.

    ``tokens`` is ``(doc_id, <tokens_col> array<string>)`` -- e.g. the
    output of ``bpe.bpe_tokenize`` -- and must be the SAME tokenization
    the plan's token counts came from, or slices will misalign (the
    plan carries counts only).

    Returns ``(seq_id, n_tok, tokens)``.  The last sequence of the
    stream may be shorter than ``seq_len``; every other one is exactly
    full by the packing contract.

    Scale shape: one equi-join on ``doc_id`` (the span table is a few
    rows per document) and one ``groupBy(seq_id)`` whose groups are
    bounded by ``seq_len`` tokens -- both shuffles on natural keys, no
    global sort; pieces order inside a group by a bounded
    ``sort_array`` over at most seq_len struct entries.

    With ``strict=True`` (the default) every slice is checked against
    the plan: a document missing from ``tokens`` or a token array
    shorter than the planned span raises immediately (naming the
    ``doc_id``) instead of silently dropping or truncating pieces into
    corrupted mid-stream sequences.  ``strict=False`` restores the
    unguarded inner-join behavior for callers that pre-filter.
    """
    piece = F.slice(
        F.col(tokens_col),
        (F.col("doc_off") + 1).cast("int"),
        F.col("n_tok").cast("int"),
    )
    if strict:
        ok = F.col(tokens_col).isNotNull() & (
            F.size(piece).cast("bigint") == F.col("n_tok")
        )
        msg = F.concat(
            F.lit("assemble_sequences: doc_id="),
            F.col("doc_id").cast("string"),
            F.lit(" has "),
            F.coalesce(
                F.size(F.col(tokens_col)).cast("string"), F.lit("NO")
            ),
            F.lit(" tokens but the plan expects a slice of "),
            F.col("n_tok").cast("string"),
            F.lit(" at offset "),
            F.col("doc_off").cast("string"),
            F.lit(" -- tokens frame does not match the plan's "
                  "tokenization"),
        )
        # assert_true returns NULL when ok and throws otherwise; keep it
        # inside the piece expression so Catalyst cannot prune it away
        piece = F.when(F.assert_true(ok, msg).isNull(), piece)
        joined = spans.join(tokens, "doc_id", "left")
    else:
        joined = spans.join(tokens, "doc_id")
    joined = joined.select(
        "seq_id",
        F.struct(F.col("seq_off"), piece.alias("piece")).alias("part"),
    )
    parts = F.sort_array(F.collect_list("part"))
    return (
        joined.groupBy("seq_id")
        .agg(parts.alias("parts"))
        .select(
            "seq_id",
            F.flatten(
                F.transform(F.col("parts"), lambda p: p["piece"])
            ).alias("tokens"),
        )
        .select(
            "seq_id",
            F.size("tokens").cast("bigint").alias("n_tok"),
            "tokens",
        )
    )


# ------------------------------------------------------------------ #
# sharded training-output writer (the Megatron .bin/.idx shape)

_SHARD_MAGIC = b"XRSPSHRD"
_SHARD_VERSION = 1
_DTYPES = {"uint16": 2, "uint32": 4}


def build_token_vocab(
    seqs: DataFrame, tokens_col: str = "tokens"
) -> DataFrame:
    """Deterministic token vocabulary over a tokens-array column:
    ``(tok, tok_id)`` with ids assigned by descending frequency, ties
    to the lexicographically smaller token (id 0 = most frequent).

    The counting is one map-side-combinable shuffle; the id
    assignment is a global rank over the VOCABULARY (model-sized --
    tens of thousands of types, not corpus-sized), so the single-task
    window is bounded regardless of corpus size.
    """
    counts = (
        seqs.select(F.explode(F.col(tokens_col)).alias("tok"))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    )
    win = Window.orderBy(F.col("n").desc(), F.col("tok").asc())
    return counts.select(
        "tok",
        (F.row_number().over(win) - 1).cast("bigint").alias("tok_id"),
    )


def _encode_shard(shard, pdf, vocab_map, dtype, prefix, put):
    """Encode one shard's sequences (pos order) to .bin/.idx bytes and
    PUT them; returns the manifest row.  Pure function of its input,
    so Spark task re-runs overwrite with identical bytes (the ChunkPut
    idempotency contract)."""
    import zlib

    import numpy as np

    pdf = pdf.sort_values("pos")
    np_dtype = np.dtype(dtype).newbyteorder("<")
    parts = []
    lengths = []
    seq_ids = []
    for seq_id, toks in zip(pdf["seq_id"], pdf["tokens"]):
        if vocab_map is None:
            ids = np.asarray(toks, dtype=np.int64)
        else:
            try:
                ids = np.fromiter(
                    (vocab_map[t] for t in toks), dtype=np.int64,
                    count=len(toks),
                )
            except KeyError as exc:
                raise ValueError(
                    f"token {exc} of sequence {int(seq_id)} is not in "
                    "the vocab -- build_token_vocab must run over the "
                    "SAME sequences being written"
                ) from None
        limit = np.iinfo(np_dtype).max
        if ids.size and int(ids.max()) > limit:
            raise ValueError(
                f"token id {int(ids.max())} exceeds {dtype}; use a "
                f"wider dtype"
            )
        parts.append(ids.astype(np_dtype).tobytes())
        lengths.append(len(toks))
        seq_ids.append(int(seq_id))
    bin_bytes = b"".join(parts)
    idx = bytearray()
    idx += _SHARD_MAGIC
    idx += int(_SHARD_VERSION).to_bytes(4, "little")
    idx += int(_DTYPES[dtype]).to_bytes(4, "little")
    idx += len(lengths).to_bytes(8, "little")
    for sid in seq_ids:
        idx += int(sid).to_bytes(8, "little")
    for ln in lengths:
        idx += int(ln).to_bytes(4, "little")
    idx_bytes = bytes(idx)
    put.put(f"{prefix}/shard-{shard:05d}.bin", bin_bytes)
    put.put(f"{prefix}/shard-{shard:05d}.idx", idx_bytes)
    return {
        "shard": shard,
        "n_seq": len(lengths),
        "n_tokens": int(sum(lengths)),
        "nbytes": len(bin_bytes) + len(idx_bytes),
        "crc32": zlib.crc32(bin_bytes) & 0xFFFFFFFF,
    }


def write_token_shards(
    seqs: DataFrame,
    shards: DataFrame,
    put,
    vocab: DataFrame | None = None,
    dtype: str = "uint32",
    prefix: str = "shards",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Write packed training sequences as sharded binary token files
    through the :class:`~..sources.zarr.ChunkPut` seam -- the
    trainer-facing output format (the Megatron-LM ``.bin``/``.idx``
    shape, clean-room layout).

    ``seqs`` is ``(seq_id, tokens array<string>)`` (e.g.
    :func:`assemble_sequences` output); ``shards`` is the
    ``(seq_id, shard, pos)`` plan from :func:`shuffle_shards`.  Each
    shard ``k`` becomes two objects under ``prefix/``:

    * ``shard-{k:05d}.bin`` -- the shard's token ids back-to-back,
      little-endian ``dtype``, sequences in ``pos`` order;
    * ``shard-{k:05d}.idx`` -- magic ``XRSPSHRD``, version u32,
      dtype code u32 (2=uint16, 4=uint32), n_seq u64, then n_seq
      seq_ids (u64) and n_seq sequence lengths (u32).

    ``vocab`` maps tokens to ids (:func:`build_token_vocab`); it is
    model-sized, so it rides to executors as a broadcast dict.  With
    ``vocab=None`` the tokens column must already be integer ids.

    Returns the manifest ``(shard, n_seq, n_tokens, nbytes, crc32)``
    -- one row per shard.  The writes are LAZY, like every Spark sink
    built on a transformation: no shard object exists until the caller
    materializes the manifest (``.collect()``, ``.count()``, or writing
    it somewhere), and re-materializing re-runs the PUTs (idempotent --
    same keys, same bytes).

    100-TB shape: one equi-join of the plan to the sequences on
    ``seq_id``, one explicit ``repartition(n_shards, shard)`` feeding
    ``groupBy(shard).applyInPandas`` (the measured-fastest
    kernel-stage layout), inside which encoding is numpy and the PUT
    is the same idempotent object-store seam the zarr/GeoTIFF writers
    ship through.  Shard count bounds task memory: pick
    ``n_shards >= corpus_tokens * itemsize / target_shard_bytes``.
    """
    if dtype not in _DTYPES:
        raise ValueError(f"dtype must be one of {sorted(_DTYPES)}")
    spark = seqs.sparkSession
    if vocab is not None:
        vmap = {r["tok"]: int(r["tok_id"]) for r in vocab.collect()}
        bmap = spark.sparkContext.broadcast(vmap)
    else:
        bmap = None
    joined = shards.join(
        seqs.select("seq_id", F.col(tokens_col).alias("tokens")),
        "seq_id",
    ).select("shard", "pos", "seq_id", "tokens")

    def write_one(key, pdf):
        import pandas as pd

        row = _encode_shard(
            int(key[0]), pdf,
            bmap.value if bmap is not None else None,
            dtype, prefix, put,
        )
        return pd.DataFrame([row])

    shard_ids = shards.select("shard").distinct()
    n = shard_ids.count()
    return (
        joined.repartition(max(int(n), 1), "shard")
        .groupBy("shard")
        .applyInPandas(
            write_one,
            schema=("shard int, n_seq bigint, n_tokens bigint, "
                    "nbytes bigint, crc32 bigint"),
        )
    )


def read_token_shards(
    spark: SparkSession,
    store,
    n_shards: int,
    prefix: str = "shards",
) -> DataFrame:
    """Read back :func:`write_token_shards` output through a store's
    ``get(key)`` seam: one task per shard, each decoding its own
    ``.idx``/``.bin`` pair.  Returns ``(shard, pos, seq_id, tokens
    array<bigint>)`` -- ids, not strings (join a vocab to invert).
    Missing shards raise (a training run must never silently read a
    partial corpus)."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("pos", T.LongType(), False),
        T.StructField("seq_id", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.LongType()), False),
    ])

    def read_batch(iterator):
        import numpy as np
        import pandas as pd

        for pdf in iterator:
            rows = []
            for shard in pdf["id"]:
                shard = int(shard)
                idx = store.get(f"{prefix}/shard-{shard:05d}.idx")
                blob = store.get(f"{prefix}/shard-{shard:05d}.bin")
                if idx is None or blob is None:
                    raise FileNotFoundError(
                        f"shard {shard} missing under {prefix}/")
                if idx[:8] != _SHARD_MAGIC:
                    raise ValueError(f"bad shard magic in {shard}")
                ver = int.from_bytes(idx[8:12], "little")
                if ver != _SHARD_VERSION:
                    raise ValueError(
                        f"shard {shard}: format version {ver} != "
                        f"{_SHARD_VERSION}")
                dcode = int.from_bytes(idx[12:16], "little")
                n_seq = int.from_bytes(idx[16:24], "little")
                off = 24
                sids = [
                    int.from_bytes(idx[off + 8 * i:off + 8 * i + 8],
                                   "little")
                    for i in range(n_seq)
                ]
                off += 8 * n_seq
                lens = [
                    int.from_bytes(idx[off + 4 * i:off + 4 * i + 4],
                                   "little")
                    for i in range(n_seq)
                ]
                np_dtype = np.dtype(
                    "<u2" if dcode == 2 else "<u4")
                ids = np.frombuffer(blob, dtype=np_dtype)
                cur = 0
                for pos0, (sid, ln) in enumerate(zip(sids, lens)):
                    rows.append((
                        shard, pos0 + 1, sid,
                        [int(v) for v in ids[cur:cur + ln]],
                    ))
                    cur += ln
                if cur != ids.size:
                    raise ValueError(
                        f"shard {shard}: .bin has {ids.size} ids, "
                        f".idx accounts for {cur}")
            yield pd.DataFrame(
                rows, columns=["shard", "pos", "seq_id", "tokens"])

    return spark.range(n_shards).mapInPandas(read_batch, schema=schema)
