"""Tests for paragraph-level dedup (extensions/dedup.py) and sequence
packing (extensions/packing.py): hand-computed goldens, edge cases, and
the plan-shape guarantee that packing never funnels the corpus through
a single-task global sort."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.extensions.dedup import dedup_paragraph
from xcube_resampling_spark.extensions.packing import (
    pack_sequences,
    packing_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestDedupParagraph:
    def test_hand_computed(self, spark):
        out = {
            r["doc_id"]: (r["n_para"], r["n_kept"], r["clean_hash"])
            for r in dedup_paragraph(_docs(spark, [
                (1, "aaa\nbbb\nccc"),
                (2, "bbb\nddd"),
                (3, "ddd\n  \nccc\nddd"),
                (4, "bbb"),
            ])).collect()
        }
        # doc 1: all three paragraphs are global firsts
        assert out[1] == (3, 3, out[1][2]) and out[1][2] is not None
        # doc 2: bbb first seen at (1,1); ddd is new
        assert out[2][:2] == (2, 1)
        # doc 3: ddd first seen at (2,1) < (3,0); blank para dropped
        assert out[3] == (3, 0, None)
        assert out[4] == (1, 0, None)

    def test_within_doc_repeat_kept_once(self, spark):
        out = dedup_paragraph(
            _docs(spark, [(1, "x\nx\nx")])).collect()[0]
        assert (out["n_para"], out["n_kept"]) == (3, 1)

    def test_clean_hash_matches_joined_text(self, spark):
        import hashlib

        out = dedup_paragraph(
            _docs(spark, [(1, "aaa\nbbb"), (2, "bbb\nccc")])
        ).filter(F.col("doc_id") == 2).collect()[0]
        assert out["clean_hash"] == hashlib.md5(b"ccc").hexdigest()

    def test_custom_separator(self, spark):
        out = {
            r["doc_id"]: r["n_kept"]
            for r in dedup_paragraph(
                _docs(spark, [(1, "p. q"), (2, "q. r")]), sep=r"\. "
            ).collect()
        }
        assert out == {1: 2, 2: 1}

    def test_all_blank_doc_absent(self, spark):
        rows = dedup_paragraph(
            _docs(spark, [(1, "a"), (2, " \n  ")])).collect()
        assert [r["doc_id"] for r in rows] == [1]


class TestPackSequences:
    def _spans(self, spark, rows, L, nb=3):
        return sorted(
            (r["doc_id"], r["seq_id"], r["doc_off"], r["seq_off"],
             r["n_tok"])
            for r in pack_sequences(
                _docs(spark, rows), seq_len=L, n_buckets=nb
            ).collect()
        )

    def test_hand_computed(self, spark):
        got = self._spans(spark, [
            (10, "a b c"),
            (11, "d e f g h"),
            (12, "i j k l m n o p q r"),
            (13, ""),
            (14, "x"),
        ], L=8)
        assert got == [
            (10, 0, 0, 0, 3),
            (11, 0, 0, 3, 5),
            (12, 1, 0, 0, 8),
            (12, 2, 8, 0, 2),
            (14, 2, 0, 2, 1),
        ]

    def test_doc_longer_than_many_sequences(self, spark):
        got = self._spans(
            spark, [(1, " ".join(["t"] * 20))], L=8, nb=5)
        assert got == [(1, 0, 0, 0, 8), (1, 1, 8, 0, 8),
                       (1, 2, 16, 0, 4)]

    def test_bucket_count_invariance(self, spark):
        rows = [(i, " ".join(["w"] * (1 + i % 7))) for i in range(40)]
        assert self._spans(spark, rows, L=16, nb=1) == \
            self._spans(spark, rows, L=16, nb=13)

    def test_sparse_nonzero_doc_ids(self, spark):
        # ordering is by doc_id, not by row position or density
        got = self._spans(spark, [
            (1000, "a b"), (5, "c d e"), (70, "f"),
        ], L=4, nb=2)
        assert got == [
            (5, 0, 0, 0, 3),
            (70, 0, 0, 3, 1),
            (1000, 1, 0, 0, 2),
        ]

    def test_stats(self, spark):
        out = {
            r["seq_id"]: (r["n_docs"], r["n_continuations"],
                          r["n_tok"], r["fill"])
            for r in packing_stats(_docs(spark, [
                (10, "a b c"),
                (11, "d e f g h"),
                (12, "i j k l m n o p q r"),
                (14, "x"),
            ]), seq_len=8, n_buckets=3).collect()
        }
        assert out == {
            0: (2, 0, 8, 1.0),
            1: (1, 0, 8, 1.0),
            2: (2, 1, 3, 0.375),
        }

    def test_no_tokens_lost(self, spark):
        rows = [(i, " ".join(["w"] * (1 + i % 11)))
                for i in range(100)]
        docs = _docs(spark, rows)
        total = sum(1 + i % 11 for i in range(100))
        packed = pack_sequences(docs, seq_len=32, n_buckets=7)
        assert packed.agg(F.sum("n_tok")).first()[0] == total
        # every sequence except the last is exactly full
        stats = packing_stats(docs, seq_len=32, n_buckets=7) \
            .orderBy("seq_id").collect()
        assert all(r["n_tok"] == 32 for r in stats[:-1])

    def test_seq_len_validation(self, spark):
        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(_docs(spark, [(1, "a")]), seq_len=0)

    def test_no_single_partition_exchange(self, spark):
        """The prefix sum must be range-bucketed: a plain
        Window.orderBy would show SinglePartition or a global Sort
        before the window."""
        docs = _docs(
            spark, [(i, "w x y") for i in range(50)])
        p = pack_sequences(docs, seq_len=8, n_buckets=4)
        buf = io.StringIO()
        with redirect_stdout(buf):
            p.explain("formatted")
        plan = buf.getvalue()
        assert "SinglePartition" not in plan
        assert "hashpartitioning(bucket" in plan


class TestReviewRegressions:
    def test_empty_corpus(self, spark):
        out = pack_sequences(
            _docs(spark, [(1, ""), (2, "  \n ")]), seq_len=8)
        assert out.count() == 0
        assert out.columns == [
            "doc_id", "seq_id", "doc_off", "seq_off", "n_tok"]

    def test_whitespace_edges_not_counted(self, spark):
        # '\thello world\n' is 2 tokens, not 3/4 phantom ones
        got = {
            (r["doc_id"], r["seq_id"]): r["n_tok"]
            for r in pack_sequences(_docs(spark, [
                (1, "\thello world\n"), (2, "a"),
            ]), seq_len=8, n_buckets=2).collect()
        }
        assert got == {(1, 0): 2, (2, 0): 1}

    def test_wide_sparse_doc_ids_exact(self, spark):
        # hash-derived 64-bit ids: double bucket math would wrap or
        # round and silently scramble the prefix order
        big = 2 ** 61
        got = sorted(
            (r["doc_id"], r["seq_id"], r["seq_off"], r["n_tok"])
            for r in pack_sequences(_docs(spark, [
                (big + 5, "c d"), (3, "a b e"), (big, "f"),
            ]), seq_len=4, n_buckets=8).collect()
        )
        assert got == [
            (3, 0, 0, 3),
            (big, 0, 3, 1),
            (big + 5, 1, 0, 2),
        ]

    def test_stats_from_spans(self, spark):
        docs = _docs(spark, [(1, "a b c"), (2, "d e")])
        plan = pack_sequences(docs, seq_len=4, n_buckets=2)
        via_spans = packing_stats(docs, seq_len=4, spans=plan) \
            .orderBy("seq_id").collect()
        direct = packing_stats(docs, seq_len=4, n_buckets=2) \
            .orderBy("seq_id").collect()
        assert via_spans == direct

    def test_text_col_param(self, spark):
        df = spark.createDataFrame(
            [(1, "x y z")], "doc_id bigint, body string")
        out = pack_sequences(df, seq_len=8, text_col="body").collect()
        assert out[0]["n_tok"] == 3

    def test_release_cached(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            release_cached)
        pack_sequences(_docs(spark, [(1, "a b")]), seq_len=8).count()
        release_cached()
        from xcube_resampling_spark.extensions import packing
        assert packing._PERSISTED == []


from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10 ** 6),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=0, max_size=25, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=17),
    st.integers(min_value=1, max_value=9),
)
def test_packing_invariants(spark, corpus, L, nb):
    """Random corpora: tokens are conserved, every sequence is gap-free
    and full except the last, and doc order inside a sequence follows
    doc_id order."""
    rows = [(i, " ".join(["w"] * n)) for i, n in corpus]
    spans = sorted(
        (r["seq_id"], r["seq_off"], r["doc_id"], r["n_tok"])
        for r in pack_sequences(
            _docs(spark, rows), seq_len=L, n_buckets=nb
        ).collect()
    )
    total = sum(n for _, n in corpus)
    assert sum(s[3] for s in spans) == total
    # gap-free: spans tile [0, total) in (seq_id, seq_off) order
    pos = 0
    prev_doc = None
    for seq_id, seq_off, doc_id, n in spans:
        assert seq_id * L + seq_off == pos
        if seq_off > 0:
            assert prev_doc is None or doc_id >= prev_doc
        pos += n
        prev_doc = doc_id
    assert pos == total


class TestShuffleShards:
    def test_partition_of_sequences(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            shuffle_shards)

        docs = _docs(spark, [(i, " ".join(["w"] * 5))
                             for i in range(40)])
        spans = pack_sequences(docs, seq_len=8, n_buckets=4)
        n_seqs = spans.select("seq_id").distinct().count()
        out = shuffle_shards(spans, 3, seed="s").collect()
        assert len(out) == n_seqs
        assert {r["shard"] for r in out} <= {0, 1, 2}
        # positions are 1..k dense within each shard
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))

    def test_deterministic_but_seed_sensitive(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            shuffle_shards)

        docs = _docs(spark, [(i, "a b c") for i in range(30)])
        spans = pack_sequences(docs, seq_len=4, n_buckets=2)
        a = sorted(map(tuple, shuffle_shards(spans, 4, "x").collect()))
        b = sorted(map(tuple, shuffle_shards(spans, 4, "x").collect()))
        c = sorted(map(tuple, shuffle_shards(spans, 4, "y").collect()))
        assert a == b
        assert a != c

    def test_order_not_monotonic_in_seq_id(self, spark):
        """The whole point: within a shard the training order is
        hash-shuffled, not seq_id order."""
        from xcube_resampling_spark.extensions.packing import (
            shuffle_shards)

        docs = _docs(spark, [(i, "a b c d") for i in range(200)])
        spans = pack_sequences(docs, seq_len=4, n_buckets=4)
        out = shuffle_shards(spans, 1, seed="s") \
            .orderBy("pos").collect()
        ids = [r["seq_id"] for r in out]
        assert ids != sorted(ids)

    def test_n_shards_validation(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            shuffle_shards)

        docs = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError, match="n_shards"):
            shuffle_shards(pack_sequences(docs, seq_len=4), 0)

    def test_no_single_partition_window(self, spark):
        """The shard window must partition BY SHARD -- a global
        row_number would funnel every sequence through one task."""
        from xcube_resampling_spark.extensions.packing import (
            shuffle_shards)

        docs = _docs(spark, [(i, "a b c") for i in range(50)])
        spans = pack_sequences(docs, seq_len=4, n_buckets=4)
        out = shuffle_shards(spans, 8)
        buf = io.StringIO()
        with redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "SinglePartition" not in plan
        assert "hashpartitioning(shard" in plan


class TestAssembleSequences:
    def test_hand_computed_assembly(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            assemble_sequences,
        )
        from xcube_resampling_spark.extensions.text import tokens_col

        # doc 1: 5 tokens, doc 2: 4 tokens; seq_len=4 -> streams:
        # seq0 = [a b c d], seq1 = [e p q r], seq2 = [s]
        docs = _docs(spark, [(1, "a b c d e"), (2, "p q r s")])
        spans = pack_sequences(docs, seq_len=4, n_buckets=2)
        toks = docs.select(
            "doc_id",
            F.filter(
                tokens_col(F.col("text")), lambda t: t != F.lit("")
            ).alias("tokens"),
        )
        out = {r["seq_id"]: (r["n_tok"], list(r["tokens"]))
               for r in assemble_sequences(toks, spans).collect()}
        assert out == {
            0: (4, ["a", "b", "c", "d"]),
            1: (4, ["e", "p", "q", "r"]),
            2: (1, ["s"]),
        }

    def test_full_sequences_exactly_seq_len(self, spark):
        from xcube_resampling_spark.extensions.packing import (
            assemble_sequences,
        )
        from xcube_resampling_spark.extensions.text import tokens_col

        docs = _docs(
            spark, [(i, " ".join(f"t{i}x{k}" for k in range(7)))
                    for i in range(30)])
        spans = pack_sequences(docs, seq_len=16, n_buckets=4)
        toks = docs.select(
            "doc_id",
            F.filter(
                tokens_col(F.col("text")), lambda t: t != F.lit("")
            ).alias("tokens"),
        )
        out = assemble_sequences(toks, spans).collect()
        total = 30 * 7
        full, last = divmod(total, 16)
        assert len(out) == full + (1 if last else 0)
        by_id = sorted(out, key=lambda r: r["seq_id"])
        for r in by_id[:-1]:
            assert r["n_tok"] == 16
        # the concatenation order is doc_id order
        stream = [t for r in by_id for t in r["tokens"]]
        want = [f"t{i}x{k}" for i in range(30) for k in range(7)]
        assert stream == want

    def test_bpe_tokens_assembly_consistent(self, spark):
        from xcube_resampling_spark.extensions.bpe import (
            bpe_token_count_col,
            bpe_tokenize,
            pinned_merges,
        )
        from xcube_resampling_spark.extensions.packing import (
            assemble_sequences,
        )

        merges = pinned_merges(20)
        docs = _docs(spark, [
            (1, "the quick brown fox"), (2, "question training the"),
        ])
        spans = pack_sequences(
            docs, seq_len=8,
            n_tokens_col=bpe_token_count_col(merges), n_buckets=2)
        toks = bpe_tokenize(docs, merges, method="sql") \
            .select("doc_id", "tokens")
        out = assemble_sequences(toks, spans).collect()
        stream = [t for r in sorted(out, key=lambda r: r["seq_id"])
                  for t in r["tokens"]]
        want = [t for r in bpe_tokenize(
            docs, merges, method="sql").orderBy("doc_id").collect()
            for t in r["tokens"]]
        assert stream == want


class TestTokenShards:
    def _pipeline(self, spark, tmp_path, dtype="uint32", n_shards=3):
        from xcube_resampling_spark.extensions.packing import (
            assemble_sequences,
            build_token_vocab,
            pack_sequences,
            shuffle_shards,
            write_token_shards,
        )
        from xcube_resampling_spark.sources.zarr import FsChunkPut

        docs = _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the five boxing wizards jump quickly"),
            (4, "sphinx of black quartz judge my vow"),
        ])
        toks = docs.select(
            "doc_id",
            F.filter(
                F.split(F.trim(F.lower("text")), r"\s+"),
                lambda t: t != F.lit(""),
            ).alias("tokens"),
        )
        spans = pack_sequences(docs, seq_len=5, n_buckets=2)
        seqs = assemble_sequences(toks, spans)
        plan = shuffle_shards(spans, n_shards=n_shards)
        vocab = build_token_vocab(seqs)
        put = FsChunkPut(str(tmp_path / "out"))
        man = write_token_shards(
            seqs, plan, put, vocab=vocab, dtype=dtype).collect()
        return seqs, plan, vocab, put, man

    def test_write_read_roundtrip(self, spark, tmp_path):
        from xcube_resampling_spark.extensions.packing import (
            read_token_shards,
        )

        seqs, plan, vocab, put, man = self._pipeline(spark, tmp_path)
        back = read_token_shards(spark, put, n_shards=3)
        vmap = {int(r["tok_id"]): r["tok"] for r in vocab.collect()}
        orig = {r["seq_id"]: list(r["tokens"])
                for r in seqs.collect()}
        plan_map = {r["seq_id"]: (r["shard"], r["pos"])
                    for r in plan.collect()}
        got = {}
        for r in back.collect():
            got[r["seq_id"]] = [vmap[i] for i in r["tokens"]]
            assert plan_map[r["seq_id"]] == (r["shard"], r["pos"])
        assert got == orig

    def test_manifest_counts_and_crc(self, spark, tmp_path):
        import zlib

        seqs, plan, vocab, put, man = self._pipeline(spark, tmp_path)
        total_tokens = sum(
            len(r["tokens"]) for r in seqs.collect())
        assert sum(r["n_tokens"] for r in man) == total_tokens
        assert sum(r["n_seq"] for r in man) == seqs.count()
        for r in man:
            blob = put.get(f"shards/shard-{r['shard']:05d}.bin")
            idx = put.get(f"shards/shard-{r['shard']:05d}.idx")
            assert blob is not None and idx is not None
            assert zlib.crc32(blob) & 0xFFFFFFFF == r["crc32"]
            assert len(blob) + len(idx) == r["nbytes"]
            assert len(blob) == 4 * r["n_tokens"]  # uint32
            assert idx[:8] == b"XRSPSHRD"

    def test_uint16_roundtrip_and_overflow(self, spark, tmp_path):
        from xcube_resampling_spark.extensions.packing import (
            read_token_shards,
            write_token_shards,
        )
        from xcube_resampling_spark.sources.zarr import FsChunkPut

        seqs, plan, vocab, put, _ = self._pipeline(
            spark, tmp_path, dtype="uint16")
        back = read_token_shards(spark, put, n_shards=3)
        assert back.count() == seqs.count()
        # ids past 65535 must refuse uint16 loudly
        big = spark.createDataFrame(
            [(0, [70000])], "seq_id long, tokens array<bigint>")
        plan1 = spark.createDataFrame(
            [(0, 0, 1)], "seq_id long, shard int, pos long")
        put2 = FsChunkPut(str(tmp_path / "o2"))
        with pytest.raises(Exception, match="uint16"):
            write_token_shards(
                big, plan1, put2, vocab=None, dtype="uint16"
            ).collect()

    def test_missing_shard_raises(self, spark, tmp_path):
        from xcube_resampling_spark.extensions.packing import (
            read_token_shards,
        )

        seqs, plan, vocab, put, _ = self._pipeline(spark, tmp_path)
        with pytest.raises(Exception, match="missing"):
            read_token_shards(spark, put, n_shards=9).collect()

    def test_prewired_integer_ids_without_vocab(self, spark, tmp_path):
        from xcube_resampling_spark.extensions.packing import (
            read_token_shards,
            write_token_shards,
        )
        from xcube_resampling_spark.sources.zarr import FsChunkPut

        seqs = spark.createDataFrame(
            [(0, [3, 1, 4, 1, 5]), (1, [9, 2, 6])],
            "seq_id long, tokens array<bigint>")
        plan = spark.createDataFrame(
            [(0, 0, 1), (1, 1, 1)],
            "seq_id long, shard int, pos long")
        put = FsChunkPut(str(tmp_path / "ids"))
        man = write_token_shards(seqs, plan, put, vocab=None).collect()
        assert sum(r["n_tokens"] for r in man) == 8
        back = {r["seq_id"]: list(r["tokens"]) for r in
                read_token_shards(spark, put, n_shards=2).collect()}
        assert back == {0: [3, 1, 4, 1, 5], 1: [9, 2, 6]}
