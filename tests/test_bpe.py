"""BPE tokenizer tests (extensions/bpe.py): training determinism,
merge-pass semantics, codegen/pandas path parity, DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.extensions.bpe import (
    _merge_pass,
    bpe_token_count_col,
    bpe_tokenize,
    bpe_train,
    merges_sql,
    pinned_merges,
    train_on_word_counts,
)


def _ref_apply(word, merges):
    sym = tuple(word)
    for a, b in merges:
        sym = _merge_pass(sym, a, b)
    return list(sym)


class TestTraining:
    def test_hand_corpus(self):
        # 'aa' pair dominates: low+lower share 'lo','ow'; counts:
        # aaab x3 -> (a,a) appears 2*3=6 times, the clear winner
        merges = train_on_word_counts({"aaab": 3, "lower": 1}, 2)
        assert merges[0] == ("a", "a")

    def test_tie_breaks_lexicographic(self):
        # 'ab' and 'ba' pairs tie at count 1 -> ('a','b') wins
        merges = train_on_word_counts({"ab": 1, "ba": 1}, 1)
        assert merges == [("a", "b")]

    def test_merge_pass_non_overlapping(self):
        assert _merge_pass(tuple("aaa"), "a", "a") == ("aa", "a")
        assert _merge_pass(tuple("aaaa"), "a", "a") == ("aa", "aa")

    def test_exhausts_when_no_pairs(self):
        assert train_on_word_counts({"a": 5}, 10) == []

    def test_pinned_merges_stable(self):
        m1 = pinned_merges(40)
        m2 = pinned_merges(40)
        assert m1 == m2 and len(m1) == 40
        assert pinned_merges(10) == m1[:10]

    def test_bpe_train_distributed(self, spark):
        docs = spark.createDataFrame(
            [(0, "aaab aaab"), (1, "aaab lower")],
            "doc_id long, text string")
        merges = bpe_train(docs, num_merges=2)
        assert merges == train_on_word_counts(
            {"aaab": 3, "lower": 1}, 2)


class TestTokenize:
    def test_sql_equals_pandas_equals_reference(self, spark):
        merges = pinned_merges(40)
        rows = [
            (0, "the quick brown fox"),
            (1, "question training the the"),
            (2, "zzz qqq"),
            (3, ""),
            (4, "  spaced\tout\ntokens  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        sql_out = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
                   for r in bpe_tokenize(docs, merges,
                                         method="sql").collect()}
        pd_out = {r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
                  for r in bpe_tokenize(docs, merges,
                                        method="pandas").collect()}
        assert sql_out == pd_out
        for did, text in rows:
            want = [t for w in text.lower().split()
                    for t in _ref_apply(w, merges)]
            assert sql_out[did] == (want, len(want)), did

    def test_token_count_col_matches(self, spark):
        merges = pinned_merges(20)
        docs = spark.createDataFrame(
            [(0, "the quick brown fox"), (1, "")],
            "doc_id long, text string")
        got = {r["doc_id"]: r["n"] for r in docs.select(
            "doc_id", bpe_token_count_col(merges).alias("n")
        ).collect()}
        want = {r["doc_id"]: r["n_tokens"] for r in bpe_tokenize(
            docs, merges, method="sql").collect()}
        assert got == want

    def test_duckdb_twin(self):
        merges = pinned_merges(40)
        con = duckdb.connect()
        expr = merges_sql("w", merges)
        q = f"""
        WITH d AS (SELECT unnest(
          ['the','question','training','zzz','international']) AS w)
        SELECT w, string_split(trim({expr}, ' '), '  ') AS toks FROM d
        """
        for w, toks in con.execute(q).fetchall():
            assert toks == _ref_apply(w, merges), w

    def test_auto_method_threshold(self, spark):
        docs = spark.createDataFrame(
            [(0, "a b")], "doc_id long, text string")
        small = bpe_tokenize(docs, [("a", "b")], method="auto")
        plan = small._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan  # sql path: pure codegen
        big = bpe_tokenize(
            docs, [("a", "b")] * 201, method="auto")
        plan_big = big._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" in plan_big

    def test_bad_method_raises(self, spark):
        docs = spark.createDataFrame(
            [(0, "a")], "doc_id long, text string")
        with pytest.raises(ValueError, match="method"):
            bpe_tokenize(docs, [], method="nope")

    def test_packing_integration(self, spark):
        from xcube_resampling_spark.extensions import packing as pk

        merges = pinned_merges(20)
        docs = spark.createDataFrame(
            [(i, "the quick brown fox jumps " * 3) for i in range(4)],
            "doc_id long, text string")
        plan = pk.pack_sequences(
            docs, seq_len=16,
            n_tokens_col=bpe_token_count_col(merges), n_buckets=2)
        total = plan.agg(F.sum("n_tok")).first()[0]
        want = bpe_tokenize(docs, merges, method="sql") \
            .agg(F.sum("n_tokens")).first()[0]
        assert total == want
        pk.release_cached()


class TestFastPathEquivalence:
    """The round-14 optimization replaced the per-word interpreted
    transform+aggregate chain with (a) a flat whole-text replace chain
    for bpe_tokenize's sql path and (b) a single-char symbol-code
    replace chain for bpe_token_count_col.  These pin byte-identical
    behavior against the original per-word form across the tricky
    boundary cases (whitespace variants, exotic non-\\s code points,
    private-use chars, unicode case folding)."""

    TRICKY = [
        "", "   ", None, "a", "ab" * 200, " lead trail ",
        "the the  the\tthe\nthe", "th\rin\x0bgs", "a b", "pe",
        "THE QUICK the quick brown fox", "xy", "ab",
        "", "p e", "q  the", "the  quick",
        "pua  char", "puathe", "",
        "İstanbul", "café naïve", "a  \t  b",
        "\nnl lead", "nl trail\n", "mixthe quick end",
    ]

    def _old_count_col(self, merges):
        from xcube_resampling_spark.extensions.bpe import merges_column
        from xcube_resampling_spark.extensions.text import tokens_col

        words = F.filter(tokens_col(F.col("text")),
                         lambda t: t != F.lit(""))
        per_word = F.transform(
            words,
            lambda w: F.size(
                F.split(F.trim(merges_column(w, merges)), "  ")
            ).cast("bigint"),
        )
        return F.coalesce(
            F.aggregate(per_word, F.lit(0).cast("bigint"),
                        lambda acc, x: acc + x),
            F.lit(0).cast("bigint"),
        )

    def _old_tokens_col(self, merges):
        from xcube_resampling_spark.extensions.bpe import merges_column
        from xcube_resampling_spark.extensions.text import tokens_col

        words = F.filter(tokens_col(F.col("text")),
                         lambda t: t != F.lit(""))
        return F.flatten(
            F.transform(
                words,
                lambda w: F.split(F.trim(merges_column(w, merges)), "  "),
            )
        )

    def _docs(self, spark):
        rows = [(i, t) for i, t in enumerate(self.TRICKY)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_count_col_matches_per_word_form(self, spark):
        merges = pinned_merges(40)
        docs = self._docs(spark)
        bad = docs.select(
            "doc_id",
            self._old_count_col(merges).alias("o"),
            bpe_token_count_col(merges).alias("n"),
        ).filter("o IS DISTINCT FROM n").collect()
        assert bad == []

    def test_tokenize_sql_matches_per_word_form(self, spark):
        merges = pinned_merges(40)
        docs = self._docs(spark)
        old = docs.select(
            "doc_id", self._old_tokens_col(merges).alias("tokens"))
        new = bpe_tokenize(docs, merges, method="sql")
        got_o = {r["doc_id"]: r["tokens"] for r in old.collect()}
        got_n = {r["doc_id"]: r["tokens"] for r in new.collect()}
        assert got_o == got_n

    def test_coded_path_skips_oversized_merge_tables(self):
        from xcube_resampling_spark.extensions.bpe import _coded_symbols

        # > 256 distinct products -> coded path must bail (None)
        merges = [("a", "a")]
        prod = "aa"
        for _ in range(300):
            merges.append((prod, "a"))
            prod += "a"
        assert _coded_symbols(F.lit("x"), merges) is None

    def test_unreachable_merge_operand_is_skipped(self, spark):
        # ('xy', 'z') with no earlier producer of 'xy': neither form
        # can ever apply it
        merges = [("a", "b"), ("xy", "z"), ("ab", "c")]
        docs = spark.createDataFrame(
            [(0, "abc xyz abcxyz")], "doc_id long, text string")
        o = docs.select(self._old_count_col(merges).alias("n")).first()["n"]
        n = docs.select(bpe_token_count_col(merges).alias("n")).first()["n"]
        assert o == n
