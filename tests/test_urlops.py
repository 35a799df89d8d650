"""URL curation operators: normalization cases, registered domain,
dedup semantics, blocklist join -- plus plan shape (no UDFs, one
shuffle for dedup, broadcast for the blocklist)."""

import numpy as np  # noqa: F401
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.extensions.urlops import (
    domain_stats,
    filter_blocked_domains,
    normalize_url,
    registered_domain,
    url_dedup,
    url_parts,
)


def _norm(spark, url):
    return spark.createDataFrame([(url,)], "url string").select(
        normalize_url(F.col("url")).alias("n")).first()["n"]


class TestNormalize:
    @pytest.mark.parametrize("url,want", [
        ("HTTPS://WWW.Ex.COM:443/A/b/?utm_source=x&q=1#f",
         "https://ex.com/A/b?q=1"),
        ("http://ex.com:80/", "http://ex.com/"),
        ("http://ex.com:8080/p", "http://ex.com:8080/p"),
        ("https://ex.com", "https://ex.com/"),
        ("https://ex.com/p/?utm_a=1&utm_b=2", "https://ex.com/p"),
        ("https://sub.ex.co.uk/x/", "https://sub.ex.co.uk/x"),
        ("https://ex.com/?a=1&b=2", "https://ex.com/?a=1&b=2"),
    ])
    def test_cases(self, spark, url, want):
        assert _norm(spark, url) == want

    def test_path_case_preserved_host_lowered(self, spark):
        # RFC 3986: scheme+host are case-insensitive, path is NOT
        assert _norm(spark, "HTTP://EX.com/CaseSensitive") == \
            "http://ex.com/CaseSensitive"


class TestRegisteredDomain:
    @pytest.mark.parametrize("host,want", [
        ("a.b.example.com", "example.com"),
        ("example.com", "example.com"),
        ("deep.sub.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("localhost", "localhost"),
    ])
    def test_cases(self, spark, host, want):
        got = spark.createDataFrame([(host,)], "h string").select(
            registered_domain(F.col("h")).alias("d")).first()["d"]
        assert got == want


class TestDedupAndFilters:
    def _docs(self, spark):
        rows = [
            (1, "https://www.ex.com/a?utm_x=1"),
            (2, "https://ex.com/a"),           # dup of 1
            (3, "https://ex.com/b"),
            (4, "https://bad.co.uk/x"),
            (5, "https://sub.bad.co.uk/y"),
        ]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_url_dedup_keeps_min_id(self, spark):
        out = {r["norm_url"]: (r["doc_id"], r["n_dups"])
               for r in url_dedup(self._docs(spark)).collect()}
        assert out["https://ex.com/a"] == (1, 2)
        assert out["https://ex.com/b"] == (3, 1)
        assert len(out) == 4

    def test_blocklist_anti_join(self, spark):
        blocked = spark.createDataFrame([("bad.co.uk",)],
                                        "domain string")
        kept = filter_blocked_domains(
            self._docs(spark), blocked).select("doc_id").collect()
        assert sorted(r["doc_id"] for r in kept) == [1, 2, 3]

    def test_domain_stats(self, spark):
        out = {r["domain"]: r["count"]
               for r in domain_stats(self._docs(spark)).collect()}
        assert out == {"ex.com": 3, "bad.co.uk": 2}

    def test_plan_is_udf_free_and_broadcast(self, spark):
        docs = self._docs(spark)
        blocked = spark.createDataFrame([("bad.co.uk",)],
                                        "domain string")
        plan = filter_blocked_domains(docs, blocked)._jdf \
            .queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" \
            in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        norm_plan = docs.select(normalize_url(F.col("url")))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Python" not in norm_plan  # pure Catalyst

    def test_dedup_is_single_shuffle(self, spark):
        from tests.test_imagecodec import _n_exchanges

        assert _n_exchanges(url_dedup(self._docs(spark))) == 1


class TestParts:
    def test_parts_extraction(self, spark):
        r = spark.createDataFrame(
            [("https://h.ex.com:8443/p/q?a=1#z",)], "url string"
        ).select(*[v.alias(k) for k, v in
                   url_parts(F.col("url")).items()]).first()
        assert r["scheme"] == "https"
        assert r["host"] == "h.ex.com"
        assert r["port"] == "8443"
        assert r["path"] == "/p/q"
        assert r["query"] == "a=1"


class TestReviewRegressions:
    def test_userinfo_stripped(self, spark):
        # the classic blocklist-evasion vector
        blocked = spark.createDataFrame([("bad.co.uk",)],
                                        "domain string")
        docs = spark.createDataFrame(
            [(1, "https://user@bad.co.uk/x"),
             (2, "https://u:pw@bad.co.uk:8080/x"),
             (3, "https://good.com/y")],
            "doc_id long, url string")
        kept = filter_blocked_domains(docs, blocked).collect()
        assert [r["doc_id"] for r in kept] == [3]
        assert _norm(spark, "https://u:pw@ex.com:8080/x") == \
            "https://ex.com:8080/x"

    def test_trailing_dot_host_normalized(self, spark):
        # 'example.com.' is the same FQDN as 'example.com' -- without
        # the strip, registered_domain returns 'com.' and the host
        # bypasses the blocklist (round-9 ADVICE)
        blocked = spark.createDataFrame([("bad.co.uk",)],
                                        "domain string")
        docs = spark.createDataFrame(
            [(1, "https://bad.co.uk./x"),
             (2, "https://sub.bad.co.uk.:8080/x"),
             (3, "https://good.com/y")],
            "doc_id long, url string")
        kept = filter_blocked_domains(docs, blocked).collect()
        assert [r["doc_id"] for r in kept] == [3]
        assert _norm(spark, "https://EX.com./a") == \
            _norm(spark, "https://ex.com/a")
        got = spark.createDataFrame(
            [("https://a.ex.com./p",)], "url string").select(
            registered_domain(
                url_parts(F.col("url"))["host"]).alias("d")
        ).first()["d"]
        assert got == "ex.com"
        # repeated trailing dots (review regression): same evasion
        # class, same strip
        kept = filter_blocked_domains(
            spark.createDataFrame([(1, "https://bad.co.uk../x")],
                                  "doc_id long, url string"),
            spark.createDataFrame([("bad.co.uk",)], "domain string"),
        ).collect()
        assert kept == []

    def test_fragment_question_mark_not_query(self, spark):
        assert _norm(spark, "https://ex.com/a#sec?b=2") == \
            "https://ex.com/a"

    def test_schemeless_urls_stay_distinct(self, spark):
        docs = spark.createDataFrame(
            [(1, "www.a.com/x"), (2, "www.b.org/y")],
            "doc_id long, url string")
        out = url_dedup(docs).collect()
        assert len(out) == 2  # no conflation onto one key

    def test_staging_column_collision_raises(self, spark):
        import pytest as _pt

        blocked = spark.createDataFrame([("x.com",)], "domain string")
        docs = spark.createDataFrame(
            [(1, "https://a.com/x", "v")],
            "doc_id long, url string, __xrs_url_domain string")
        with _pt.raises(ValueError, match="__xrs_url_domain"):
            filter_blocked_domains(docs, blocked)
