"""HTML text extraction (extensions/html.py): jusText-style block
classification, structural counters, and agreement between the Python
extractor and the Catalyst counter pipeline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xcube_resampling_spark.extensions.html import (
    SQL_HTML_STATS_EXPRS,
    _extract_one,
    extract_html_text,
    html_stats,
    synthesize_html,
    synthesize_html_sql,
)
from xcube_resampling_spark.extensions.text import EN_STOPWORDS

STOPS = frozenset(EN_STOPWORDS)

# > 200 chars and stopword-dense: lands in jusText's 'good' class
# outright (length_high=200, stop_high=0.32)
GOOD_PARA = (
    "The quick brown fox jumps over the lazy dog and it is a fine "
    "day for running in the field with all of the other animals "
    "that are out there in the morning sun by the old mill road "
    "and the river that runs down to the sea by the tall trees."
)


class TestExtractor:
    def test_strips_script_style_and_comments(self):
        html = (
            "<html><head><style>p{color:red}</style>"
            "<script>var x = 1 < 2;</script></head>"
            f"<body><p>{GOOD_PARA}</p><!-- hidden --></body></html>"
        )
        text, nb, ng, kc, lc = _extract_one(html, STOPS)
        assert "color" not in text and "var x" not in text
        assert "hidden" not in text
        assert GOOD_PARA in text
        assert ng == 1 and kc == len(GOOD_PARA)

    def test_nav_link_block_is_boilerplate(self):
        html = (
            f"<body><p>{GOOD_PARA}</p>"
            '<div><a href="/">home</a> <a href="/a">about</a> '
            '<a href="/b">contact</a></div></body>'
        )
        text, nb, ng, kc, lc = _extract_one(html, STOPS)
        assert nb == 2 and ng == 1
        assert "home" not in text and GOOD_PARA in text
        assert lc == len("home") + len("about") + len("contact")

    def test_short_block_between_good_neighbors_upgraded(self):
        html = (
            f"<p>{GOOD_PARA}</p><p>A short heading line</p>"
            f"<p>{GOOD_PARA}</p>"
        )
        text, nb, ng, kc, lc = _extract_one(html, STOPS)
        assert nb == 3 and ng == 3
        assert "short heading" in text

    def test_isolated_short_low_stopword_block_dropped(self):
        html = "<p>BUY NOW!!! CLICK HERE!!!</p>"
        text, nb, ng, kc, lc = _extract_one(html, STOPS)
        assert nb == 1 and ng == 0 and text == ""

    def test_entities_decoded(self):
        html = f"<p>{GOOD_PARA} Fish &amp; Chips &lt;tasty&gt;</p>"
        text, *_ = _extract_one(html, STOPS)
        assert "Fish & Chips <tasty>" in text

    def test_malformed_tail_salvaged(self):
        html = f"<p>{GOOD_PARA}</p><div><a href='broken"
        text, nb, ng, *_ = _extract_one(html, STOPS)
        assert GOOD_PARA in text

    def test_spark_extractor(self, spark):
        df = spark.createDataFrame(
            [(1, f"<p>{GOOD_PARA}</p><div><a href='/'>x</a></div>"),
             (2, "<p>short</p>")],
            "doc_id long, html string",
        )
        out = extract_html_text(df).orderBy("doc_id").collect()
        assert out[0].n_blocks == 2 and out[0].n_good_blocks == 1
        assert out[0].text == GOOD_PARA
        assert out[1].n_good_blocks == 0

    def test_extractor_plan_is_narrow(self, spark):
        df = spark.createDataFrame(
            [(1, "<p>x</p>")], "doc_id long, html string")
        plan = extract_html_text(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: pure map pass


class TestCounters:
    def test_hand_counted(self, spark):
        html = (
            "<body><p>ab&amp;cd</p>"
            '<a href="x">link&nbsp;text</a>'
            "<script>junk()</script><!-- c --></body>"
        )
        df = spark.createDataFrame(
            [(1, html)], "doc_id long, html string")
        r = html_stats(df).collect()[0]
        # tags after script/comment strip: body, p, /p, a, /a, /body
        assert r.n_tags == 6
        # text: '\n' (p open) + 'ab&cd' + '\n' (p close) + 'link text'
        assert r.text_chars == 1 + len("ab&cd") + 1 + len("link text")
        assert r.link_chars == len("link text")
        assert r.n_blocks == 2
        assert r.link_density_micro == round(
            r.link_chars * 1e6 / r.text_chars)

    def test_matches_duckdb_twin(self, spark):
        import duckdb

        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(sf + "/documents.parquet") \
            .select("doc_id", "text").limit(120)
        wrapped = docs.select(
            "doc_id",
            synthesize_html(F.col("text"), F.col("doc_id"))
            .alias("html"))
        got = html_stats(wrapped).orderBy("doc_id").toPandas()
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
        x = SQL_HTML_STATS_EXPRS(synthesize_html_sql("text", "doc_id"))
        sel = ", ".join(f"{v} AS {k}" for k, v in x.items())
        exp = con.execute(
            f"SELECT doc_id, {sel} FROM documents ORDER BY doc_id "
            "LIMIT 120").df()
        for c in ("n_tags", "text_chars", "link_chars",
                  "link_density_micro", "n_blocks"):
            np.testing.assert_array_equal(
                got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)

    def test_extractor_and_counters_agree_on_links(self, spark):
        # the two tiers count anchor chars through different code
        # paths (html.parser vs regex); they must agree on clean
        # markup
        html = (
            f"<body><p>{GOOD_PARA}</p>"
            '<div><a href="/h">home page</a> | '
            '<a href="/a">about &amp; contact</a></div></body>'
        )
        df = spark.createDataFrame(
            [(1, html)], "doc_id long, html string")
        stats = html_stats(df).collect()[0]
        ext = extract_html_text(df).collect()[0]
        assert stats.link_chars == ext.link_chars
