"""HTML text extraction -- the first stage of a web-corpus curation
pipeline (the reference engine has no web ingestion; this extends the
LLM-data surface the same way text.py/dedup.py do).

Two tiers, matching the package's established oracle pattern:

* :func:`extract_html_text` -- the REAL extractor: a stdlib
  ``html.parser``-based block segmenter with a jusText-style
  boilerplate classifier (public algorithm: Pomikalek 2011 --
  link-density / stopword-density / length thresholds with a
  context-sensitive smoothing pass).  Runs as one Arrow
  ``mapInPandas`` pass per partition -- narrow, no shuffle, linear in
  corpus bytes, so it holds at 100 TB exactly like the other
  per-document curation stages.
* :func:`html_stats` -- integer-exact structural counters (tag count,
  text chars, anchor-text chars, micro-unit link density, block
  count) expressed in pure Catalyst built-ins (``regexp_count`` /
  ``regexp_extract_all`` / chained ``replace``), each with a 1:1
  DuckDB translation so the oracle harness can hash-compare values.
  The unit tests additionally assert the Python extractor and the
  Catalyst pipeline agree on the shared counters.

Entity handling: the five named entities that dominate real markup
(``&amp; &lt; &gt; &quot; &nbsp;``) plus ``&#39;`` are decoded in the
counter pipeline (``&amp;`` last, the standard double-decode trap);
the real extractor gets full entity decoding from ``html.parser``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from xcube_resampling_spark.extensions.text import EN_STOPWORDS

__all__ = [
    "extract_html_text",
    "html_stats",
    "synthesize_html",
    "SQL_HTML_STATS_EXPRS",
]

# block-level elements that terminate a text block (public HTML5 set,
# trimmed to the ones that matter for segmentation)
BLOCK_TAGS = frozenset(
    "p div br h1 h2 h3 h4 h5 h6 li ul ol dl dt dd tr td th table "
    "thead tbody blockquote pre section article header footer nav "
    "aside main figure figcaption form fieldset hr address".split()
)
# subtrees whose text is never content
SKIP_TAGS = frozenset("script style noscript template head svg".split())

_TAG_RE = r"<[^>]+>"
_SCRIPT_RE = r"(?is)<(script|style)\b[^>]*>.*?</(script|style)\s*>"
_COMMENT_RE = r"(?s)<!--.*?-->"
_ANCHOR_RE = r"(?is)<a\b[^>]*>(.*?)</a>"
_BLOCK_RE = (
    r"(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|pre"
    r"|section|article|header|footer|nav|aside|main|hr)\b[^>]*/?>"
)


def _decoded_text(html: Column) -> Column:
    """Tag-stripped, entity-decoded text with block tags as newlines."""
    x = F.regexp_replace(html, _SCRIPT_RE, "")
    x = F.regexp_replace(x, _COMMENT_RE, "")
    x = F.regexp_replace(x, _BLOCK_RE, "\n")
    x = F.regexp_replace(x, _TAG_RE, "")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        x = F.replace(x, F.lit(ent), F.lit(ch))
    return x


def html_stats(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Structural counters per row, all integer-exact (the one ratio
    is carried in micro-units): ``n_tags`` (tags outside script/style/
    comments), ``text_chars`` (decoded text length), ``link_chars``
    (decoded anchor-text length), ``link_density_micro``
    (``round(link_chars * 1e6 / text_chars)``, 0 when empty), and
    ``n_blocks`` (non-blank text blocks after block-tag
    segmentation).  Pure Catalyst built-ins -- whole-stage codegen,
    no shuffle, no UDF."""
    html = F.col(html_col)
    stripped = F.regexp_replace(
        F.regexp_replace(html, _SCRIPT_RE, ""), _COMMENT_RE, "")
    n_tags = F.regexp_count(stripped, F.lit(_TAG_RE)).cast("bigint")
    txt = _decoded_text(html)
    text_chars = F.length(txt).cast("bigint")
    anchors = F.regexp_extract_all(stripped, F.lit(_ANCHOR_RE), 1)
    # decode + strip the joined anchor texts so entity shrinkage and
    # inner tags are counted exactly like the main text
    joined = F.array_join(anchors, "\x00")
    link_chars = F.length(
        _decoded_text(F.concat(F.lit("<x>"), joined))).cast("bigint") \
        - (F.size(anchors) - 1).cast("bigint")
    link_chars = F.when(F.size(anchors) == 0, F.lit(0).cast("bigint")) \
        .otherwise(link_chars)
    density = F.when(
        text_chars > 0,
        F.round(link_chars * F.lit(1000000) / text_chars)
        .cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    blocks = F.filter(
        F.split(txt, "\n"),
        lambda b: F.length(F.trim(b)) > 0)
    return df.select(
        *[c for c in df.columns if c != html_col],
        n_tags.alias("n_tags"),
        text_chars.alias("text_chars"),
        link_chars.alias("link_chars"),
        density.alias("link_density_micro"),
        F.size(blocks).alias("n_blocks"),
    )


def synthesize_html(text: Column, doc_id: Column) -> Column:
    """Deterministic HTML wrapping of a plain-text column -- the
    fixture generator for the oracle leg (the same expression has a
    literal DuckDB translation).  Sentence boundaries become
    paragraph breaks; a nav bar of links and a script block provide
    boilerplate for the counters to see."""
    body = F.replace(text, F.lit(". "), F.lit(".</p><p>"))
    return F.concat(
        F.lit("<html><head><title>doc "), doc_id.cast("string"),
        F.lit("</title><style>p { color: red; }</style>"
              "<script>if (a < 2 && b > 1) { x = \"y\"; }</script>"
              "</head><body><h1>Document "),
        doc_id.cast("string"),
        F.lit("</h1><p>"), body,
        F.lit("</p><div class=\"nav\"><a href=\"/home\">home page"
              "</a> | <a href=\"/about\">about &amp; contact</a>"
              "</div><!-- trailing comment < > --></body></html>"),
    )


def synthesize_html_sql(text_expr: str, doc_id_expr: str) -> str:
    """DuckDB twin of :func:`synthesize_html`."""
    return (
        "'<html><head><title>doc ' || CAST(" + doc_id_expr
        + " AS VARCHAR) || '</title><style>p { color: red; }</style>"
        "<script>if (a < 2 && b > 1) { x = \"y\"; }</script>"
        "</head><body><h1>Document ' || CAST(" + doc_id_expr
        + " AS VARCHAR) || '</h1><p>' || replace(" + text_expr
        + ", '. ', '.</p><p>') || '</p><div class=\"nav\">"
        "<a href=\"/home\">home page</a> | <a href=\"/about\">"
        "about &amp; contact</a></div>"
        "<!-- trailing comment < > --></body></html>'"
    )


# DuckDB expression fragments mirroring html_stats, keyed by output
# column; 'H' is the html expression placeholder.
_SQL_STRIP = (
    "regexp_replace(regexp_replace({H}, "
    "'(?is)<(script|style)\\b[^>]*>.*?</(script|style)\\s*>', '', 'g'),"
    " '(?s)<!--.*?-->', '', 'g')"
)
_SQL_DECODE = (
    "replace(replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace({X}, "
    "'(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|blockquote|pre"
    "|section|article|header|footer|nav|aside|main|hr)\\b[^>]*/?>',"
    " chr(10), 'g'), '<[^>]+>', '', 'g'),"
    " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
    " '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&')"
)


def SQL_HTML_STATS_EXPRS(html_expr: str) -> dict[str, str]:
    """DuckDB expressions for every :func:`html_stats` output column,
    evaluated over ``html_expr``.  Used by the oracle twin."""
    stripped = _SQL_STRIP.format(H=html_expr)
    txt = _SQL_DECODE.format(X=stripped)
    anchors = ("regexp_extract_all(" + stripped
               + ", '(?is)<a\\b[^>]*>(.*?)</a>', 1)")
    joined = "list_aggregate(" + anchors + ", 'string_agg', chr(0))"
    link = (
        "CASE WHEN len(" + anchors + ") = 0 THEN 0 ELSE length("
        + _SQL_DECODE.format(
            X=_SQL_STRIP.format(H="'<x>' || " + joined))
        + ") - (len(" + anchors + ") - 1) END"
    )
    return {
        "n_tags": ("CAST(len(regexp_extract_all(" + stripped
                   + ", '<[^>]+>')) AS BIGINT)"),
        "text_chars": "CAST(length(" + txt + ") AS BIGINT)",
        "link_chars": "CAST(" + link + " AS BIGINT)",
        "link_density_micro": (
            "CAST(CASE WHEN length(" + txt + ") > 0 THEN ROUND(("
            + link + ") * 1000000.0 / length(" + txt
            + ")) ELSE 0 END AS BIGINT)"),
        "n_blocks": (
            "CAST(len(list_filter(string_split(" + txt
            + ", chr(10)), b -> length(trim(b)) > 0)) AS INT)"),
    }


# ------------------------------------------------------------------ #
# the real extractor


def _classify(length, words, link_chars, stop_hits,
              max_link_density, length_low, length_high,
              stop_low, stop_high):
    """jusText context-free block class: 'bad', 'short', 'neargood',
    or 'good' (Pomikalek 2011 defaults)."""
    link_density = link_chars / length if length else 1.0
    stop_density = stop_hits / words if words else 0.0
    if link_density > max_link_density:
        return "bad"
    if length < length_low:
        return "short"
    if stop_density >= stop_high:
        return "good" if length > length_high else "neargood"
    if stop_density >= stop_low:
        return "neargood"
    return "bad"


def _extract_one(html, stops, max_link_density=0.2, length_low=70,
                 length_high=200, stop_low=0.30, stop_high=0.32):
    """(extracted_text, n_blocks, n_good, kept_chars, link_chars)."""
    from html.parser import HTMLParser

    class P(HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[tuple[str, int]] = []
            self._cur: list[str] = []
            self._link = 0
            self._skip = 0
            self._a = 0

        def handle_starttag(self, tag, attrs):
            if tag in SKIP_TAGS:
                self._skip += 1
            elif tag == "a":
                self._a += 1
            elif tag in BLOCK_TAGS:
                self._flush()

        def handle_startendtag(self, tag, attrs):
            if tag in BLOCK_TAGS:
                self._flush()

        def handle_endtag(self, tag):
            if tag in SKIP_TAGS:
                self._skip = max(0, self._skip - 1)
            elif tag == "a":
                self._a = max(0, self._a - 1)
            elif tag in BLOCK_TAGS:
                self._flush()

        def handle_data(self, d):
            if self._skip:
                return
            self._cur.append(d)
            if self._a:
                self._link += len(d)

        def _flush(self):
            norm = " ".join("".join(self._cur).split())
            if norm:
                self.blocks.append((norm, min(self._link, len(norm))))
            self._cur = []
            self._link = 0

    p = P()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # salvage whatever parsed; malformed tails are common
    p._flush()
    blocks = p.blocks
    classes = []
    for text, link in blocks:
        words = text.split()
        hits = sum(1 for wd in words if wd.lower() in stops)
        classes.append(_classify(
            len(text), len(words), link, hits, max_link_density,
            length_low, length_high, stop_low, stop_high))
    # context-sensitive smoothing: short/neargood blocks inherit
    # 'good' when an adjacent block is good (one pass each way)
    for order in (range(1, len(classes)),
                  range(len(classes) - 2, -1, -1)):
        for i in order:
            j = i - 1 if order.step == 1 else i + 1
            if classes[i] in ("short", "neargood") \
                    and classes[j] == "good":
                classes[i] = "good"
    kept = [b for (b, _), cl in zip(blocks, classes) if cl == "good"]
    return (
        "\n".join(kept),
        len(blocks),
        sum(1 for cl in classes if cl == "good"),
        sum(len(b) for b in kept),
        sum(lk for _, lk in blocks),
    )


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.2,
    length_low: int = 70,
    length_high: int = 200,
    stop_low: float = 0.30,
    stop_high: float = 0.32,
) -> DataFrame:
    """Boilerplate-free main text per document:
    ``(doc_id, text, n_blocks, n_good_blocks, kept_chars,
    link_chars)``.

    jusText-style classification (link density -> bad; stopword
    density + length -> good/neargood; context smoothing upgrades
    short blocks beside good ones), over ``html.parser`` block
    segmentation.  One Arrow ``mapInPandas`` pass -- narrow (no
    shuffle), so the operator scales with input bytes like every
    other curation stage; at 100 TB it is bounded by parquet scan
    throughput, not by this stage."""
    stops = frozenset(EN_STOPWORDS)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("n_blocks", T.IntegerType(), False),
        T.StructField("n_good_blocks", T.IntegerType(), False),
        T.StructField("kept_chars", T.LongType(), False),
        T.StructField("link_chars", T.LongType(), False),
    ])

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, html in zip(pdf[id_col], pdf[html_col]):
                text, nb, ng, kc, lc = _extract_one(
                    html or "", stops, max_link_density,
                    length_low, length_high, stop_low, stop_high)
                rows.append((int(did), text, nb, ng, kc, lc))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "text", "n_blocks", "n_good_blocks",
                "kept_chars", "link_chars"])

    return df.select(id_col, html_col).mapInPandas(compute, schema)
