"""URL curation operators -- the stage upstream of text filtering in
the public web-corpus pipelines (CCNet / RefinedWeb / FineWeb all
normalize, deduplicate, and domain-filter URLs before touching
document text).

Everything here is PURE Catalyst column algebra (no UDFs): URL
parsing by anchored regexp_extract, normalization rebuilt from parts
(never by fuzzy string replaces), a public-suffix-style registered
domain (built-in multi-part TLD set, swappable for a full PSL list),
exact URL dedup as one map-side-combinable ``min_by`` aggregation,
and broadcast semi-joins for blocklists.  At 100 TB the only shuffle
in the whole module is the dedup/stats groupBy on the normalized key;
domain filters broadcast.

Each expression has a value-identical DuckDB twin (the ``url_suite``
oracle entry), which is why normalization composes from parsed parts:
chained regex rewrites diverge between engines, concatenation of
exactly-defined parts cannot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "url_parts",
    "normalize_url",
    "registered_domain",
    "url_dedup",
    "domain_stats",
    "filter_blocked_domains",
]

# multi-part public suffixes the heuristic recognizes (a real
# deployment swaps in the full publicsuffix.org list as a broadcast
# set; the ALGORITHM -- take 3 labels when the last 2 are a listed
# suffix, else 2 -- is the PSL rule)
MULTI_TLDS = ("co.uk", "org.uk", "ac.uk", "com.au", "net.au",
              "co.jp", "co.in", "com.br", "co.za", "com.cn")

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_AUTH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# the '?' must appear BEFORE any '#': a fragment may legally contain
# '?' (RFC 3986) and must not be mistaken for the query
_QUERY_RE = r"^[^#]*\?([^#]*)"


def url_parts(url: Column) -> dict:
    """Split a URL column into ``scheme host port path query`` --
    anchored regexes only, identical between Spark and DuckDB.
    Userinfo (``user:pw@``) is stripped from the authority per
    RFC 3986 before host/port extraction (it is also the classic
    blocklist-evasion vector)."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    auth = F.regexp_extract(auth, r"([^@]*)$", 1)  # drop userinfo
    host = F.regexp_extract(auth, r"^([^:]*)", 1)
    # a trailing root-label dot ('example.com.') is the same FQDN:
    # without this strip, registered_domain sees labels
    # ['example','com',''] -> 'com.' and the host bypasses
    # filter_blocked_domains -- the same blocklist-evasion class as
    # userinfo smuggling
    host = F.regexp_replace(host, r"\.+$", "")
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    return {
        "scheme": F.lower(F.regexp_extract(url, _SCHEME_RE, 1)),
        "host": F.lower(host),
        "port": port,
        "path": F.regexp_extract(url, _PATH_RE, 1),
        "query": F.regexp_extract(url, _QUERY_RE, 1),
    }


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, leading ``www.`` and
    default ports dropped, fragment dropped, tracking (``utm_*``)
    params removed, trailing path slash trimmed (root stays ``/``),
    empty path becomes ``/``.  Rebuilt by concatenating the parsed
    parts so the DuckDB twin is value-identical."""
    p = url_parts(url)
    host = F.regexp_replace(p["host"], r"^www\.", "")
    port = F.when(
        ((p["scheme"] == "https") & (p["port"] == "443"))
        | ((p["scheme"] == "http") & (p["port"] == "80"))
        | (p["port"] == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    kept = F.filter(
        F.split(p["query"], "&"),
        lambda kv: ~kv.startswith("utm_") & (kv != ""),
    )
    query = F.when(
        F.size(kept) > 0,
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    built = F.concat(p["scheme"], F.lit("://"), host, port, path,
                     query)
    # scheme-less / relative strings can't be canonicalized: pass
    # them through untouched rather than conflating every one of
    # them onto the same ':///' key (which would make url_dedup drop
    # distinct documents as duplicates)
    return F.when(p["scheme"] == "", url).otherwise(built)


def registered_domain(host: Column) -> Column:
    """PSL-style registered domain: the last two host labels, or
    three when the last two are a listed multi-part suffix."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at: single-label hosts (localhost) must not trip
    # ANSI array bounds inside an untaken-looking branch
    last2 = F.concat_ws(".", F.try_element_at(labels, F.lit(-2)),
                        F.try_element_at(labels, F.lit(-1)))
    last3 = F.concat_ws(".", F.try_element_at(labels, F.lit(-3)),
                        F.try_element_at(labels, F.lit(-2)),
                        F.try_element_at(labels, F.lit(-1)))
    is_multi = last2.isin(*MULTI_TLDS)
    return (F.when(n <= 2, host)
            .when(is_multi & (n >= 3), last3)
            .otherwise(last2))


def url_domain(url: Column) -> Column:
    """Registered domain straight from a URL column (host extraction
    + ``www.`` strip + PSL heuristic) -- the single definition every
    domain consumer shares."""
    host = url_parts(url)["host"]
    return registered_domain(F.regexp_replace(host, r"^www\.", ""))


def url_dedup(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """Exact URL dedup on the normalized form: one row per canonical
    URL, keeping the smallest id (deterministic winner) -- a single
    map-side-combinable aggregation, the only shuffle here."""
    norm = normalize_url(F.col(url_col)).alias("norm_url")
    return (df.select(F.col(id_col), norm)
            .groupBy("norm_url")
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("n_dups")))


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Documents per registered domain -- the curation view that
    drives domain-level sampling caps."""
    return df.select(
        url_domain(F.col(url_col)).alias("domain")
    ).groupBy("domain").count()


def filter_blocked_domains(df: DataFrame, blocked: DataFrame,
                           url_col: str = "url") -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked``
    (column ``domain``) -- a broadcast LEFT ANTI join; the blocklist
    is list-sized, never shuffled against the corpus."""
    key = "__xrs_url_domain"  # collision-safe staging column
    if key in df.columns:
        raise ValueError(f"input already has a {key!r} column")
    return df.withColumn(key, url_domain(F.col(url_col))).join(
        F.broadcast(blocked.select(F.col("domain").alias(key))),
        key, "left_anti",
    ).drop(key)
