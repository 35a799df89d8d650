"""PII detection and redaction over a document corpus.

A standard pre-training scrub stage (the C4 / Dolma / FineWeb
pipelines all run one): find personally-identifiable spans -- email
addresses, phone numbers, IP addresses, SSN-shaped ids, payment-card
numbers -- count them per document, and rewrite the text with typed
placeholders.

Everything stays in whole-stage codegen: detection is
``regexp_count`` and redaction is a chain of ``regexp_replace`` calls
-- zero UDFs, zero shuffles; at 100 TB this is a pure map over the
corpus scan, combinable with any downstream filter in one stage.

Pattern notes:

* Patterns are restricted to the regex intersection of Java
  (Spark/codegen) and RE2 (DuckDB oracle): no lookaround, no
  backreferences -- so the DuckDB twin evaluates the *same* pattern
  text and the oracle equality is meaningful.
* Redaction applies in a fixed kind order (``PII_KINDS``); patterns
  are written to be mutually non-overlapping on realistic text
  (card-16 is anchored to 4x4 groups, SSN to 3-2-4, the phone shape
  requires separators), so order only matters for pathological
  inputs.
* Luhn validation of card-shaped matches is a pure SQL expression
  (``aggregate`` over the digit array -- the standard mod-10
  checksum) usable as a post-filter on ``cc16`` hits to cut false
  positives; shape-only counts stay the cross-engine contract
  because DuckDB has no matching higher-order fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PII_PATTERNS",
    "PII_KINDS",
    "luhn_valid",
    "pii_stats",
    "redact_pii",
]

# Java-regex AND RE2-compatible (no lookaround/backrefs).  Order =
# redaction order.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld -- the practical subset (RFC 5322 is famously
    # not a regex); matches what real scrub pipelines match
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # 16-digit card in 4x4 groups, '-' or ' ' separated or solid
    "cc16": r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b",
    # US SSN shape nnn-nn-nnnn
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # NANP-style phone: optional +country prefix, then 3-3-4 separated.
    # The \b sits AFTER the optional +CC group (a leading \b would
    # break the '+1 ...' form); without it '9999123-456-7890' would
    # redact a 3-3-4 tail out of a longer digit run
    "phone": r"(?:\+\d{1,3}[-. ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    # dotted-quad IPv4
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

PII_KINDS = tuple(PII_PATTERNS)


def luhn_valid(digits: Column) -> Column:
    """Mod-10 (Luhn) checksum over a digit-only string column, as one
    codegen expression: double every second digit from the right,
    subtract 9 when that doubling exceeds 9, sum, check mod 10.
    Standard payment-card validity test -- apply to ``cc16`` matches
    (separators stripped) to drop shape-only false positives."""
    n = F.length(digits)
    ds = F.split(digits, "")
    total = F.aggregate(
        F.filter(ds, lambda c: c != F.lit("")),
        F.struct(F.lit(0).alias("i"), F.lit(0).alias("s")),
        lambda acc, c: F.struct(
            (acc["i"] + 1).alias("i"),
            (
                acc["s"]
                + F.when(
                    # positions counted from the RIGHT: index i (0-based
                    # from left) is "second from right" when (n-1-i)
                    # is odd
                    ((n - 1 - acc["i"]) % 2) == 1,
                    F.when(
                        c.cast("int") * 2 > 9, c.cast("int") * 2 - 9
                    ).otherwise(c.cast("int") * 2),
                ).otherwise(c.cast("int"))
            ).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    return (total % 10) == 0


def pii_stats(
    docs: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Per-document PII hit counts -- ``n_<kind>`` per pattern plus
    ``n_pii`` total.  One narrow projection (``regexp_count`` per
    kind), no shuffle."""
    ks = PII_KINDS if kinds is None else tuple(kinds)
    if not ks:
        raise ValueError("pii_stats: kinds must name at least one "
                         f"pattern of {PII_KINDS}")
    text = F.col(text_col)
    counts = [
        F.regexp_count(text, F.lit(PII_PATTERNS[k]))
        .cast("bigint").alias(f"n_{k}")
        for k in ks
    ]
    out = docs.select("doc_id", *counts)
    total = None
    for k in ks:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("n_pii", total.cast("bigint"))


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
    out_col: str = "redacted",
) -> DataFrame:
    """Rewrite each document with typed placeholders (``[EMAIL]``,
    ``[CC16]``, ...) for every PII span, in ``PII_KINDS`` order.  A
    chain of global ``regexp_replace`` calls -- one codegen stage."""
    ks = PII_KINDS if kinds is None else tuple(kinds)
    col = F.col(text_col)
    for k in ks:
        col = F.regexp_replace(
            col, PII_PATTERNS[k], f"[{k.upper()}]"
        )
    return docs.select("doc_id", col.alias(out_col))
