"""Deterministic corpus sampling for training-data pipelines.

Building a training mix from a 100-TB corpus needs sampling that is
(a) reproducible across runs and engines (no RNG state, no
``rand()``), (b) stable under repartitioning, and (c) expressible as
one scan + at most one shuffle.  Everything here keys off
:func:`~xcube_resampling_spark.extensions.text.hash32` (first 8 md5
hex chars as an integer), so any engine with md5 produces the same
sample -- the DuckDB oracle twins are exact, not statistical.

* :func:`sample_by_hash` -- Bernoulli-style sampling by hash
  threshold: keep iff ``hash32(seed || key) < rate * 2^32``.  Pure
  filter, no shuffle, no driver state; the same (seed, key) always
  lands on the same side, so incremental reruns over a growing corpus
  keep their previous decisions.
* :func:`split_by_hash` -- disjoint train/validation/test assignment
  from the same hash: cumulative fraction buckets, one label column.
  Split membership is a pure function of the key, the property that
  keeps a document from ever migrating between train and test as the
  corpus grows.
* :func:`stratified_cap` -- at most ``cap`` rows per stratum
  (language, source, domain ...), deterministic preference order:
  ``row_number`` over a hash-then-key sort, one window shuffle keyed
  by the stratum.  The hash order makes the cap a uniform subsample
  of each stratum rather than "first N by id".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from xcube_resampling_spark.extensions.text import hash32

_HASH_SPACE = float(2 ** 32)


def _keyed_hash(key: Column, seed: str, salt: str) -> Column:
    """Null-safe, per-function-salted hash.  NULL keys hash like any
    other value (a marker disjoint from real keys: 'n' vs 'v'||key) --
    a bare concat would go NULL and silently drop/misroute null-key
    rows.  The per-function salt makes composed stages independent:
    without it, sample_by_hash(rate) followed by split_by_hash with the
    same seed puts EVERY surviving row in the first split whose
    cumulative bound exceeds rate (identical hash on both decisions)."""
    marked = F.when(key.isNull(), F.lit("n")).otherwise(
        F.concat(F.lit("v"), key.cast("string"))
    )
    return hash32(F.concat(F.lit(f"{salt}|{seed}|"), marked))


def sample_by_hash(
    df: DataFrame, key: str | Column, rate: float, seed: str = ""
) -> DataFrame:
    """Keep rows whose keyed hash falls below ``rate`` of the 32-bit
    hash space.  Deterministic, shuffle-free, engine-portable."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    key_col = F.col(key) if isinstance(key, str) else key
    threshold = int(rate * _HASH_SPACE)
    return df.filter(
        _keyed_hash(key_col, seed, "sample") < F.lit(threshold))


def split_by_hash(
    df: DataFrame,
    key: str | Column,
    fractions: dict[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to exactly one named split by cumulative hash
    buckets (e.g. ``{"train": 0.9, "valid": 0.05, "test": 0.05}``).
    Fractions must sum to 1 (within 1e-9); iteration order of the dict
    defines the bucket order."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    key_col = F.col(key) if isinstance(key, str) else key
    h = _keyed_hash(key_col, seed, "split")
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        bound = F.lit(int(acc * _HASH_SPACE))
        branch = F.when(h < bound, F.lit(name))
        expr = branch if expr is None else expr.when(h < bound, F.lit(name))
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)


def stratified_cap(
    df: DataFrame,
    strata: str | Column,
    key: str | Column,
    cap: int,
    seed: str = "",
    rank_col: str = "strata_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by hash order
    (a uniform per-stratum subsample), rank exposed in ``rank_col``.
    One window shuffle keyed by the stratum; ties broken by the key
    itself so the result is total-ordered and engine-portable."""
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    strata_col = F.col(strata) if isinstance(strata, str) else strata
    key_col = F.col(key) if isinstance(key, str) else key
    win = Window.partitionBy(strata_col).orderBy(
        _keyed_hash(key_col, seed, "strata").asc(), key_col.asc()
    )
    return (
        df.withColumn(rank_col, F.row_number().over(win))
        .filter(F.col(rank_col) <= cap)
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str | Column = "source",
    key: str | Column = "doc_id",
    seed: str = "",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Weighted data mixture with epoch upsampling -- the step that
    turns a curated corpus into a training mix (e.g. Wikipedia at
    weight 3.0, web text at 0.3).

    Each source's weight ``w`` means "sample this source at rate w":
    ``floor(w)`` full copies (epochs 0..floor(w)-1) plus a
    hash-deterministic ``frac(w)`` subsample as the final partial
    epoch.  Sources absent from ``weights`` are dropped (weight 0).
    Output rows carry ``epoch_col`` so downstream shuffles can keep
    replicas apart (e.g. ``pack_sequences`` over (epoch, doc_id)).

    100-TB shape: a single narrow projection -- the weight lookup is a
    literal CASE chain, the replication an ``explode(sequence(...))``,
    and the fractional decision the same engine-portable md5 threshold
    as :func:`sample_by_hash`.  No shuffle, no RNG state; rerunning
    over a grown corpus keeps every previous decision.
    """
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be >= 0, got {w}")
    src = F.col(source_col) if isinstance(source_col, str) else source_col
    key_col = F.col(key) if isinstance(key, str) else key

    w_expr = None
    for s, w in weights.items():
        branch = (src == F.lit(s), F.lit(float(w)))
        w_expr = F.when(*branch) if w_expr is None else w_expr.when(*branch)
    w_expr = w_expr.otherwise(F.lit(0.0)) if w_expr is not None \
        else F.lit(0.0)

    n_full = F.floor(w_expr).cast("int")
    # integer threshold, exact in both engines (same as sample_by_hash)
    frac_keep = _keyed_hash(key_col, seed, "mix") < F.floor(
        (w_expr - n_full) * F.lit(_HASH_SPACE)).cast("bigint")
    n_epochs = n_full + frac_keep.cast("int")
    # sequence(0, -1) would DESCEND; empty array drops the row instead
    epochs = F.when(
        n_epochs > 0, F.sequence(F.lit(0), n_epochs - 1)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(epoch_col, F.explode(epochs))


def source_counts(
    df: DataFrame, source_col: str | Column = "source"
) -> dict[str, int]:
    """Per-source document counts as a driver dict (one map-side-
    combinable aggregation over however many sources exist -- the
    result is sources-sized, not corpus-sized)."""
    src = F.col(source_col) if isinstance(source_col, str) else source_col
    rows = df.groupBy(src.alias("source")).agg(
        F.count(F.lit(1)).alias("n")).collect()
    return {r["source"]: int(r["n"]) for r in rows}


def temperature_weights(
    counts: dict[str, int],
    temperature: float = 1.0,
    target_total: float | None = None,
    max_epochs: float | None = None,
) -> dict[str, float]:
    """Temperature-scaled mixing weights for :func:`mix_sources` -- the
    standard multilingual/multi-source LLM recipe (mT5/PaLM shape):
    sampling probability ``p_i proportional to n_i^(1/T)``, so ``T=1``
    preserves natural proportions and larger ``T`` flattens toward
    uniform, boosting low-resource sources.

    The returned weight is the per-document sampling RATE
    ``w_i = p_i * target_total / n_i`` (``target_total`` defaults to
    the corpus size, i.e. a same-sized remix).  ``max_epochs`` caps any
    single source's upsampling (the mT5 guard against tiny sources
    repeating hundreds of times); capped mass is NOT redistributed --
    the mix just comes out slightly smaller, which keeps every weight a
    pure function of (counts, T, caps).

    Driver-side pure function of the counts dict (pair it with
    :func:`source_counts`); feed the result straight into
    :func:`mix_sources`, which applies each rate as floor(w) full
    epochs + a hash-deterministic fractional epoch.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    if max_epochs is not None and max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    sized = {s: int(n) for s, n in counts.items() if n > 0}
    if not sized:
        return {}
    total = float(sum(sized.values()))
    tgt = float(target_total) if target_total is not None else total
    powed = {s: n ** (1.0 / temperature) for s, n in sized.items()}
    z = sum(powed.values())
    out = {}
    for s, n in sized.items():
        w = (powed[s] / z) * tgt / n
        if max_epochs is not None:
            w = min(w, float(max_epochs))
        out[s] = w
    return out
