"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-duplicates.

Spark-first shapes:

* exact dedup = hash-groupBy (one map-side-combinable shuffle),
* n-gram Jaccard = shingle explode -> equi-join on shingle -> pair groupBy
  (candidate generation by shared shingle, never a cross join),
* MinHash+LSH = shingle hash -> K permutations (a_k*x+b_k mod P) ->
  min per permutation -> band keys -> bucket equi-join -> verified pairs,
* SimHash = per-token 32-bit hashes -> bitwise majority -> band join on
  16-bit halves -> Hamming filter,
* embedding cosine = exact pairwise above a bucketed length filter
  (brute force here; IVF-bucketed variant in similarity.py).

All hashes are the md5-based 32-bit hash (text.hash32) which DuckDB
reproduces exactly, so every operator has a value-level oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import exploded_shingles, hash32

# MinHash permutation parameters: h_k(x) = (A_k * x + B_k) mod P.
# A_k < 2^30 so A_k * x stays below 2^62 for 32-bit x (no int64 overflow in
# either Spark or the DuckDB oracle); fixed literals shared with the oracle.
MINHASH_P = 4294967311  # smallest prime > 2^32
NUM_PERM = 16
BANDS = 4  # 4 bands x 4 rows
MINHASH_A = [976369 + 104729 * k for k in range(NUM_PERM)]
MINHASH_B = [123456789 + 987654 * k for k in range(NUM_PERM)]

# Shingle tables persisted by the dedup operators (used 3-4x within one
# query plan).  The returned DataFrames keep the cached plans alive, so
# repeated operator calls would otherwise accumulate executor storage for
# the session's lifetime; call release_cached() (or
# spark.catalog.clearCache()) once results are consumed.
_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def _persist_now(df: DataFrame) -> DataFrame:
    """Persist AND materialize before returning.

    The banded-LSH queries fan the persisted signature table into three
    AQE-parallel consumers (hot-key aggregate, tag-join probe, band
    self-join).  Launched against a lazily-persisted table they race to
    populate the same cache partitions and serialize on the per-block
    locks -- a stage profile of the sf0.1 simhash showed the three
    consumer stages burning 14.9/10.1/4.9 s of executor time against
    13.6 s for the signature itself.  One eager pass pays the signature
    exactly once; every consumer then reads a warm cache."""
    df = _persist(df)
    df.count()
    return df


def release_cached() -> None:
    """Unpersist every shingle table cached by prior dedup calls."""
    while _PERSISTED:
        _PERSISTED.pop().unpersist()


# Hot-bucket short-circuit threshold for every banded-LSH self-join.
# Candidate pairs are quadratic in bucket size, so one boilerplate
# cluster (licence pages, templated docs) of 10^6 rows sharing a band
# key would emit 10^12 pairs and kill the stage at 100-TB scale.  Above
# the cap a bucket contributes only size-1 "star" candidates against
# its minimum-id representative -- linear, and still individually
# verified downstream.
DEFAULT_MAX_BUCKET = 1000


def banded_candidate_pairs(
    bands: DataFrame,
    id_col: str,
    key_cols: tuple[str, ...],
    payload_cols: tuple[str, ...] = (),
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    persist_bands: bool = True,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b [, <payload>_a..., <payload>_b...])``
    with ``id_a < id_b`` from a banded-LSH table, with a hot-bucket
    short-circuit -- the shared candidate generator for the MinHash,
    SimHash, sign-LSH, and dHash band joins.

    Buckets of at most ``max_bucket`` rows self-join on ``key_cols``
    (equi-join, never a cross join).  Larger buckets -- quadratic pair
    blow-up territory -- are detected with ONE map-side-combinable
    groupBy over the persisted band table (the cache is shared with
    the tag join and the self-join, so the upstream pipeline computes
    once; the agg output is at most ``n_rows / max_bucket`` keys, so
    it broadcasts) and
    short-circuited: each member pairs only with the bucket's
    minimum-id representative (``size - 1`` star candidates, no join
    at all).  Every candidate, star or not, still goes through
    the caller's exact verification (Jaccard / Hamming / cosine), so
    precision is unchanged; pair-level recall INSIDE a hot bucket
    degrades to representative connectivity, which is exactly what the
    downstream :func:`dup_components` clustering needs -- members that
    verify against the representative land in one component.  This is
    the standard production dimensioning for boilerplate-heavy corpora.

    ``max_bucket=None`` disables the cap (full self-join everywhere).
    The default (1000) keeps the short-circuit out of the way at test
    scale while bounding any bucket's contribution to ~500k pairs.

    ``persist_bands=False`` skips caching the band table.  Pass it when
    the caller already persisted the table ``bands`` derives from by a
    cheap projection (signature tables in minhash/simhash): recomputing
    the projection per consumer is then cheaper than the cache -- the
    three AQE-parallel consumer stages (hot-key agg, tag join, self-
    join) otherwise race to populate the same cache partitions and
    serialize on it (measured: simhash 2.71 -> 2.37 s, minhash 2.82 ->
    2.38 s on the sf0.1 headline).
    """
    keys = list(key_cols)
    if max_bucket is not None:
        # The band table is PERSISTED (released by release_cached):
        # the hot-key aggregate, the tag join probe, and both self-
        # join sides read the cache, so the upstream signature
        # pipeline computes ONCE.  Hot-key detection stays a
        # map-side-combinable groupBy (per-key state = one counter +
        # one min), so a 10^7-row boilerplate bucket never has to be
        # buffered or sorted by a single task the way a window
        # function over the key would; its output is at most
        # n_rows/max_bucket keys and broadcasts.  (Two earlier
        # formulations measured worse: groupBy without caching
        # recomputed the pipeline, +1.5s on the sf0.1 minhash
        # headline; window functions buffered the hot bucket in one
        # WindowExec task -- the exact straggler the cap exists to
        # prevent.)
        if persist_bands:
            bands = _persist(bands)
        hot = (
            bands.groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("__bsz"),
                F.min(id_col).alias("__rep"),
                *[
                    F.min_by(F.col(c), F.col(id_col)).alias(f"__rep_{c}")
                    for c in payload_cols
                ],
            )
            .filter(F.col("__bsz") > max_bucket)
            .drop("__bsz")
        )
        tagged = bands.join(F.broadcast(hot), keys, "left")
        small = tagged.filter(F.col("__rep").isNull()).select(
            id_col, *keys, *payload_cols
        )
        star = tagged.filter(
            F.col("__rep").isNotNull() & (F.col(id_col) != F.col("__rep"))
        ).select(
            F.col("__rep").alias("id_a"),
            F.col(id_col).alias("id_b"),
            *[F.col(f"__rep_{c}").alias(f"{c}_a") for c in payload_cols],
            *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        )
    else:
        small, star = bands, None
    a = small.alias("a")
    b = small.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in keys:
        cond = (F.col(f"a.{c}") == F.col(f"b.{c}")) & cond
    pairs = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        *[F.col(f"a.{c}").alias(f"{c}_a") for c in payload_cols],
        *[F.col(f"b.{c}").alias(f"{c}_b") for c in payload_cols],
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by content hash; keeper = min doc_id
    (hash-groupBy, the canonical exact-dedup shape)."""
    return (
        docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .select("content_hash", "keep_id", F.col("n_docs").cast("bigint")
                .alias("n_docs"))
    )


def shingle_hashes(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, h): distinct 32-bit hashes of word k-gram shingles."""
    return (
        exploded_shingles(docs, k)
        .select("doc_id", hash32(F.col("sh")).alias("h"))
        .distinct()
    )


def dedup_ngram_jaccard(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Pairwise word-k-gram Jaccard similarity >= threshold.

    Candidate pairs share at least one shingle (equi-join on the shingle
    hash); Jaccard from distinct-shingle counts.  The shared-shingle join
    is the scalable candidate generator; its worst case is a ubiquitous
    shingle whose posting list joins quadratically.  ``max_df_ratio``
    guards against that skew: shingles appearing in more than that
    fraction of documents are excluded from CANDIDATE GENERATION (the
    standard stop-shingle cut).  Verification still counts common shingles
    over the FULL sets, so reported Jaccard values are exact; only pairs
    sharing nothing but ubiquitous shingles are missed -- at a sane ratio
    those are far below any useful threshold anyway.
    """
    sh = _persist(shingle_hashes(docs, k))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    if max_df_ratio is None:
        # single pass: the candidate join doubles as the common-count
        a = sh.alias("a")
        b = sh.alias("b")
        common = (
            a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    else:
        # skew guard on: candidates from the stop-shingle-filtered table,
        # exact common counts re-derived from the full table
        n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        keep = (
            sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("df") <= F.col("n_docs") * max_df_ratio)
            .select("h")
        )
        cand_sh = sh.join(keep, "h")
        a = cand_sh.alias("a")
        b = cand_sh.alias("b")
        cand = (
            a.join(b, (F.col("a.h") == F.col("b.h"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .distinct()
        )
        sa = sh.select(
            F.col("doc_id").alias("id_a"), F.col("h").alias("h_a")
        )
        sb = sh.select(
            F.col("doc_id").alias("sb_id"), F.col("h").alias("h_b")
        )
        common = (
            cand.join(sa, "id_a")
            .join(sb, (F.col("id_b") == F.col("sb_id"))
                  & (F.col("h_a") == F.col("h_b")))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    out = (
        common.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .select(
            "id_a", "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def minhash_signatures(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, m0..m{NUM_PERM-1}): MinHash signature per document, wide.

    One map-side-combinable aggregation with NUM_PERM min() columns -- no
    row blow-up (the naive explode(perms) shape shuffles NUM_PERM x the
    shingle count; this shuffles it once)."""
    return minhash_signatures_from_hashes(shingle_hashes(docs, k))


def minhash_signatures_from_hashes(sh: DataFrame) -> DataFrame:
    """Wide MinHash signature from a (doc_id, h) shingle-hash table."""
    mins = [
        F.min(
            (F.lit(MINHASH_A[p]) * F.col("h") + F.lit(MINHASH_B[p]))
            % F.lit(MINHASH_P)
        ).alias(f"m{p}")
        for p in range(NUM_PERM)
    ]
    return sh.groupBy("doc_id").agg(*mins)


def shingle_sets(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, hs): per-document array of distinct 32-bit shingle hashes.

    ONE map-side-combinable shuffle (collect_set groupBy); everything
    downstream -- signatures, set sizes, intersection counts -- is array
    arithmetic on this table, so the shingle rows are never reshuffled.
    Array length is bounded by document length (shingle count), so rows
    stay small at any corpus scale."""
    return (
        exploded_shingles(docs, k)
        .select("doc_id", hash32(F.col("sh")).alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
    )


def dedup_minhash_lsh(
    docs: DataFrame, k: int = 3, threshold: float = 0.5,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash + LSH banding near-duplicate pairs, verified with true
    Jaccard.  Bands of NUM_PERM/BANDS rows; candidates = docs sharing a
    band key; verification intersects the per-doc shingle-hash arrays.

    Physical plan: ONE shuffle aggregates the exploded shingle hashes per
    doc into both the verify array (collect_set) and all NUM_PERM
    signature minima (plain min() aggregates of (a*h+b) % p -- map-side
    combinable, whole-stage codegen; min over occurrences == min over the
    set, and the former needs no interpreted higher-order transform).
    The band self-join keys on (band, band_key) over BANDS rows per doc;
    verification joins the candidate pairs back to the (small,
    auto-broadcastable) array table twice and computes
    size(array_intersect) -- no shingle-row explode, no re-shuffle of the
    shingle table.  Band buckets above ``max_bucket`` rows (boilerplate
    clusters) short-circuit to star candidates against the bucket
    representative via :func:`banded_candidate_pairs` -- linear, never
    quadratic, in bucket size."""
    # expr-string construction (see simhash: the Column-DSL form of
    # these aggregates cost ~0.9 s of measured py4j driver time per
    # query construction; the parsed trees and values are identical)
    hashed = exploded_shingles(docs, k).select(
        "doc_id", hash32(F.col("sh")).alias("h")
    )
    sets = _persist_now(
        hashed.groupBy("doc_id").agg(
            F.collect_set("h").alias("hs"),
            *[
                F.expr(
                    f"min(({MINHASH_A[p]} * h + {MINHASH_B[p]})"
                    f" % {MINHASH_P})"
                ).alias(f"m{p}")
                for p in range(NUM_PERM)
            ],
        )
    )
    rows_per_band = NUM_PERM // BANDS
    band_structs = ", ".join(
        "struct({b} AS band, md5(concat_ws(',', {ms})) AS band_key)"
        .format(
            b=band,
            ms=", ".join(
                f"CAST(m{band * rows_per_band + r} AS STRING)"
                for r in range(rows_per_band)
            ),
        )
        for band in range(BANDS)
    )
    bands = sets.selectExpr(
        "doc_id", f"explode(array({band_structs})) AS bk"
    ).selectExpr("doc_id", "bk.band AS band", "bk.band_key AS band_key")
    cand = banded_candidate_pairs(
        bands, "doc_id", ("band", "band_key"), max_bucket=max_bucket,
        persist_bands=False,  # sets is persisted; bands is a projection
    )
    # verify candidates with the exact Jaccard from the cached arrays
    arr_a = sets.select(
        F.col("doc_id").alias("id_a"), F.col("hs").alias("hs_a")
    )
    arr_b = sets.select(
        F.col("doc_id").alias("id_b"), F.col("hs").alias("hs_b")
    )
    return (
        cand.join(arr_a, "id_a")
        .join(arr_b, "id_b")
        .select(
            "id_a", "id_b",
            F.size(F.array_intersect("hs_a", "hs_b")).alias("n_common"),
            F.size("hs_a").alias("n_a"), F.size("hs_b").alias("n_b"),
        )
        .select(
            "id_a", "id_b",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 4 x 16-bit bands: hamming <= 3 recall is EXACT


def _hash32_hi(c):
    """Second independent 32-bit word from the same md5 digest (hex chars
    9-16) -- together with text.hash32 this forms the 64-bit token hash
    without ever materializing a sign-fragile 64-bit integer."""
    return F.conv(F.substring(F.md5(c), 9, 8), 16, 10).cast("bigint")


def simhash(docs: DataFrame) -> DataFrame:
    """(doc_id, sh_lo, sh_hi): 64-bit SimHash over whitespace tokens,
    stored as two 32-bit words (bits 0-31 / 32-63).

    Per-bit weighted majority of token hashes, computed as 64 conditional
    sums in a single aggregation (one map-side-combinable shuffle, fully
    codegen).  Two words instead of one int64 keep every value unsigned-
    representable in both Spark and DuckDB (no 2^63 sign wrap to reason
    about in either engine or the oracle SQL)."""
    # Expressions are built as server-side-parsed SQL strings (F.expr /
    # selectExpr): the original per-term Column DSL issued ~1000 py4j
    # round trips and cost a measured 2.16 s of DRIVER time per query
    # construction -- more than the query's own 10k-doc execution.
    # expr strings parse to the same expression trees (values
    # bit-identical, asserted by the oracle), at ~30 round trips.
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .alias("tok"),
    ).selectExpr(
        "doc_id",
        # ONE hex parse of md5 bytes 0-7 (signed conv, bits identical):
        # bits 32-63 = the hash32 word (md5 bytes 0-3, "h_lo"), bits
        # 0-31 = the _hash32_hi word (bytes 4-7, "h_hi").  The previous
        # two-parse form (conv of bytes 0-3 and 4-7 separately) cost a
        # second base-16 string parse per token.
        "CAST(conv(substring(md5(tok), 1, 16), 16, -10) AS BIGINT) AS v",
    )
    # branchless + packed: the +/-1 majority "sum(+-1) > 0" is
    # equivalent to "2 * sum(bit) > n", and bits b of both words share
    # ONE 64-bit sum: (v >> b) & 0x100000001 picks bit b of the high
    # word into lane 32 and bit b of the low word into lane 0 with a
    # single shift+mask (per-doc counts stay under 2^31, so the lanes
    # never carry; b <= 31 keeps arithmetic-shift sign fill away from
    # lane 32).  33 aggregates instead of 65 keeps the stage inside
    # whole-stage codegen (spark.sql.codegen.maxFields = 100); the
    # 65-aggregate form fell back to interpreted evaluation.  A
    # (doc, hash) pre-count was tried and lost: it adds a second
    # exchange that outweighs its ~2.3x row reduction.  Measured
    # (interleaved min-of-6, noop sink): signature 5.8 -> 5.27 s on the
    # 1M-doc corpus, 1.69 -> 1.37 s on the sf0.1 headline.
    packed = [
        F.expr(f"sum(shiftright(v, {b}) & 4294967297)").alias(f"p{b}")
        for b in range(32)
    ] + [F.count(F.lit(1)).alias("n_tok")]
    agg = toks.groupBy("doc_id").agg(*packed)

    def word_sql(lo_word: bool) -> str:
        # sh_lo (hash32, md5 bytes 0-3) counts sit in lane 32; sh_hi
        # (bytes 4-7) counts in lane 0
        terms = " + ".join(
            "(CASE WHEN "
            + (f"shiftright(p{b}, 32)" if lo_word
               else f"(p{b} & 4294967295)")
            + f" * 2 > n_tok THEN {2 ** b} ELSE 0 END)"
            for b in range(32)
        )
        return f"CAST({terms} AS BIGINT)"

    return agg.selectExpr(
        "doc_id",
        word_sql(True) + " AS sh_lo",
        word_sql(False) + " AS sh_hi",
    )


def dedup_simhash(
    docs: DataFrame, max_hamming: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate pairs by 64-bit SimHash: candidates share one of 4
    16-bit bands (pigeonhole: <= 3 differing bits leave at least one band
    identical, so recall at max_hamming=3 is exact), verified by exact
    Hamming distance.

    Scale shape: banded equi-join, never all-pairs.  At ~10^9 docs each
    16-bit band bucket holds ~n/65536 docs of mostly-unrelated hashes;
    4 bands of a 64-bit hash is the standard production dimensioning
    (Manku et al., WWW 2007).  Identical-hash pile-ups (templated docs
    all hashing to one value) would still be quadratic, so buckets
    above ``max_bucket`` short-circuit to star candidates via
    :func:`banded_candidate_pairs`."""
    # persist: the signature is a 64-aggregate plan that the band
    # self-join would otherwise evaluate once per join side
    sh = _persist_now(simhash(docs))
    band_structs = ", ".join(
        f"struct({bd} AS band, shiftright({w}, {sh_by}) & 65535 AS key)"
        for bd, (w, sh_by) in enumerate(
            [("sh_lo", 0), ("sh_lo", 16), ("sh_hi", 0), ("sh_hi", 16)]
        )
    )
    bands = sh.selectExpr(
        "doc_id", "sh_lo", "sh_hi",
        f"explode(array({band_structs})) AS bk",
    ).selectExpr("doc_id", "sh_lo AS lo", "sh_hi AS hi",
                 "bk.band AS band", "bk.key AS key")
    cand = banded_candidate_pairs(
        bands, "doc_id", ("band", "key"), payload_cols=("lo", "hi"),
        max_bucket=max_bucket,
        persist_bands=False,  # sh is persisted; bands is a projection
    )
    hamming = F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    ) + F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def dedup_embedding_cosine(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Near-duplicate vector pairs by exact cosine similarity.

    Brute-force pairwise over the (small) embedding table; the scale path
    for this shape is similarity.ivf_topk's bucketed variant."""
    def norm(col):
        return F.sqrt(
            F.aggregate(
                col, F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    e = embeddings.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.embedding"), F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


# Random-hyperplane LSH (Charikar sign-LSH): NUM_HYP deterministic +-1
# hyperplanes in bands of HYP_ROWS bits.  Components are +-1 derived from
# exact integer arithmetic ((A*idx+B) mod P) mod 2, so Spark and the DuckDB
# oracle compute bit-identical sign bits: x * +-1.0 is exact, and both
# engines sum the 64 products left-to-right.
NUM_HYP = 16
HYP_BANDS = 4
HYP_ROWS = NUM_HYP // HYP_BANDS
HYP_A = 1103515245
HYP_B = 12345
HYP_P = 2147483647  # prime; parity of (A*idx+B) mod P is pseudo-random


def hyperplane_sign(idx: int) -> float:
    """+-1.0 component d of hyperplane b, idx = b * dim + d."""
    return 1.0 if ((HYP_A * idx + HYP_B) % HYP_P) % 2 == 0 else -1.0


def dedup_embedding_cosine_lsh(
    embeddings: DataFrame, threshold: float = 0.35, dim: int = 64,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-duplicate vector pairs: sign-LSH bucketed candidates, exact
    cosine verified -- the 100-TB shape of :func:`dedup_embedding_cosine`.

    Candidates = pairs agreeing on all HYP_ROWS sign bits of at least one
    band (equi-join on the band key over 2^HYP_ROWS buckets per band --
    never a cross join; assert via explain()).  Recall is the standard
    sign-LSH probability (1-theta/pi per hyperplane); precision is exact
    because every candidate is verified with the true cosine.  The DuckDB
    oracle replicates the bucketing bit-for-bit, so the operator has a
    value-level hash oracle despite being probabilistic.
    """
    def norm(col):
        return F.sqrt(
            F.aggregate(
                col, F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        )

    def sign_bit(band: int, r: int):
        hyp = F.array(
            *[
                F.lit(hyperplane_sign((band * HYP_ROWS + r) * dim + d))
                for d in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(
                F.col("embedding"), hyp,
                lambda x, h: x.cast("double") * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))

    band_structs = [
        F.struct(
            F.lit(band).alias("band"),
            sum(
                sign_bit(band, r) * F.lit(2 ** r) for r in range(HYP_ROWS)
            ).alias("key"),
        )
        for band in range(HYP_BANDS)
    ]
    e = embeddings.select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    # persist: the 16 hyperplane dots per vector are interpreted
    # higher-order aggregates, evaluated once into the cache the
    # capped candidate generator's consumers share
    bands = _persist(e.select(
        "vec_id", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    ))
    cand = banded_candidate_pairs(
        bands, "vec_id", ("band", "key"), max_bucket=max_bucket,
        persist_bands=False,  # bands itself is persisted above
    )
    ea = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    eb = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("emb_a"), F.col("emb_b"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a", "id_b",
            F.round(dot / (F.col("nrm_a") * F.col("nrm_b")), 6)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def dup_components(
    pairs: DataFrame,
    id_cols: tuple[str, str] = ("id_a", "id_b"),
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs: every document gets
    the MINIMUM doc id reachable through the pair graph as its component
    id -- the clustering stage that turns pairwise dedup output into
    keep-one groups.

    Iterative min-label propagation (the standard scale-out CC shape, cf.
    Kiveris et al. "Connected Components in MapReduce"): each round joins
    current labels across the symmetric edge list and takes the min of
    (own label, neighbors' labels); a scalar convergence check per round
    (sum of labels -- monotonically decreasing, so equal sum == fixpoint)
    keeps driver traffic to one number.  Rounds needed = graph diameter;
    duplicate clusters are near-cliques, so 2-3 in practice.  Each round
    is two map-side-combinable shuffles -- no collect of nodes or edges.
    """
    a, b = id_cols
    edges = pairs.select(
        F.col(a).alias("u"), F.col(b).alias("v")
    ).unionByName(
        pairs.select(F.col(b).alias("u"), F.col(a).alias("v"))
    ).distinct()
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lab")
    ).persist()
    labels.count()
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["v"] == labels["node"])
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("lab").alias("nlab"))
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("nlab"), F.col("lab"))
                ).alias("lab"),
            )
            .persist()
        )
        cur_sum = new_labels.agg(F.sum("lab")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    out = labels.select("node", F.col("lab").alias("component"))
    _PERSISTED.append(labels)
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_hits: int = 2,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least ``min_hits`` distinct word ``k``-gram shingles with ANY
    document of the ``benchmark`` corpus -- the standard guard against
    test-set leakage into training data (published practice hashes
    13-grams; ``k`` is a parameter because corpora differ).

    Returns one row per contaminated document:
    ``(doc_id, n_hits, n_shingles, hit_bp)`` where ``n_hits`` is the
    count of distinct shingles shared with the benchmark, ``n_shingles``
    the document's distinct-shingle total, and ``hit_bp`` the integer
    contamination fraction in basis points (``10000 * n_hits //
    n_shingles`` -- integer math so both engines agree bit-for-bit).

    100-TB shape: the benchmark side is reduced to its DISTINCT shingle
    hash set (benchmark suites are tiny next to a training corpus) and
    broadcast, so the corpus is exploded to shingles ONCE and touched by
    one broadcast left join plus ONE multi-distinct aggregation that
    computes ``n_shingles`` and ``n_hits`` together -- no shuffle keyed
    on shingles, no skew from stop-shingles (the benchmark set is
    distinct, so each corpus shingle row matches at most once).  (The
    earlier two-aggregation form -- separate ``sizes`` and ``hits``
    passes -- exploded the corpus twice and paid two exchanges; the
    fused multi-distinct agg measured 12.4 -> 9.0 s steady-state at the
    1M-doc bench shape, identical rows.)  Set
    ``broadcast_benchmark=False`` for a benchmark too large to
    broadcast; the join falls back to a shuffled equi-join on the
    32-bit hash.
    """
    corpus = exploded_shingles(docs, k).select(
        "doc_id", hash32(F.col("sh")).alias("h")
    )
    bench = (
        exploded_shingles(benchmark, k)
        .select(hash32(F.col("sh")).alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    agg = (
        corpus.join(bench, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("h").alias("n_shingles"),
            F.count_distinct(
                F.when(F.col("__hit") == 1, F.col("h"))
            ).alias("n_hits"),
        )
    )
    return (
        agg.filter(F.col("n_hits") >= min_hits)
        .select(
            "doc_id",
            "n_hits",
            "n_shingles",
            F.expr("(10000 * n_hits) DIV n_shingles").alias("hit_bp"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    num_clusters: int = 8,
    threshold: float = 0.95,
    iterations: int = 2,
) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-shaped (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then compare
    vectors ONLY within their cluster -- candidate generation is an
    equi-join on the cluster id, so the pair count is bounded by the
    largest cluster, never n^2.

    Returns ``(id_a, id_b, cosine)`` pairs with ``cosine >= threshold``
    and ``id_a < id_b``, plus each pair's shared ``cluster`` id.

    100-TB shape: centroids train distributively (``kmeans_centroids`` --
    per-iteration narrow literal-centroid assignment + positional-mean
    agg), the assignment pass is a zero-exchange map-only scan, and the
    within-cluster self-join shuffles on ``cent_id`` (tune
    ``num_clusters`` so clusters fit a task; SemDeDup used 100k clusters
    for LAION-scale data).  Exact cosine inside the cluster keeps
    precision 1.0; recall misses only pairs split across clusters
    (the paper's accepted trade-off).
    """
    from .similarity import _dot, _norm, assign_centroids, kmeans_centroids

    cents = kmeans_centroids(
        embeddings, num_centroids=num_clusters, iterations=iterations
    )
    assigned = assign_centroids(embeddings, cents).select(
        "cent_id", "vec_id", "embedding"
    )
    e = assigned.select(
        "cent_id", "vec_id", "embedding",
        _norm(F.col("embedding")).alias("nrm"),
    )
    a, b = e.alias("a"), e.alias("b")
    dot = _dot(F.col("a.embedding"), F.col("b.embedding"))
    pairs = a.join(
        b,
        (F.col("a.cent_id") == F.col("b.cent_id"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.cent_id").alias("cluster"),
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.round(dot / (F.col("a.nrm") * F.col("b.nrm")), 6).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def dedup_paragraph(
    docs: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level exact dedup (the C4 / Dolma scrub shape): split
    every document on ``sep``, keep only the globally FIRST occurrence
    of each distinct non-blank paragraph (first = lowest
    ``(doc_id, position)``), and reassemble each document from its
    surviving paragraphs in original order.

    Returns one row per document that has at least one non-blank
    paragraph (documents that are empty or all-blank produce no row --
    the pipeline drops them before dedup anyway):
    ``(doc_id, n_para, n_kept, clean_hash)`` where ``clean_hash`` is
    the md5 of the surviving paragraphs joined by the LITERAL ``sep``
    text (exact for plain separators like ``"\\n"``; for a regex
    ``sep`` the hash is still a stable fingerprint of the survivor
    sequence, not reconstructable text), NULL when every paragraph was
    a duplicate.  Note ``sep`` is a REGEX on the split side.

    100-TB shape: the split is a narrow ``posexplode``; the
    first-occurrence table is ONE map-side-combinable
    ``groupBy(para_hash).agg(min(struct(doc_id, pos)))`` -- partial
    aggregation absorbs boilerplate-paragraph skew where a window
    ``row_number`` would sort every copy of a hot paragraph in one
    task; survivors come back via an equi-join on the hash (AQE
    skew-join splits any residual hot key) and the reassembly is one
    ``groupBy(doc_id)``.  No windows, no cross joins; 3 exchanges
    total, each on a natural key.
    """
    paras = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col(text_col), sep))
            .alias("pos", "para"),
        )
        .filter(F.length(F.trim(F.col("para"))) > 0)
        .select("doc_id", "pos", "para",
                F.md5(F.col("para")).alias("ph"))
    )
    first = paras.groupBy("ph").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    kept = paras.join(first, "ph").select(
        "doc_id", "pos", "para",
        (
            (F.col("first.doc_id") == F.col("doc_id"))
            & (F.col("first.pos") == F.col("pos"))
        ).alias("keep"),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_para"),
            F.sum(F.col("keep").cast("bigint")).alias("n_kept"),
            F.md5(
                F.concat_ws(
                    sep,
                    # collect_list drops the NULLs of the
                    # otherwise-less when(); array_sort restores
                    # document order (pos is unique per doc)
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep"),
                                F.struct("pos", "para"),
                            )
                        )
                    ).getField("para"),
                )
            ).alias("clean_hash"),
        )
        .select(
            "doc_id",
            F.col("n_para").cast("bigint").alias("n_para"),
            "n_kept",
            F.when(F.col("n_kept") > 0, F.col("clean_hash"))
            .alias("clean_hash"),
        )
    )


def dedup_substring_spans(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring dedup spans (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499):
    find every k-token window that occurs more than once in the corpus
    and return, per document, the merged token spans covered by
    NON-FIRST occurrences -- the text to cut, keeping exactly one copy
    (the globally first by ``(doc_id, pos)``) of every duplicated
    passage.  The reference implementation builds a suffix array; at
    Spark scale the k-gram hash join reaches the same spans for
    fixed-width windows without any global ordering structure.

    Returns ``(doc_id, span_start, span_end)`` -- token positions,
    end-exclusive, non-overlapping within each document (row ORDER is
    not guaranteed -- sort by ``span_start`` when applying cuts).
    SELF-OVERLAPPING repeats inside one document (e.g. a run
    "a a a a", k=2) clamp their cut start past the kept first window,
    so degenerate runs always retain one full intact copy of the
    duplicated k-window.

    100-TB shape: k-grams are generated ARRAY-SIDE (one ``transform``
    over the token array -- a narrow projection, no explode of k x
    corpus rows); the occurrence table is one map-side-combinable
    ``groupBy(gram_hash)``; survivors come back via an equi-join (AQE
    splits hot boilerplate grams); span merging is a window bounded by
    a single document's length.  No cross joins, no global sort.
    """
    if k < 2:
        raise ValueError("k must be >= 2 tokens")
    from pyspark.sql.window import Window

    from .text import tokens_col

    toks = F.filter(
        tokens_col(F.col(text_col)), lambda t: t != F.lit("")
    )
    # filter BEFORE building grams: sequence(0, n-k) with n < k would
    # otherwise generate a DESCENDING range; the gram string joins
    # tokens with " " (tokens are whitespace-split, so a space can
    # never occur INSIDE one -- a control-char separator could, and
    # would let different windows collide); k element_at lookups keep
    # the whole projection in codegen (the exploded_shingles pattern,
    # measured ~6x the transform+slice lambda)
    base = docs.select("doc_id", toks.alias("toks")) \
        .withColumn("n", F.size("toks")).filter(F.col("n") >= k)
    idx = base.select(
        "doc_id", "toks",
        F.explode(F.sequence(F.lit(0), F.col("n") - k)).alias("pos"),
    )
    occ = idx.select(
        "doc_id", "pos",
        F.md5(F.concat_ws(
            " ", *[F.element_at("toks", F.col("pos") + 1 + r)
                   for r in range(k)]
        )).alias("gh"),
    )
    occ = _persist(occ)  # both sides of the firsts join read it
    firsts = occ.groupBy("gh").agg(
        F.min(F.struct("doc_id", "pos")).alias("first"),
        F.count(F.lit(1)).alias("cnt"),
    ).filter(F.col("cnt") > 1)
    cuts = occ.join(firsts, "gh").filter(
        ~(
            (F.col("first.doc_id") == F.col("doc_id"))
            & (F.col("first.pos") == F.col("pos"))
        )
    ).select(
        "doc_id",
        # self-overlap guard: an occurrence that overlaps the kept
        # first window IN THE SAME document (degenerate runs like
        # "a a a a" at k=2, where windows at pos 1..n-k all repeat
        # window 0) starts its cut AFTER that window, so the kept
        # first copy survives intact.  first.pos <= pos within the
        # same doc (min-struct), so the clamped start stays < end.
        F.when(
            (F.col("first.doc_id") == F.col("doc_id"))
            & (F.col("pos") < F.col("first.pos") + k),
            F.col("first.pos") + k,
        ).otherwise(F.col("pos")).alias("pos"),
        (F.col("pos") + k).alias("end"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    marked = cuts.withColumn(
        "brk",
        (F.col("pos") > F.coalesce(prev_max, F.lit(-1)))
        .cast("int"),
    ).withColumn(
        "grp",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        marked.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("span_start"),
            F.col("span_end").cast("bigint").alias("span_end"),
        )
    )
