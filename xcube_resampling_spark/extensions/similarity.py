"""Similarity search over an embedding column (array<float>).

* ``knn_brute_force``: exact top-k cosine -- the correctness baseline.
  The query vector is broadcast (a literal array), the dot product is a
  ``zip_with``/``aggregate`` expression, top-k is a single ``ORDER BY ...
  LIMIT k`` which Spark executes as per-partition top-k + merge
  (TakeOrderedAndProject -- no full sort at scale).
* ``ivf_topk``: IVF-style bucketed ANN -- deterministic centroids, one
  nearest-centroid assignment pass, probe the closest ``nprobe`` buckets
  only.  At 100 TB the assignment is the only full scan; probing touches
  ~nprobe/C of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine_to_query(embeddings: DataFrame, query: list[float]) -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = sum(v * v for v in query) ** 0.5
    return embeddings.select(
        "vec_id",
        F.round(
            _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * qn), 6
        ).alias("cosine"),
    )


def knn_brute_force(
    embeddings: DataFrame, query: list[float], k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors of a query vector."""
    scored = cosine_to_query(embeddings, query)
    if exclude_vec_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_vec_id)
    return scored.orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    ).limit(k)


def _collect_centroids(
    centroids: DataFrame,
) -> list[tuple[int, list[float], float]]:
    """Materialize a (tiny, k-row) centroid table driver-side as
    ``(cent_id, vector, norm)`` triples.  The norm is computed with the
    same left-to-right IEEE-double summation as :func:`_norm` so literal
    and columnar scoring paths are bit-identical."""
    rows = centroids.select("vec_id", "embedding").collect()
    out: list[tuple[int, list[float], float]] = []
    for r in sorted(rows, key=lambda r: int(r.vec_id)):
        vec = [float(v) for v in r.embedding]
        acc = 0.0
        for v in vec:
            acc += v * v
        out.append((int(r.vec_id), vec, acc ** 0.5))
    return out


# above this many literal scalars (k x dim), fold the centroid table
# into an executor broadcast + one vectorized numpy argmax instead of a
# literal Catalyst expression: the literal plan is bit-identical to the
# SQL oracle but its codegen degrades past the JVM 64KB method limit
# and its analysis cost grows with k x dim.
_LITERAL_SCALAR_LIMIT = 16384


def _assign_centroids_vectorized(
    embeddings: DataFrame,
    cents: list[tuple[int, list[float], float]],
) -> DataFrame:
    """Large-k nearest-centroid assignment: still ZERO exchanges -- a
    ``mapInPandas`` scan with the (k x dim) centroid matrix broadcast to
    executors and the cosine argmax as one numpy matmul per Arrow
    batch.  Float summation order differs from the SQL path by ~1 ulp
    (pairwise vs sequential), fine for clustering; the literal path
    stays the oracle-exact one at small k."""
    import pandas as pd

    # id-ascending order makes np.argmax's first-index tie rule equal
    # the literal path's struct(cos, -id) max (lowest id wins)
    cents = sorted(cents, key=lambda c: c[0])
    ids = np.asarray([cid for cid, _, _ in cents], dtype=np.int64)
    cmat = np.asarray([vec for _, vec, _ in cents], dtype=np.float64)
    cnorm = np.asarray([cn for _, _, cn in cents], dtype=np.float64)
    bc = embeddings.sparkSession.sparkContext.broadcast(
        (ids, cmat, cnorm))
    fields = {f.name: f.dataType.simpleString()
              for f in embeddings.schema.fields}
    # match the literal path's cent_id type (F.lit of the same ids)
    cid_t = "int" if all(-2**31 <= c < 2**31 for c, _, _ in cents) \
        else "bigint"
    schema = (f"vec_id {fields['vec_id']}, cent_id {cid_t}, "
              f"embedding {fields['embedding']}")

    def assign(batches):
        ids_, cmat_, cnorm_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            emat = np.asarray(
                [np.asarray(e, dtype=np.float64)
                 for e in pdf["embedding"]])
            enorm = np.sqrt((emat * emat).sum(axis=1))
            cos = (emat @ cmat_.T) / (
                enorm[:, None] * cnorm_[None, :])
            # centroids are sorted by id ascending and np.argmax takes
            # the FIRST max, so ties resolve to the lowest cent_id --
            # the same rule as the literal path's struct(cos, -id) max
            best = np.argmax(cos, axis=1)
            yield pd.DataFrame({
                "vec_id": pdf["vec_id"],
                "cent_id": ids_[best],
                "embedding": pdf["embedding"],
            })

    return embeddings.select("vec_id", "embedding").mapInPandas(
        assign, schema)


def assign_centroids(
    embeddings: DataFrame,
    centroids: DataFrame | list[tuple[int, list[float], float]],
) -> DataFrame:
    """Assign each vector to its nearest centroid as ONE narrow
    projection -- zero exchanges at ANY k.

    The k centroids (k rows -- always driver-sized) are folded into a
    literal array-of-structs and the cosine argmax runs inside
    whole-stage codegen via ``array_max`` over ``struct(cos, -cent_id)``
    (the same literal-lookup pattern as :func:`pq_topk`'s LUT).  At
    100 TB this replaces the former crossJoin+groupBy, which shuffled
    N x k rows per pass, with a map-only scan.  Past
    ``_LITERAL_SCALAR_LIMIT`` scalars (SemDeDup-scale cluster counts)
    the same math runs as a broadcast numpy argmax inside
    ``mapInPandas`` -- still map-only, no Catalyst blowup.

    ``centroids`` may be a DataFrame (collected here; k rows) or a
    pre-collected list from :func:`_collect_centroids` (used by the
    Lloyd loop so each iteration reuses the driver-side table).
    """
    cents = (
        _collect_centroids(centroids)
        if isinstance(centroids, DataFrame)
        else list(centroids)
    )
    if cents and len(cents) * len(cents[0][1]) > _LITERAL_SCALAR_LIMIT:
        return _assign_centroids_vectorized(embeddings, cents)
    emb = F.col("embedding")
    en = _norm(emb)
    # deterministic: on cosine ties prefer the lowest centroid id
    # (struct ordering: higher cos first, then higher -cent_id)
    scored = F.array(*[
        F.struct(
            (_dot(emb, F.array(*[F.lit(v) for v in vec]))
             / (en * F.lit(cn))).alias("cos"),
            F.lit(-cid).alias("neg_id"),
            F.lit(cid).alias("cent_id"),
        )
        for cid, vec, cn in cents
    ])
    return embeddings.select(
        "vec_id",
        F.array_max(scored)["cent_id"].alias("cent_id"),
        "embedding",
    )


def kmeans_centroids(
    embeddings: DataFrame,
    num_centroids: int = 10,
    iterations: int = 3,
) -> DataFrame:
    """Lloyd's k-means over the embedding column, fully distributed:
    deterministic seeding (the ``num_centroids`` lowest vec_ids, k-means
    always converges to the same result on the same data), then per
    iteration one narrow literal-centroid assignment (zero exchanges --
    see :func:`assign_centroids`) + one map-side-combinable mean
    aggregation; the centroid table (k x dim doubles) is the only thing
    on the driver path, exactly Lloyd's algorithm at cluster scale.

    Returns (vec_id, embedding) shaped like the seed table so it drops
    into :func:`ivf_topk`'s ``centroids`` seat.
    """
    cents = _collect_centroids(
        embeddings.orderBy("vec_id").limit(num_centroids).select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    for _ in range(iterations):
        # narrow literal-centroid assignment (zero exchanges), then one
        # positional-mean agg: explode to (cent_id, pos, v) and average
        # -- the single shuffle per iteration, and the partial aggs
        # combine map-side so it moves only k x dim rows per partition.
        assigned = assign_centroids(embeddings, cents)
        comps = assigned.select(
            "cent_id", F.posexplode(F.col("embedding")).alias("pos", "v")
        ).groupBy("cent_id", "pos").agg(
            F.avg(F.col("v").cast("double")).alias("m")
        ).collect()  # k x dim scalars -- centroids live on the driver
        means: dict[int, dict[int, float]] = {}
        for r in comps:
            means.setdefault(int(r.cent_id), {})[int(r.pos)] = float(r.m)
        nxt = []
        for cid, prev_vec, _ in cents:
            got = means.get(cid)
            if got is None:  # empty cluster keeps its previous centroid
                vec = prev_vec
            else:
                vec = [got[p] for p in sorted(got)]
            acc = 0.0
            for v in vec:
                acc += v * v
            nxt.append((cid, vec, acc ** 0.5))
        cents = nxt
    return embeddings.sparkSession.createDataFrame(
        [(cid, vec) for cid, vec, _ in cents],
        schema="vec_id bigint, embedding array<double>",
    )


def ivf_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    num_centroids: int = 10,
    nprobe: int = 2,
    exclude_vec_id: int | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed approximate top-k: centroids default to the
    embeddings of the ``num_centroids`` lowest vec_ids (deterministic,
    oracle-friendly); pass ``centroids=kmeans_centroids(...)`` for a
    trained index (tested recall, not oracle-checked -- cross-engine
    float-mean parity is not guaranteed); search probes the ``nprobe``
    centroids closest to the query."""
    if centroids is None:
        centroids = embeddings.orderBy("vec_id").limit(num_centroids)
    assigned = assign_centroids(embeddings, centroids)
    probes = (
        cosine_to_query(
            centroids.select(F.col("vec_id"), F.col("embedding")), query
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(nprobe)
        .select(F.col("vec_id").alias("cent_id"))
    )
    # fully declarative probe: broadcast semi-join, no driver collect
    bucket = assigned.join(F.broadcast(probes), "cent_id")
    scored = cosine_to_query(
        bucket.select("vec_id", "embedding"), query
    )
    if exclude_vec_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_vec_id)
    return scored.orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    ).limit(k)


def knn_within_clusters(
    embeddings: DataFrame,
    k: int = 5,
    num_centroids: int = 10,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cluster-bounded k-NN graph: each vector's top-``k`` cosine
    neighbors restricted to its own IVF cluster -- the candidate
    structure SemDeDup-style semantic dedup and k-NN-graph builders
    use instead of the quadratic all-pairs join.

    Centroids default to the embeddings of the ``num_centroids``
    lowest vec_ids (deterministic, oracle-friendly); pass
    ``centroids=kmeans_centroids(...)`` for a trained index.

    Returns ``(cent_id, vec_id, neighbor_id, cosine, rank)`` with
    ``rank <= k`` (6-dp cosine; ties break to the lowest
    neighbor_id).  Vectors alone in their cluster emit no rows.

    Scale shape: the assignment is :func:`assign_centroids`'s
    zero-exchange literal argmax; the self-join shuffles each side
    once on ``cent_id``; the per-vector top-k is a window inside the
    already-co-partitioned cluster.  Candidate count is
    sum(|cluster|^2), controlled by ``num_centroids`` -- at 100 TB
    you raise the centroid count so clusters stay bounded, exactly
    the IVF trade-off, and nothing here is all-pairs."""
    if centroids is None:
        centroids = embeddings.orderBy("vec_id").limit(num_centroids)
    assigned = assign_centroids(embeddings, centroids)
    left = assigned.select(
        "cent_id", "vec_id", F.col("embedding").alias("emb_a"))
    right = assigned.select(
        "cent_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("emb_b"),
    )
    pairs = left.join(right, "cent_id").filter(
        F.col("vec_id") != F.col("neighbor_id"))
    cosine = F.round(
        _dot(F.col("emb_a"), F.col("emb_b"))
        / (_norm(F.col("emb_a")) * _norm(F.col("emb_b"))), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        pairs.select("cent_id", "vec_id", "neighbor_id",
                     cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )


def _subvector(col: Column, sub: int, sub_dim: int) -> Column:
    """Slice one PQ subspace out of the embedding (1-based slice)."""
    return F.slice(col, sub * sub_dim + 1, sub_dim)


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    ksub: int = 16,
    iterations: int = 3,
) -> DataFrame:
    """Product-quantization codebooks (Jegou et al., TPAMI 2011): the
    vector is split into ``m`` contiguous subvectors and each subspace
    gets its own ``ksub``-entry k-means codebook, so an embedding
    compresses to ``m`` one-byte codes (e.g. 768 floats -> 8 bytes at
    m=8) -- the memory layout that makes billion-vector ANN feasible.

    Returns ``(sub, code, centroid array<double>)``.  Each subspace
    trains with the distributed Lloyd iterations of
    :func:`kmeans_centroids` over the SLICED column; the driver loop is
    over ``m`` subspaces (metadata), never over rows."""
    dim = len(embeddings.select("embedding").first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub_dim = dim // m
    books = None
    for sub in range(m):
        sliced = embeddings.select(
            "vec_id",
            _subvector(F.col("embedding").cast("array<double>"),
                       sub, sub_dim).alias("embedding"),
        )
        cents = kmeans_centroids(sliced, ksub, iterations).select(
            F.lit(sub).alias("sub"),
            F.col("vec_id").cast("int").alias("code"),
            F.col("embedding").alias("centroid"),
        )
        books = cents if books is None else books.unionByName(cents)
    # re-key codes densely 0..ksub-1 per subspace (seed vec_ids are
    # arbitrary): deterministic rank by the original id
    win = Window.partitionBy("sub").orderBy("code")
    return books.select(
        "sub",
        (F.row_number().over(win) - 1).alias("code"),
        "centroid",
    )


def pq_encode(embeddings: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Encode each vector as ``m`` codebook indices in ONE narrow
    projection -- zero shuffles.

    The codebooks are driver-sized (m x ksub rows) so each subspace's
    centroids become a literal array-of-structs and the L2 argmin runs
    inside whole-stage codegen via ``array_min`` over
    ``struct(d2, code)`` (min d2, lowest code on ties -- the same
    comparator the former min_by used).  The former implementation
    crossJoined each subspace and shuffled N x ksub rows per subspace
    plus a final N-row collect_list; this is map-only."""
    books = codebooks.collect()
    m = 1 + max(r.sub for r in books)
    sub_dim = len(books[0].centroid)
    by_sub: dict[int, list[tuple[int, list[float]]]] = {}
    for r in books:
        by_sub.setdefault(int(r.sub), []).append(
            (int(r.code), [float(v) for v in r.centroid])
        )
    ksub = max(len(v) for v in by_sub.values())
    if m * ksub * sub_dim > _LITERAL_SCALAR_LIMIT:
        # large codebooks: same math as one broadcast numpy argmin per
        # subspace inside mapInPandas -- still zero shuffles
        import pandas as pd

        books_mat = [
            (np.asarray([c for c, _ in sorted(by_sub[s])],
                        dtype=np.int32),
             np.asarray([v for _, v in sorted(by_sub[s])],
                        dtype=np.float64))
            for s in range(m)
        ]
        bc = embeddings.sparkSession.sparkContext.broadcast(books_mat)
        vt = {f.name: f.dataType.simpleString()
              for f in embeddings.schema.fields}["vec_id"]

        def encode(batches):
            mats = bc.value
            for pdf in batches:
                if not len(pdf):
                    continue
                emat = np.asarray(
                    [np.asarray(e, dtype=np.float64)
                     for e in pdf["embedding"]])
                codes = np.empty((len(pdf), len(mats)), dtype=np.int32)
                for s, (code_vals, cmat) in enumerate(mats):
                    sv = emat[:, s * sub_dim:(s + 1) * sub_dim]
                    # argmin ||x - c||^2 == argmin(-2 x.c + ||c||^2):
                    # one batch x ksub matmul, never the batch x ksub x
                    # dim broadcast temporary.  np.argmin takes the
                    # first (lowest code, rows are code-sorted) on ties
                    # like the literal path.
                    scores = (-2.0 * (sv @ cmat.T)
                              + (cmat * cmat).sum(axis=1)[None, :])
                    # emit the ACTUAL code values -- per-subspace codes
                    # need not be dense 0..k-1
                    codes[:, s] = code_vals[np.argmin(scores, axis=1)]
                yield pd.DataFrame({
                    "vec_id": pdf["vec_id"],
                    "codes": list(codes),
                })

        return embeddings.select("vec_id", "embedding").mapInPandas(
            encode, f"vec_id {vt}, codes array<int>")

    emb = F.col("embedding").cast("array<double>")
    code_cols = []
    for sub in range(m):
        sv = _subvector(emb, sub, sub_dim)
        scored = F.array(*[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        sv,
                        F.array(*[F.lit(v) for v in cent]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("d2"),
                F.lit(code).alias("code"),
            )
            for code, cent in sorted(by_sub[sub])
        ])
        code_cols.append(F.array_min(scored)["code"])
    return embeddings.select(
        "vec_id", F.array(*code_cols).alias("codes")
    )


def _adc_dist_col(codebooks: DataFrame, query: list[float]) -> Column:
    """Asymmetric-distance expression over a ``codes`` column: the
    query's squared distance to every codebook centroid becomes a tiny
    driver-side lookup table (m x ksub doubles) embedded as a LITERAL
    flat array, so scoring is one whole-stage-codegen expression --
    zero joins, zero shuffles."""
    books = sorted(
        codebooks.collect(), key=lambda r: (r.sub, r.code)
    )
    ksub = 1 + max(r.code for r in books)
    sub_dim = len(books[0].centroid)
    m = 1 + max(r.sub for r in books)
    lut = [0.0] * (m * ksub)
    for r in books:
        q_sub = query[r.sub * sub_dim:(r.sub + 1) * sub_dim]
        lut[r.sub * ksub + r.code] = float(
            sum((a - b) ** 2 for a, b in zip(q_sub, r.centroid))
        )
    lut_col = F.array(*[F.lit(v) for v in lut])
    return F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(lut_col, (i * ksub + c + 1)
                                      .cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes (see
    :func:`_adc_dist_col`); one codegen projection + a
    TakeOrderedAndProject."""
    dist = _adc_dist_col(codebooks, query)
    return codes.select(
        "vec_id", F.round(dist, 6).alias("adc_dist")
    ).orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(k)


def ivf_pq_topk(
    embeddings: DataFrame,
    query: list[float],
    k: int = 10,
    num_centroids: int = 10,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 8,
    iterations: int = 2,
    rerank: int = 0,
    centroids: DataFrame | None = None,
    codebooks: DataFrame | None = None,
    codes: DataFrame | None = None,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """IVF bucket probing composed with PQ asymmetric-distance scoring
    -- the IVFADC shape of Jegou et al. (TPAMI 2011), the production
    billion-vector ANN layout: the coarse quantizer prunes the corpus
    to ``nprobe`` buckets, the candidates are scored from their m-byte
    PQ codes (no full vectors touched), and optionally the best
    ``rerank`` candidates re-rank by exact cosine against the stored
    embeddings.

    Returns ``(vec_id, adc_dist)``, plus ``cosine`` when ``rerank > 0``
    (final order: cosine desc).

    Scale shape: centroid assignment is the shuffle-free literal argmax
    (:func:`assign_centroids`); the probe list is a broadcast semi-join;
    the codes-to-bucket equi-join is the only shuffle (in a real index
    the codes are stored WITH their cent_id, making it free -- pass a
    pre-joined ``codes`` frame carrying ``cent_id`` to skip it); ADC is
    one codegen projection; re-rank touches ``rerank`` << N vectors.
    """
    if centroids is None:
        centroids = embeddings.orderBy("vec_id").limit(num_centroids)
    if codebooks is None:
        codebooks = pq_train(
            embeddings, m=m, ksub=ksub, iterations=iterations)
    if codes is None:
        codes = pq_encode(embeddings, codebooks)
    probes = (
        cosine_to_query(
            centroids.select("vec_id", "embedding"), query
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(nprobe)
        .select(F.col("vec_id").alias("cent_id"))
    )
    if "cent_id" in codes.columns:
        bucket_codes = codes.join(F.broadcast(probes), "cent_id")
    else:
        assigned = assign_centroids(embeddings, centroids).select(
            "vec_id", "cent_id")
        bucket_ids = assigned.join(
            F.broadcast(probes), "cent_id").select("vec_id")
        bucket_codes = codes.join(bucket_ids, "vec_id")
    if exclude_vec_id is not None:
        bucket_codes = bucket_codes.filter(
            F.col("vec_id") != exclude_vec_id)
    dist = _adc_dist_col(codebooks, query)
    scored = bucket_codes.select(
        "vec_id", F.round(dist, 6).alias("adc_dist"))
    if rerank and rerank > 0:
        if rerank < k:
            raise ValueError(
                f"rerank={rerank} must be >= k={k} (it is the "
                "candidate pool the exact pass re-orders)")
        cand = scored.orderBy(
            F.col("adc_dist").asc(), F.col("vec_id").asc()
        ).limit(rerank)
        exact = cosine_to_query(
            cand.join(embeddings, "vec_id").select(
                "vec_id", "embedding"),
            query,
        )
        return (
            cand.join(exact, "vec_id")
            .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            .limit(k)
            .select("vec_id", "adc_dist", "cosine")
        )
    return scored.orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    ).limit(k)
