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


def assign_centroids(
    embeddings: DataFrame, centroids: DataFrame
) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast join +
    min_by -- one scan, no shuffle of the big side beyond the groupBy)."""
    pairs = embeddings.crossJoin(
        F.broadcast(
            centroids.select(
                F.col("vec_id").alias("cent_id"),
                F.col("embedding").alias("cent"),
            )
        )
    )
    cos = _dot(F.col("embedding"), F.col("cent")) / (
        _norm(F.col("embedding")) * _norm(F.col("cent"))
    )
    scored = pairs.select("vec_id", "embedding", "cent_id",
                          cos.alias("cos"))
    return scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("cent_id", "embedding"),
            # deterministic: on cosine ties prefer the lowest centroid id
            F.struct(F.col("cos"), -F.col("cent_id")),
        ).alias("w")
    ).select(
        "vec_id",
        F.col("w.cent_id").alias("cent_id"),
        F.col("w.embedding").alias("embedding"),
    )


def kmeans_centroids(
    embeddings: DataFrame,
    num_centroids: int = 10,
    iterations: int = 3,
) -> DataFrame:
    """Lloyd's k-means over the embedding column, fully distributed:
    deterministic seeding (the ``num_centroids`` lowest vec_ids, k-means
    always converges to the same result on the same data), then per
    iteration one broadcast nearest-centroid assignment + one map-side-
    combinable mean aggregation -- no driver-side data, the centroid
    table (k x dim doubles) is the only thing on the driver path.

    Returns (vec_id, embedding) shaped like the seed table so it drops
    into :func:`ivf_topk`'s ``centroids`` seat.
    """
    cents = embeddings.orderBy("vec_id").limit(num_centroids).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    for _ in range(iterations):
        assigned = assign_centroids(embeddings, cents)
        # positional mean per centroid: explode to (cent_id, pos, v) and
        # aggregate -- one shuffle keyed by (cent_id, pos), partial aggs
        # map-side; empty clusters keep their previous centroid
        comps = assigned.select(
            "cent_id", F.posexplode(F.col("embedding")).alias("pos", "v")
        ).groupBy("cent_id", "pos").agg(
            F.avg(F.col("v").cast("double")).alias("m")
        )
        new_cents = comps.groupBy("cent_id").agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "m"))
            ).alias("pm")
        ).select(
            F.col("cent_id").alias("vec_id"),
            F.transform(F.col("pm"), lambda s: s["m"]).alias("embedding"),
        )
        cents = cents.select("vec_id").join(
            new_cents, "vec_id", "left"
        ).join(
            cents.select(F.col("vec_id"),
                         F.col("embedding").alias("prev")),
            "vec_id",
        ).select(
            "vec_id",
            F.coalesce(F.col("embedding"), F.col("prev")).alias("embedding"),
        )
    return cents


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
    """Encode each vector as ``m`` codebook indices: per subspace the
    L2-nearest centroid (broadcast codebooks + min_by, one shuffle for
    the final per-vector collect)."""
    books = codebooks.collect()
    m = 1 + max(r.sub for r in books)
    sub_dim = len(books[0].centroid)
    parts = None
    for sub in range(m):
        sv = embeddings.select(
            "vec_id",
            _subvector(F.col("embedding").cast("array<double>"),
                       sub, sub_dim).alias("sv"),
        )
        cb = F.broadcast(
            codebooks.filter(F.col("sub") == sub)
            .select("code", "centroid")
        )
        pairs = sv.crossJoin(cb)
        d2 = F.aggregate(
            F.zip_with(F.col("sv"), F.col("centroid"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        best = pairs.select(
            "vec_id", "code", d2.alias("d2")
        ).groupBy("vec_id").agg(
            F.min_by(
                F.col("code"), F.struct(F.col("d2"), F.col("code"))
            ).alias("code")
        ).select("vec_id", F.lit(sub).alias("sub"), "code")
        parts = best if parts is None else parts.unionByName(best)
    return parts.groupBy("vec_id").agg(
        F.array_sort(
            F.collect_list(F.struct("sub", "code"))
        ).alias("sc")
    ).select(
        "vec_id",
        F.transform(F.col("sc"), lambda s: s["code"]).alias("codes"),
    )


def pq_topk(
    codes: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    k: int = 10,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's distance to
    every codebook centroid becomes a tiny driver-side lookup table
    (m x ksub doubles) embedded as a LITERAL flat array, so scoring is
    one whole-stage-codegen expression over the codes column -- zero
    joins, zero shuffles before the final TakeOrderedAndProject."""
    books = sorted(
        codebooks.collect(), key=lambda r: (r.sub, r.code)
    )
    m = 1 + max(r.sub for r in books)
    ksub = 1 + max(r.code for r in books)
    sub_dim = len(books[0].centroid)
    lut = [0.0] * (m * ksub)
    for r in books:
        q_sub = query[r.sub * sub_dim:(r.sub + 1) * sub_dim]
        lut[r.sub * ksub + r.code] = float(
            sum((a - b) ** 2 for a, b in zip(q_sub, r.centroid))
        )
    lut_col = F.array(*[F.lit(v) for v in lut])
    dist = F.aggregate(
        F.transform(
            F.col("codes"),
            lambda c, i: F.element_at(lut_col, (i * ksub + c + 1)
                                      .cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return codes.select(
        "vec_id", F.round(dist, 6).alias("adc_dist")
    ).orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc()).limit(k)
