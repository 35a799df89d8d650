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
