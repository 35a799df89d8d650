"""fastText-shape quality classifier (Joulin et al. 2016, "Bag of
Tricks for Efficient Text Classification", arXiv:1607.01759 -- the
model family behind CCNet / DCLM / FineWeb-Edu quality scoring).

Model shape
-----------
fastText scores a document as ``softmax(W2 . mean(E[feature]))`` over
bag-of-words + word-n-gram features hashed into ``dim`` buckets.  For
BINARY quality classification the composition ``W2 . mean(E[h])``
collapses to ``mean(w[h])`` with the per-bucket scalar
``w[h] = W2 . E[h]`` -- i.e. logistic regression on hashed features is
the exact inference-equivalent of a binary fastText model, which is
what this module implements (features: unigrams + ``word_ngrams``
n-grams, hashing trick, averaged linear score, sigmoid on top).

Cross-engine exactness
----------------------
Weights are INTEGER micro-units (1e-6): the decision margin is an
exact ``bigint`` sum, and the hard label compares
``n * bias + sum(w[h])`` to zero -- no float ever decides a label, so
the DuckDB oracle reproduces scores bit-for-bit.  The sigmoid
probability is a convenience double on top.  The feature hash is
:func:`..text.hash32` (md5-prefix), the package's cross-engine hash --
fastText's own FNV-1a would work identically but has no DuckDB
builtin twin.

Scale design
------------
* inference: ONE narrow projection -- features are an array-side
  expression, the weight table is a literal array LUT (the PQ-ADC
  pattern), so scoring is pure whole-stage codegen with zero
  exchanges.  Past ``max_literal_dim`` buckets the same math runs as
  an explode + broadcast-join + per-doc re-agg (one shuffle on
  doc_id), which is how a 2M-bucket production model would ship.
* training: full-batch gradient descent; each epoch is one map-side
  combinable ``groupBy(bucket)`` over at most ``dim`` keys plus a
  driver-side weight update -- deterministic (no sampling, no
  hogwild), linear per epoch, exactly Lloyd's-loop economics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import hash32, tokens_col

__all__ = [
    "hashed_features",
    "linear_score",
    "fasttext_train",
    "pinned_weights",
]


def _words(text: Column) -> Column:
    return F.filter(tokens_col(text), lambda t: t != F.lit(""))


def hashed_features(
    text: Column, dim: int, word_ngrams: int = 2
) -> Column:
    """Bucket ids (``array<bigint>``, values in ``[0, dim)``) of the
    fastText feature bag: unigrams plus word n-grams up to
    ``word_ngrams``, hashed with the cross-engine md5-prefix hash.
    Repeated features keep their multiplicity (bag, not set)."""
    words = _words(text)
    feats = words
    for n in range(2, word_ngrams + 1):
        size = F.size(words)
        grams = F.transform(
            F.sequence(F.lit(0), size - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + 1 + r) for r in range(n)]
            ),
        )
        grams = F.when(size >= n, grams).otherwise(
            F.array().cast("array<string>"))
        feats = F.concat(feats, grams)
    return F.transform(
        feats, lambda t: F.pmod(hash32(t), F.lit(dim)).cast("bigint")
    )


def linear_score(
    docs: DataFrame,
    weights_micro: list[int],
    bias_micro: int = 0,
    word_ngrams: int = 2,
    text_col: str = "text",
    max_literal_dim: int = 4096,
) -> DataFrame:
    """Score every document under a hashed linear model.

    ``weights_micro`` is the per-bucket weight table in integer
    micro-units (1e-6); ``dim = len(weights_micro)``.

    Returns ``(doc_id, n_feats, sum_micro, label, prob)``:
    ``sum_micro = sum(w[h])`` over the feature bag (exact bigint);
    ``label = 1`` iff ``n_feats * bias + sum_micro > 0`` (the sign of
    the averaged margin, decided in integer arithmetic); ``prob`` is
    the convenience sigmoid of the averaged margin.  Empty docs get
    ``label = (bias > 0)``, ``prob = sigmoid(bias)``.
    """
    dim = len(weights_micro)
    feats = hashed_features(F.col(text_col), dim, word_ngrams)
    n_feats = F.size(feats).cast("bigint")
    if dim <= max_literal_dim:
        lut = F.array(
            *[F.lit(int(w)).cast("bigint") for w in weights_micro])
        sum_micro = F.coalesce(
            F.aggregate(
                feats, F.lit(0).cast("bigint"),
                lambda acc, h: acc + F.element_at(
                    lut, h.cast("int") + 1),
            ),
            F.lit(0).cast("bigint"),
        )
        scored = docs.select(
            "doc_id", n_feats.alias("n_feats"),
            sum_micro.alias("sum_micro"),
        )
    else:
        spark = docs.sparkSession
        wtab = spark.createDataFrame(
            [(i, int(w)) for i, w in enumerate(weights_micro)],
            schema="h bigint, w bigint",
        )
        ex = docs.select(
            "doc_id", n_feats.alias("n_feats"),
            F.explode_outer(feats).alias("h"),
        )
        scored = (
            ex.join(F.broadcast(wtab), "h", "left")
            .groupBy("doc_id")
            .agg(
                F.first("n_feats").alias("n_feats"),
                F.coalesce(F.sum("w"), F.lit(0).cast("bigint"))
                .alias("sum_micro"),
            )
        )
    b = F.lit(int(bias_micro)).cast("bigint")
    margin_num = scored["n_feats"] * b + scored["sum_micro"]
    # averaged margin in natural units; exact bigint decides the label
    z = F.when(
        scored["n_feats"] > 0,
        (b + scored["sum_micro"] / scored["n_feats"]) / 1e6,
    ).otherwise(b / F.lit(1e6))
    label = F.when(
        scored["n_feats"] > 0, (margin_num > 0).cast("int")
    ).otherwise((b > 0).cast("int"))
    return scored.select(
        "doc_id", "n_feats", "sum_micro",
        label.alias("label"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("prob"),
    )


def fasttext_train(
    docs: DataFrame,
    label_col: str = "label",
    dim: int = 256,
    word_ngrams: int = 2,
    epochs: int = 20,
    lr: float = 2.0,
    text_col: str = "text",
) -> tuple[list[int], int]:
    """Train the binary hashed linear model with deterministic
    full-batch gradient descent (logistic loss).

    Per epoch: score every doc under the current literal weights (one
    narrow projection), explode features and aggregate the per-bucket
    gradient ``sum(residual / n_feats)`` -- a single map-side
    combinable shuffle over at most ``dim`` keys -- then update the
    (driver-sized) weight table.  No sampling, no row ordering
    dependence: the same corpus always yields the same model.

    Returns ``(weights_micro, bias_micro)`` ready for
    :func:`linear_score`.
    """
    n_docs = docs.count()
    if n_docs == 0:
        return [0] * dim, 0
    w = [0.0] * dim
    b = 0.0
    base = docs.select(
        "doc_id",
        F.col(label_col).cast("double").alias("y"),
        hashed_features(F.col(text_col), dim, word_ngrams)
        .alias("feats"),
    ).withColumn(
        "n_feats", F.greatest(F.size("feats"), F.lit(1)).cast("double")
    ).persist()
    try:
        base.count()
        for _ in range(int(epochs)):
            lut = F.array(*[F.lit(v) for v in w])
            z = F.lit(b) + F.coalesce(
                F.aggregate(
                    F.col("feats"), F.lit(0.0),
                    lambda acc, h: acc + F.element_at(
                        lut, h.cast("int") + 1),
                ),
                F.lit(0.0),
            ) / F.col("n_feats")
            resid = (
                F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
            ).alias("r")
            ex = base.select("n_feats", resid, F.explode("feats")
                             .alias("h"))
            grads = ex.groupBy("h").agg(
                F.sum(F.col("r") / F.col("n_feats")).alias("g")
            ).collect()
            gb = base.select(resid).agg(F.sum("r").alias("g")) \
                .collect()[0]["g"]
            for row in grads:
                w[int(row["h"])] -= lr * float(row["g"]) / n_docs
            b -= lr * float(gb) / n_docs
    finally:
        base.unpersist()
    return [int(round(v * 1e6)) for v in w], int(round(b * 1e6))


def pinned_weights(dim: int = 256) -> list[int]:
    """Deterministic pseudo-random weight table in micro-units --
    the corpus-independent fixture the oracle queries embed as
    literals on both engines (Knuth multiplicative sequence mapped
    into [-1e6, 1e6])."""
    return [
        ((i * 2654435761 + 1013904223) % 2000001) - 1000000
        for i in range(dim)
    ]
