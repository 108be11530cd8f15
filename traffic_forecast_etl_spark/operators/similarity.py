"""Similarity search over embedding columns (array<float>).

Engine extensions for training-data pipelines (no counterpart in the
reference): brute-force cosine top-k as the exact baseline, plus two
sub-linear scale paths — random-hyperplane LSH bucketing and an
IVF(-flat) coarse quantizer.

Dot products use native higher-order functions (``zip_with`` +
``aggregate``), i.e. JVM-side loops over the 64-dim arrays — no
Python, no UDF. Norms are precomputed once per side.

Scale model:
- brute-force: one pass over the corpus per query batch; queries are
  broadcast, so cost is O(|corpus| · |queries|) FLOPs with zero
  shuffle of the corpus — the right *baseline* and the right choice
  when |queries| is small.
- LSH / IVF: corpus is pre-bucketed (one shuffle, reusable across
  query batches); a query probes only its bucket(s), so per-query
  cost is O(bucket). This is the 100 TB path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def with_unit_vector(df: DataFrame, vec_col: str, out: str = "unit_vec") -> Column:
    """Normalize to unit length once, so cosine becomes a plain dot."""
    return df.withColumn(
        out,
        F.transform(F.col(vec_col), lambda v: v.cast("double") / _norm(F.col(vec_col))),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k
    nearest corpus vectors (excluding self-matches by id).

    queries are broadcast (hint) → BroadcastNestedLoopJoin: the corpus
    streams once, never shuffles. Top-k per query via window
    row_number with a deterministic (score desc, id asc) tiebreak.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv")
        )
    )
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("__cid") != F.col("__qid"))
        .withColumn(
            "cosine",
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )
    # ranking happens on the unrounded score; the rounded column is the
    # stable comparison/output form


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes (Box-Muller over
    splitmix64) — plan-time Python constants, broadcast as literals."""
    state = seed & 0xFFFFFFFFFFFFFFFF

    def nxt() -> float:
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return ((z ^ (z >> 31)) >> 11) / float(1 << 53)  # uniform [0,1)

    planes = []
    for _ in range(n_planes):
        row = []
        for _ in range((dim + 1) // 2):
            u1 = max(nxt(), 1e-12)
            u2 = nxt()
            r = math.sqrt(-2.0 * math.log(u1))
            row.append(r * math.cos(2 * math.pi * u2))
            row.append(r * math.sin(2 * math.pi * u2))
        planes.append(row[:dim])
    return planes


def lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, seed: int = 42, out: str = "lsh_bucket"
) -> DataFrame:
    """Random-hyperplane (sign) LSH bucket id: bit i = sign(v · r_i).
    Same-bucket vectors collide with prob (1 - θ/π)^n_planes — the
    standard cosine LSH. One map-only pass; bucketing is reusable
    (write the bucketed corpus once, probe many times)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(_hyperplanes(dim, n_planes, seed)):
        arr = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(F.col(vec_col), arr) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, i))
    return df.withColumn(out, bucket)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_id: str,
    query_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: bucket both sides with the same hyperplanes,
    equi-join on bucket (hash shuffle — no cross product), exact
    cosine re-rank within bucket. Recall is tunable via n_planes
    (fewer planes → bigger buckets → higher recall, more compute)."""
    cb = lsh_bucket(
        corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec_col).alias("__cv")),
        "__cv", dim, n_planes, seed,
    )
    qb = lsh_bucket(
        queries.select(F.col(query_id).alias("__qid"), F.col(vec_col).alias("__qv")),
        "__qv", dim, n_planes, seed,
    )
    scored = (
        cb.join(qb, on="lsh_bucket")
        .filter(F.col("__cid") != F.col("__qid"))
        .withColumn(
            "cosine",
            _dot(F.col("__qv"), F.col("__cv"))
            / (_norm(F.col("__qv")) * _norm(F.col("__cv"))),
        )
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col("__cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("__qid").alias(query_id),
            F.col("__cid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def ivf_assign(
    corpus: DataFrame,
    vec_col: str,
    corpus_id: str,
    n_centroids: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: KMeans centroids from a corpus sample,
    then assign every vector to its nearest centroid (one map-only
    pass; centroids are broadcast literals after fit).

    Returns (assigned_corpus[__cid, __cv, centroid_id], centroids).
    The assignment is the write-once index; a query probes nprobe
    nearest centroids and re-ranks only those inverted lists.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(corpus_id).alias("__cid"),
        F.transform(F.col(vec_col), lambda v: v.cast("double")).alias("__cv"),
    )
    train = c if sample_fraction >= 1.0 else c.sample(sample_fraction, seed)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__feat", predictionCol="centroid_id")
    model = km.fit(train.withColumn("__feat", array_to_vector("__cv")))
    assigned = model.transform(c.withColumn("__feat", array_to_vector("__cv"))).drop("__feat")
    centroids = model.clusterCenters()
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    )
    return assigned, cent_df
