"""Similarity search over an embedding column (array<float>):
brute-force cosine top-k as the correctness baseline, and a
sign-random-projection LSH-bucketed variant as the scale path.

Scale design: brute-force is O(Q×N) — fine when Q is small (the query
set is broadcast), unusable for all-pairs. The LSH path buckets vectors
by the sign pattern of P random hyperplane projections (map-side, no
shuffle), then ranks only within buckets — N²/2^P expected pair work,
and the bucket join shuffles bucket keys, not vectors. Hyperplanes are
deterministic (seeded, rounded literals) so the DuckDB oracle can embed
the identical matrix. All arithmetic is double-precision ordered folds
(F.aggregate ≡ list_reduce-style left fold) for cross-engine stability.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F


def hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes, rounded to 6 decimals so both
    the Spark literal and the SQL-text literal parse to identical
    doubles."""
    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in row]
            for row in rng.standard_normal((n_planes, dim))]


def _vec_double(col: str = "embedding") -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force cosine top-k: for each query vector (vec_id <
    n_queries), the k nearest corpus vectors (excluding itself):
    (query_id, neighbor_id, rank). The query side is tiny ⇒ broadcast
    nested loop; rank ties break on neighbor_id for determinism."""
    base = emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                      _vec_double().alias("v")) \
              .withColumn("nrm", _norm(F.col("v")))
    q = base.filter(F.col("vec_id") < n_queries) \
            .select(F.col("vec_id").alias("query_id"),
                    F.col("v").alias("qv"), F.col("nrm").alias("qn"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = (base.crossJoin(F.broadcast(q))
              .filter(F.col("vec_id") != F.col("query_id"))
              .select("query_id", F.col("vec_id").alias("neighbor_id"),
                      cos.alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")))


def lsh_buckets(emb: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Sign-random-projection bucket id per vector: (vec_id, bucket).
    bucket = Σ_j 2^j · [plane_j · v > 0] — map-side only."""
    v = _vec_double()
    bucket = None
    for j, plane in enumerate(planes):
        lit = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(lit, v) > 0, F.lit(1 << j).cast("long")) \
               .otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                      bucket.alias("bucket"))


def ivf_topk(emb: DataFrame, n_cells: int = 8, k: int = 3,
             n_probe: int = 1, seed: int = 17) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer assigns each
    vector to its nearest centroid cell; queries rank candidates within
    their ``n_probe`` nearest cells — the classic
    N²→N²·(n_probe/n_cells) reduction. Each query explodes to its
    n_probe nearest centroids (broadcast crossJoin against the tiny
    centroid table, rank by squared distance), then probes candidates
    cell-by-cell; candidate cells are disjoint so no pair dedup is
    needed. Deterministic given the seed and input partitioning.
    Returns (vec_id, neighbor_id, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                      _vec_double().alias("v")) \
              .withColumn("nrm", _norm(F.col("v"))) \
              .withColumn("features", array_to_vector(F.col("v")))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(feat)
    base = model.transform(feat).select("vec_id", "v", "nrm", "cell") \
                .repartition("cell")  # materialize v/nrm below the join
    # query side: explode each vector to its n_probe nearest cells
    # (rank 1 is its own cell — n_probe=1 degenerates to cell-local)
    centers = [[float(x) for x in c] for c in model.clusterCenters()]
    cdf = emb.sparkSession.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "cell long, cvec array<double>")
    d2 = F.aggregate(F.zip_with(F.col("v"), F.col("cvec"),
                                lambda x, y: (x - y) * (x - y)),
                     F.lit(0.0), lambda acc, x: acc + x)
    cw = Window.partitionBy("vec_id").orderBy("d2", "cell")
    probe = (feat.select("vec_id", "v", "nrm")
             .crossJoin(F.broadcast(cdf))
             .withColumn("d2", d2)
             .withColumn("crank", F.row_number().over(cw))
             .filter(F.col("crank") <= n_probe)
             .select("vec_id", "v", "nrm", "cell")
             .repartition("cell"))
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (probe.alias("a").join(base.alias("b"), "cell")
             .filter(F.col("a.vec_id") != F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_id"),
                     F.col("b.vec_id").alias("neighbor_id"), cos.alias("cos")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank")))


def cap_buckets(df: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop rows in groups larger than ``max_bucket`` — the hard skew
    bound every LSH self-join needs: one boilerplate-heavy bucket is an
    O(n²) straggler task at corpus scale. max_bucket<=0 disables.
    (Mirrors dedup.minhash_lsh_pairs; dropped groups are countable by
    the caller from the uncapped bucket table.)"""
    if max_bucket <= 0:
        return df
    w = Window.partitionBy(*keys)
    return (df.withColumn("_bucket_n", F.count("*").over(w))
            .filter(F.col("_bucket_n") <= max_bucket)
            .drop("_bucket_n"))


def lsh_topk(emb: DataFrame, planes: list[list[float]], k: int = 3,
             max_bucket: int = 1024) -> DataFrame:
    """Approximate top-k within LSH buckets: (vec_id, neighbor_id, rank).
    Same ranking as cosine_topk but candidates restricted to the bucket —
    the N²→N²/2^P reduction that makes ANN feasible at corpus scale.

    Scale notes: use ≥16 planes in production so the bucket key space
    (2^P) exceeds the target parallelism — 4 planes caps the self-join
    at 16 tasks; ``max_bucket`` bounds the worst bucket's quadratic work
    (vectors in oversized buckets are dropped from both sides, same
    trade as minhash_lsh_pairs)."""
    base = (emb.select(F.col("vec_id").cast("long").alias("vec_id"),
                       _vec_double().alias("v"))
            .withColumn("nrm", _norm(F.col("v")))
            .join(lsh_buckets(emb, planes), "vec_id"))
    base = (cap_buckets(base, ["bucket"], max_bucket)
            .repartition("bucket"))  # materialize v/nrm below the join
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    pairs = (base.alias("a").join(base.alias("b"), "bucket")
             .filter(F.col("a.vec_id") != F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("vec_id"),
                     F.col("b.vec_id").alias("neighbor_id"), cos.alias("cos")))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.col("neighbor_id"))
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("vec_id", "neighbor_id", F.col("rank").cast("long").alias("rank")))
