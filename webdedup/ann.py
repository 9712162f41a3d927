"""Similarity search over embedding columns.

Brute-force cosine top-k as the correctness baseline (JVM-side zip_with /
aggregate — no Python in the loop) and an LSH-bucketed variant (random
hyperplane signs = SimHash-for-vectors) as the scale path: at 10^12 rows the
cross join is impossible; the bucketed variant turns it into an equi-join on
plane-sign blocks, the exact vector analogue of the text pipeline's LSH
bands.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

E4 = 10_000


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(emb: DataFrame, col: str = "embedding") -> DataFrame:
    return emb.withColumn("_norm", F.sqrt(_dot(F.col(col), F.col(col))))


def cosine_topk(emb: DataFrame, k: int = 5, col: str = "embedding") -> DataFrame:
    """(vec_id, nn_id, cos_e4, rnk) — exact brute-force cosine top-k.

    Plays the role of the reference's exact re-rank metric
    (sparseMatrix.h:232-316 cosineSimilarity) set-at-a-time. Quadratic:
    baseline/oracle only.
    """
    e = with_norm(emb, col).select(
        F.col("vec_id"), F.col(col).alias("_v"), "_norm"
    )
    l = e.select(
        F.col("vec_id").alias("vec_id"), F.col("_v").alias("va"), F.col("_norm").alias("na")
    )
    r = e.select(
        F.col("vec_id").alias("nn_id"), F.col("_v").alias("vb"), F.col("_norm").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_e4"), F.asc("nn_id"))
    return (
        l.crossJoin(r)
        .where(F.col("vec_id") != F.col("nn_id"))
        .where((F.col("na") > 0) & (F.col("nb") > 0))
        .withColumn("cos_e4", F.floor(F.lit(float(E4)) * cos).cast("long"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nn_id", "cos_e4", "rnk")
    )


def _plane_matrix(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def hyperplane_buckets(
    emb: DataFrame, dim: int, n_planes: int = 16, seed: int = 42, col: str = "embedding"
) -> DataFrame:
    """Add a random-hyperplane sign-bucket column (int) per vector.

    sign-LSH: P[same bit] = 1 - angle/pi; vectors in the same bucket of
    n_planes bits are near-neighbor candidates. Plane matrix is broadcast as
    a literal array (tiny), dot products stay JVM-side via aggregate().
    """
    planes = _plane_matrix(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in planes[:, p]])
        bit = (_dot(F.col(col), lit_plane) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return emb.withColumn("bucket", bucket)


def cosine_topk_lsh(
    emb: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates from multi-table sign-LSH buckets,
    exact cosine re-rank within candidates (the fast=False two-stage shape of
    the reference, nearestNeighbors.cpp:122-190, for vectors)."""
    tagged = []
    for t in range(n_tables):
        b = hyperplane_buckets(emb, dim, n_planes, seed=42 + t, col=col)
        tagged.append(
            b.select("vec_id", F.col(col).alias("_v"), F.lit(t).alias("table"), "bucket")
        )
    all_b = tagged[0]
    for t in tagged[1:]:
        all_b = all_b.unionByName(t)
    l, r = all_b.alias("l"), all_b.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.vec_id") != F.col("r.vec_id")),
        )
        .select(
            F.col("l.vec_id").alias("vec_id"),
            F.col("r.vec_id").alias("nn_id"),
            F.col("l._v").alias("va"),
            F.col("r._v").alias("vb"),
        )
        .dropDuplicates(["vec_id", "nn_id"])
    )
    na = F.sqrt(_dot(F.col("va"), F.col("va")))
    nb = F.sqrt(_dot(F.col("vb"), F.col("vb")))
    cos = _dot(F.col("va"), F.col("vb")) / (na * nb)
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos_e4"), F.asc("nn_id"))
    return (
        cand.withColumn("cos_e4", F.floor(F.lit(float(E4)) * cos).cast("long"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("vec_id", "nn_id", "cos_e4", "rnk")
    )
