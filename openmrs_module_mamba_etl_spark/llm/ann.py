"""Approximate-nearest-neighbor search over embedding columns.

Baseline: brute-force cosine top-k (exact; one scan + TakeOrdered — Spark
turns orderBy+limit into a per-partition top-k + driver merge, no full
sort). Scale path: hyperplane LSH bucketing — candidates restricted to the
query's bucket (± multiprobe), so a 100 TB embedding table scans only
matching buckets when the table is written bucketed/partitioned by the
signature.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from openmrs_module_mamba_etl_spark.functions.similarity import cosine


def _hyperplanes(dim: int, planes: int, seed: int) -> np.ndarray:
    """Deterministic random projection matrix (driver-side, tiny)."""
    return np.random.RandomState(seed).normal(size=(planes, dim))


def hyperplane_bucket(vec: Column, dim: int, planes: int = 12, seed: int = 42) -> Column:
    """Sign-pattern bucket id of ``vec`` under fixed random hyperplanes.

    The projection matrix is embedded as literals (planes × dim doubles —
    broadcast-sized), so bucketing is a pure JVM expression: for each plane,
    sign(dot(vec, h_p)) contributes one bit.
    """
    H = _hyperplanes(dim, planes, seed)
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        h = F.array(*[F.lit(float(x)) for x in H[p]])
        d = F.aggregate(
            F.zip_with(vec, h, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket * 2 + F.when(d >= 0, 1).otherwise(0)
    return bucket


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: scan → score → TakeOrdered(k).

    Deterministic tiebreak on id so results are stable under reordering.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    # Single-file inputs arrive as one partition; spread so the (interpreted
    # higher-order-function) scoring runs on all cores. At real scale the
    # split count already exceeds cores and this repartition is skippable —
    # but it is one round-robin shuffle of (id, vec), cheap either way.
    spread = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return (
        spread.select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    seed: int = 42,
    multiprobe_hamming: int = 1,
) -> DataFrame:
    """ANN top-k: score only vectors whose hyperplane bucket is within
    ``multiprobe_hamming`` bit flips of the query's bucket.

    With a pre-bucketed table this is a bucket-pruned scan; here the bucket
    expression is computed inline. Recall rises with multiprobe radius.
    """
    dim = len(query_vec)
    H = _hyperplanes(dim, planes, seed)
    qv = np.asarray(query_vec, dtype=float)
    qbits = [(1 if float(H[p] @ qv) >= 0 else 0) for p in range(planes)]
    qbucket = 0
    for b in qbits:
        qbucket = qbucket * 2 + b

    probe = {qbucket}
    if multiprobe_hamming >= 1:
        for p in range(planes):
            probe.add(qbucket ^ (1 << p))
    if multiprobe_hamming >= 2:
        for p in range(planes):
            for r in range(p + 1, planes):
                probe.add(qbucket ^ (1 << p) ^ (1 << r))

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    bucketed = df.withColumn(
        "_bucket", hyperplane_bucket(F.col(vec_col), dim, planes, seed)
    )
    return (
        bucketed.where(F.col("_bucket").isin(*sorted(probe)))
        .select(
            F.col(id_col),
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def knn_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact k-NN join (every left row → its k nearest right rows).

    Brute-force block-nested-loop + per-key top-k window; use only for
    moderate ``right`` sizes (broadcast right when it fits) — the scalable
    variant buckets both sides by hyperplane signature first.
    """
    from pyspark.sql import Window

    l = left.select(F.col(left_id).alias("lid"), F.col(vec_col).alias("lvec"))
    r = right.select(F.col(right_id).alias("rid"), F.col(vec_col).alias("rvec"))
    scored = l.crossJoin(F.broadcast(r)).select(
        "lid",
        "rid",
        F.round(cosine(F.col("lvec"), F.col("rvec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("lid").orderBy(F.col("cosine").desc(), F.col("rid").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
