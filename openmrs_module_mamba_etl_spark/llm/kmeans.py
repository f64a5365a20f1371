"""Distributed k-means training (Lloyd's algorithm), oracle-replayable.

The classic Spark shape: centroids live on the driver (k×dim doubles —
bounded), assignment is a codegen argmax over centroid literals
(``nearest_cell``), and the update is a posexplode + hash aggregate where
only (cell, dim) accumulator cells shuffle — the ``emb_centroids`` /
``emb_covariance`` contraction pattern, one corpus pass per iteration.

What makes THIS trainer exactly replayable in SQL (the usual float
obstacle is the centroid update: SUM over doubles is partition-order
dependent): components are quantized to an integer NANO grid
(``round(x·1e9)`` as int64) before summing, so every per-(cell, dim)
accumulator is an exact integer under any aggregation order, and the new
centroid is one double division ``sum_nano / (1e9 · n)``. Seeds follow the
md5-rank contract (``ivf_seed_centroids`` ordering), assignment ties break
to the lowest cell, and empty cells keep their previous centroid — every
iteration's assignments, counts, and centroids replay bit-for-bit in the
unrolled CTE oracle (same technique as the logreg / BPE / LTTB oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from openmrs_module_mamba_etl_spark.llm.ann import nearest_cell


def _nano(col):
    return F.round(col.cast("double") * 1e9).cast("long")


def kmeans_train(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
) -> tuple[list[list[float]], list[int]]:
    """→ (centroids[k][dim], member_counts[k]) after ``iters`` Lloyd steps.

    Driver cost per iteration: one k×dim accumulator collect. Corpus cost:
    one scan (assignment argmax is map-side; the update shuffles integer
    accumulator cells only, map-side combined).
    """
    from openmrs_module_mamba_etl_spark.functions.similarity import (
        portable_hash60,
    )

    seed_rows = (
        df.orderBy(
            portable_hash60(F.col(id_col).cast("string")).asc(),
            F.col(id_col).asc(),
        )
        .limit(k)
        .select(
            F.transform(F.col(vec_col), lambda x: _nano(x)).alias("nv")
        )
        .collect()
    )
    cents = [[n / 1_000_000_000.0 for n in r["nv"]] for r in seed_rows]
    if not cents:  # empty corpus: nothing to seed, no trainable state
        return [], []
    counts = [0] * k
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col).alias("_v"),
            nearest_cell(F.col(vec_col), cents).alias("cell"),
        )
        upd = (
            assigned.select(
                "cell", F.posexplode(F.col("_v")).alias("dim", "x")
            )
            .withColumn("nano", _nano(F.col("x")))
            .groupBy("cell", "dim")
            .agg(
                F.sum("nano").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        newc = [list(c) for c in cents]
        counts = [0] * k
        for r in upd.collect():
            newc[r["cell"]][r["dim"]] = r["s"] / (
                1_000_000_000.0 * r["n"]
            )
            counts[r["cell"]] = r["n"]
        cents = newc
    return cents, counts
