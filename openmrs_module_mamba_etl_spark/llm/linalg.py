"""Distributed linear algebra over embedding columns: covariance + PCA.

The 100 TB shape for second-order statistics is ONE pass of map-side
partial aggregation: every task accumulates its local Σ xᵢxⱼ / Σ xᵢ and
only the dim² (+dim) accumulator cells shuffle — never vectors. The dim×dim
result is driver-sized by construction (a 1024-dim embedding is an 8 MB
matrix), so the eigendecomposition is a numpy call with zero further Spark
jobs, and the projection back over the corpus is a map-only literal-matrix
expression. This mirrors how Spark MLlib's RowMatrix computes PCA, built
here from plain DataFrame ops so the moment pass is oracle-replayable.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F


def covariance_long(
    df: DataFrame, id_col: str, vec_col: str, dim: int
) -> DataFrame:
    """Corpus covariance matrix in long form ``(i, j, cov)`` (1-based).

    cov(i,j) = E[xᵢxⱼ] − E[xᵢ]E[xⱼ]: the product stream explodes to
    (i, j, xᵢ·xⱼ) rows whose hash aggregate is map-side-combinable, so the
    exchange carries ≤ dim² rows per input partition regardless of corpus
    size; the dim-row mean vector broadcasts back into the final select.
    An Arrow ``mapInPandas`` kernel computing per-batch ``XᵀX`` is the
    same plan with a faster inner loop — the explode form stays the
    default because whole-stage codegen already keeps it JVM-side and
    DuckDB can replay it exactly.
    """
    idx = F.sequence(F.lit(1), F.lit(dim))
    vec = F.col(vec_col)
    pairs = F.flatten(
        F.transform(
            idx,
            lambda i: F.transform(
                idx,
                lambda j: F.struct(
                    i.alias("i"),
                    j.alias("j"),
                    (
                        F.element_at(vec, i).cast("double")
                        * F.element_at(vec, j).cast("double")
                    ).alias("p"),
                ),
            ),
        )
    )
    ex = df.select(F.explode(pairs).alias("x")).select("x.i", "x.j", "x.p")
    moments = ex.groupBy("i", "j").agg(F.avg("p").alias("e2"))

    means = (
        df.select(F.posexplode(vec).alias("pos", "v"))
        .groupBy((F.col("pos") + 1).alias("i"))
        .agg(F.avg(F.col("v").cast("double")).alias("mu"))
    )
    ma = means.select(F.col("i"), F.col("mu").alias("mu_i"))
    mb = means.select(F.col("i").alias("j"), F.col("mu").alias("mu_j"))
    return (
        moments.join(F.broadcast(ma), "i")
        .join(F.broadcast(mb), "j")
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE negative zero (−0 + 0 = +0): a cell
            # rounding to -0.0 in one engine and 0.0 in the other would
            # hash-mismatch on the sign alone (mirrored in the oracle)
            (
                F.round(F.col("e2") - F.col("mu_i") * F.col("mu_j"), 6)
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def pca_components(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (mean[dim], components[k, dim], explained_variance[k]).

    The covariance collect is dim² cells — driver-bounded by the embedding
    width, not the corpus; eigendecomposition is one numpy ``eigh``.
    Component SIGN is canonicalized (largest-|loading| element positive,
    ties to the lowest index) so the decomposition is deterministic across
    platforms up to eigenvalue degeneracy.
    """
    rows = covariance_long(df, id_col, vec_col, dim).collect()
    C = np.zeros((dim, dim))
    for r in rows:
        C[r["i"] - 1, r["j"] - 1] = r["cov"]
    # symmetrize: (i,j)/(j,i) were rounded independently
    C = (C + C.T) / 2.0
    mu_rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("mu"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in mu_rows:
        mean[r["pos"]] = r["mu"]
    w, V = np.linalg.eigh(C)  # ascending eigenvalues
    order = np.argsort(-w)[:k]
    comps = V[:, order].T  # (k, dim)
    for c in comps:
        pivot = np.argmax(np.abs(np.round(c, 12)))
        if c[pivot] < 0:
            c *= -1.0
    return mean, comps, w[order]


def pca_project(
    df: DataFrame, id_col: str, vec_col: str, dim: int, k: int = 4
) -> DataFrame:
    """Project every vector onto the top-``k`` principal components:
    ``(id, pc1..pck)``. The (mean, components) matrices embed as literals,
    so the projection is a map-only codegen pass — no shuffle, no Python,
    scan-bounded at any corpus size."""
    mean, comps, _ = pca_components(df, id_col, vec_col, dim, k)
    vec = F.col(vec_col)
    cols = []
    for c in range(k):
        lit_comp = F.array(*[F.lit(float(x)) for x in comps[c]])
        lit_mean = F.array(*[F.lit(float(x)) for x in mean])
        centered = F.zip_with(vec, lit_mean, lambda x, m: x.cast("double") - m)
        proj = F.aggregate(
            F.zip_with(centered, lit_comp, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(F.round(proj, 6).alias(f"pc{c + 1}"))
    return df.select(F.col(id_col), *cols)
