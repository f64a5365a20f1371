"""Window-function operators.

The reference's report surface is free-form MySQL 8 SELECT (reference:
README.md:296), which includes window functions; the flattener itself needs
the latest-per-key idiom for repeated obs (SURVEY.md §2.E).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the newest row per key group (deterministic via tiebreaks).

    One shuffle on ``keys``; Spark plans a running window with no extra
    sort when the shuffle already clusters by key. At scale prefer this to
    groupBy+join-back (one shuffle instead of two).
    """
    order = [F.col(order_col).desc()] + [
        F.col(c).desc() for c in (tiebreak or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k_per_key(
    df: DataFrame, keys: list[str], order_col: str, k: int, ascending: bool = False
) -> DataFrame:
    """Top-k rows per key (rank ≤ k)."""
    order = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w = Window.partitionBy(*keys).orderBy(order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
