"""Sessionization: group per-key event streams into activity sessions.

The reference has no session concept — this is a training-data-pipeline
extension (SURVEY.md §2.I): user/event sessionization is the standard
pre-aggregation for behavioral features and for windowed dedup of
interaction logs.

Two batch formulations plus a streaming stateful carrier
(:mod:`openmrs_module_mamba_etl_spark.streaming.sessionize`):

- :func:`sessionize` — gaps-and-islands (lag + running sum). Exact,
  deterministic, ANSI-expressible → DuckDB-oracle-checkable. Two window
  passes over one (key, ts) shuffle partitioning — Catalyst reuses the
  exchange for both window specs and the final hash aggregate shares the
  key prefix, so the whole plan is ONE shuffle.
- :func:`session_window_agg` — Spark's native ``F.session_window``
  (merging session windows in a single aggregation); the same operator the
  streaming path uses with watermarks, so batch and stream share semantics.

Scale: the only shuffle key is the entity key — no timestamp in the
partitioning — so skew follows entity activity; heavy keys can be pre-split
with the salting helpers in :mod:`..operators.skew` and re-merged, because
session boundaries only depend on per-key ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: 6 hours in nanoseconds — testdata `ts` is int64 ns-since-epoch (the
#: parquet TIMESTAMP(NANOS) read via sources.parquet.table()).
DEFAULT_GAP_NS = 6 * 3600 * 1_000_000_000


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int = DEFAULT_GAP_NS,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign a per-key ``session_id`` (1-based, in time order) to each row.

    A new session starts when the gap to the previous event of the same key
    exceeds ``gap`` (same units as ``ts_col``; ns for the testdata). The
    lag and the running sum share one window partitioning, so adding the
    column costs a single (key)-hash shuffle + per-partition sort.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    is_new = F.when(prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(running))


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap: int = DEFAULT_GAP_NS,
    order_tiebreak: str | None = None,
    bounds_suffix: str = "_ns",
) -> DataFrame:
    """One row per (key, session): bounds, event count, value sum."""
    tagged = sessionize(df, key_col, ts_col, gap, order_tiebreak)
    return tagged.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias(f"session_start{bounds_suffix}"),
        F.max(ts_col).alias(f"session_end{bounds_suffix}"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )


def ns_to_ts(ts_col: str) -> Column:
    """int64 ns-since-epoch → TimestampType. Integer `div` — a double
    division would lose low bits at epoch-ns magnitudes (~1.7e18 ≫ 2^53)."""
    return F.timestamp_micros(F.expr(f"{ts_col} div 1000"))


def session_window_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    gap: str = "6 hours",
) -> DataFrame:
    """Native merging-session-window aggregate (``F.session_window``).

    Returns (key, window.start, window.end, n_events, sum_value) where
    ``end`` = last event + gap (Spark's session-window convention). Same
    one-shuffle profile as :func:`session_stats`; this is the formulation
    the streaming path reuses under a watermark.
    """
    return (
        df.withColumn("_ts", ns_to_ts(ts_col))
        .groupBy(key_col, F.session_window("_ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
