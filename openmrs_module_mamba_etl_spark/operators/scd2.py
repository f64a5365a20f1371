"""Type-2 slowly-changing-dimension maintenance.

The reference's ETL rebuilds dimension tables destructively each run
(`api/src/main/resources/mamba/mamba_main.sql` drops + re-creates dims);
a warehouse at scale instead keeps dimension HISTORY — one row per
(key, attribute-state interval) with ``valid_from`` / ``valid_to`` /
``is_current``. Two entry points:

- :func:`scd2_from_history` — batch backfill: collapse an event history
  into validity intervals (change suppression + LEAD). One window shuffle
  per step, both over the same (key, time) partitioning, so Catalyst
  reuses a single sort+exchange.
- :func:`scd2_apply` — incremental: merge an update batch into the
  current SCD2 table (close changed rows, append new versions). Pure
  DataFrame ops over a key-hash shuffle; the history partition of the
  table is untouched input → at scale, write only the ``is_current``
  partition (partitionBy(is_current)) and this op rewrites a small file
  set, not the history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_from_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse an attribute-observation history into SCD2 intervals.

    Consecutive equal observations are suppressed (no zero-length
    versions); each surviving change opens an interval closed by the next
    change's timestamp (``valid_to`` NULL = current). Ordering ties are
    broken on ``tiebreak_col`` so the result is deterministic under
    arbitrary row order.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    changed = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_first", F.lag(ts_col).over(w).isNull())
        # null-SAFE inequality: a transition to or from a NULL attribute is
        # a real change (plain != would be NULL there and drop it)
        .where(F.col("_first") | ~F.col(attr_col).eqNullSafe(F.col("_prev")))
        .drop("_first")
    )
    # Same partitioning + ordering as `w` — one exchange serves both windows.
    return changed.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    attr_col: str,
    effective_col: str,
) -> DataFrame:
    """Merge one update batch into an SCD2 table.

    ``updates`` carries at most one row per key (pre-aggregate upstream —
    latest wins). For each updated key whose attribute actually changed:
    the open row closes at the update's effective time and a new open row
    is appended. Unchanged keys and already-closed history pass through
    untouched. Equivalent to the MERGE-then-INSERT two-statement SCD2
    idiom, expressed as one left join + union.
    """
    upd = updates.select(
        F.col(key_col).alias("_k"),
        F.col(attr_col).alias("_new_attr"),
        F.col(effective_col).alias("_eff"),
    )
    joined = current.join(upd, current[key_col] == F.col("_k"), "left")
    # null-SAFE inequality: an update that CLEARS the attribute (NULL)
    # must still close the open row — plain != evaluates to NULL there
    # and the change would be silently ignored.
    is_hit = (
        F.col("_k").isNotNull()
        & F.col("is_current")
        & ~F.col(attr_col).eqNullSafe(F.col("_new_attr"))
    )
    closed = joined.select(
        key_col,
        attr_col,
        "valid_from",
        F.when(is_hit, F.col("_eff")).otherwise(F.col("valid_to")).alias(
            "valid_to"
        ),
        F.when(is_hit, F.lit(False)).otherwise(F.col("is_current")).alias(
            "is_current"
        ),
    )
    opened = (
        joined.where(is_hit)
        .select(
            F.col(key_col),
            F.col("_new_attr").alias(attr_col),
            F.col("_eff").alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    # Brand-new keys (no current row at all) enter as open versions too.
    new_keys = (
        upd.join(current, upd["_k"] == current[key_col], "left_anti")
        .select(
            F.col("_k").alias(key_col),
            F.col("_new_attr").alias(attr_col),
            F.col("_eff").alias("valid_from"),
            F.lit(None).cast(closed.schema["valid_to"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return closed.unionByName(opened).unionByName(new_keys)
