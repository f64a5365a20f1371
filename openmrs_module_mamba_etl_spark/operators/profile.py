"""Column profiling: one-pass data-quality summary of a table.

A training-data pipeline's first question about any new corpus — row
counts, null rates, distinct cardinality, numeric ranges — answered with
ONE full scan: every statistic is an aggregate expression in a single
``agg()``, so Spark computes them all in one partial+final hash aggregate
(no per-column jobs, no driver loop over columns). Distinct counts use
HyperLogLog (``approx_count_distinct``) so the pass stays mergeable and
bounded-memory at 100 TB; exact NDV would force one extra shuffle per
column.

The wide one-row result is unpivoted driver-side into one row per column —
the unpivot is over the aggregate OUTPUT (num-columns rows), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per column: count/nulls/distinct plus numeric min/max/avg.

    ``exact_distinct=True`` swaps HLL for exact ``count_distinct`` — one
    extra shuffle per column; keep it off for large tables and oracles
    that need determinism use it on.
    """
    cols = columns or df.columns
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    ndv = F.count_distinct if exact_distinct else F.approx_count_distinct

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(c).alias(f"{c}__non_null"))
        aggs.append(ndv(F.col(c)).alias(f"{c}__distinct"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max"))
            aggs.append(F.round(F.avg(c), 4).alias(f"{c}__avg"))
    wide = df.agg(*aggs)

    # Unpivot as explode(array(struct...)) so the aggregate stays ONE plan
    # node — a union of N selects over `wide` could re-execute the agg.
    entries = []
    for c in cols:
        if c in numeric:
            mn = F.col(f"{c}__min")
            mx = F.col(f"{c}__max")
            av = F.col(f"{c}__avg")
        else:
            mn = mx = av = F.lit(None).cast("double")
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__non_null").alias("n_non_null"),
                (F.col("_n") - F.col(f"{c}__non_null")).alias("n_null"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                mn.alias("min_value"),
                mx.alias("max_value"),
                av.alias("avg_value"),
            )
        )
    return wide.select(F.explode(F.array(*entries)).alias("_p")).select("_p.*")
