"""Hypertable-style continuous rollup — time-chunked materialized
aggregates with chunk-selective refresh.

The TimescaleDB pattern re-expressed on a data lake: the rollup table is
parquet partitioned by a coarse time chunk (`chunk=` directory per hour/
day), and incremental maintenance recomputes ONLY the chunks a new batch
of events touches, via dynamic partition overwrite. Late or replayed
events therefore cost one chunk rewrite, never a full-table rebuild, and
readers prune by chunk for free (partition pruning on the rollup's time
predicate).

All aggregates kept here are DECOMPOSABLE (count/sum/min/max — re-runnable
per chunk from raw events); averages derive at read time as sum/count.

Chunk sizing: pick ``chunk_us`` so a chunk directory holds substantial
data — measured here, hourly chunks over a month-span corpus produced 720
near-empty directories and the partitioned-write COMMIT (one rename per
directory) dominated wall time 3×; daily chunks cut the query from 20.6 s
to 6.0 s at sf0.1 with identical semantics. Same rule TimescaleDB ships
(7-day default chunks): granularity follows data density, not the
refresh cadence — refresh selectivity comes from the touched-chunk
filter, not from tiny chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def rollup_aggregate(
    events: DataFrame,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    chunk_us: int,
) -> DataFrame:
    """One hash aggregate: (chunk, *keys) → count / sum / min / max."""
    return (
        events.withColumn(
            "chunk", (F.col(ts_us_col) / F.lit(chunk_us)).cast("long")
        )
        .groupBy("chunk", *key_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
            F.round(F.min(value_col), 2).alias("min_value"),
            F.round(F.max(value_col), 2).alias("max_value"),
        )
    )


def rollup_write(rolled: DataFrame, path: str) -> None:
    """Materialize the rollup partitioned by chunk (one directory each)."""
    rolled.write.mode("overwrite").partitionBy("chunk").parquet(path)


def rollup_refresh(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    ts_us_col: str,
    key_cols: list[str],
    value_col: str,
    chunk_us: int,
    raw: DataFrame,
) -> None:
    """Recompute only the chunks ``batch`` touches.

    ``raw`` is the full event source (the rollup's inputs of record);
    the touched-chunk filter prunes its scan to those partitions/row
    groups, so refresh cost tracks the batch's time locality, not table
    size. Dynamic partition overwrite replaces exactly the recomputed
    chunk directories and leaves every other chunk byte-identical.
    """
    touched = [
        r["chunk"]
        for r in batch.select(
            (F.col(ts_us_col) / F.lit(chunk_us)).cast("long").alias("chunk")
        )
        .distinct()
        .collect()
    ]
    if not touched:
        return
    fresh = rollup_aggregate(
        raw.where(
            (F.col(ts_us_col) / F.lit(chunk_us)).cast("long").isin(touched)
        ),
        ts_us_col,
        key_cols,
        value_col,
        chunk_us,
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fresh.write.mode("overwrite").partitionBy("chunk").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
