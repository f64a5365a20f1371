"""Parquet source layer for the test/bench star schema.

The reference scans MySQL source tables over JDBC (reference: pom.xml:279-280,
README.md:123); the engine's primary columnar source is Parquet — predicate
pushdown and column pruning reach the scan via Catalyst, and partition counts
follow ``spark.sql.files.maxPartitionBytes`` so a 100 TB table splits into
memory-sized tasks automatically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-generated TPC-H-ish star schema + events/doc/embedding tables
#: (TESTDATA.md). One parquet file per table under the sf dir.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table of the star schema as a DataFrame.

    ``events.ts`` has shipped under two physical parquet encodings across
    testdata generations: TIMESTAMP(NANOS) (vectorized reader rejects it;
    ``nanosAsLong`` surfaces int64 ns-since-epoch) and TIMESTAMP(MICROS)
    (surfaces as timestamp_ntz). The engine's canonical in-plan type for
    ``ts`` is **int64 ns-since-epoch**: exact integer arithmetic for
    bucketing/windowing with no sub-2^53 float hazards, and identical
    values to DuckDB's ``epoch_us(ts)*1000`` on the oracle side (session
    tz is pinned UTC). When the scan yields a timestamp we normalize with
    one codegen projection — column pruning and non-ts predicate pushdown
    are unaffected.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Engine contract: timestamp arithmetic is UTC (session.py). Pin it at
    # the source seam too so an externally-created session (the round
    # driver's) gets identical NTZ→epoch semantics on any machine tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts", "bigint") != "bigint":
        from pyspark.sql import functions as F

        from openmrs_module_mamba_etl_spark.functions.timeutil import ts_us

        df = df.withColumn("ts", ts_us(df) * F.lit(1000))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table; lazy (no I/O until an action runs)."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` plans over them."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
