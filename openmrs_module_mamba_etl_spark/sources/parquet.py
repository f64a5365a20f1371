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

    ``events.parquet`` carries TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; ``nanosAsLong`` reads it as int64 ns-since-epoch, which
    preserves full ordering precision (all our uses of ``ts`` are ordinal:
    latest-wins pivots, window ordering). Set at runtime so it also applies
    under externally-created sessions.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read every table; lazy (no I/O until an action runs)."""
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view so ``spark.sql`` plans over them."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
