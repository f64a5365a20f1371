"""JDBC write-back round trip against embedded Derby (ships with Spark).

Same strategy as the reference's H2 integration tests (reference:
omod/src/test/java/org/openmrs/module/mambaetl/MambaTest.java:34-41): an
in-process JDBC engine stands in for the MySQL analysis DB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.sources.jdbc import JdbcSink


def _sink(name: str) -> JdbcSink:
    return JdbcSink(url=f"jdbc:derby:memory:{name};create=true", batch_size=500)


def test_jdbc_write_read_roundtrip(spark):
    sink = _sink("rt")
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 7).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id")).alias("label"),
    )
    sink.write(df, "analysis_tbl", num_partitions=4)
    back = sink.read_back(spark, "analysis_tbl")
    assert back.count() == 100
    want = {tuple(r) for r in df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == want


def test_jdbc_overwrite_replaces(spark):
    sink = _sink("ow")
    spark.range(10).write  # noqa: B018 — builder no-op, clarity only
    sink.write(spark.range(10).toDF("id"), "t_ow")
    sink.write(spark.range(3).toDF("id"), "t_ow", mode="overwrite")
    assert sink.read_back(spark, "t_ow").count() == 3


def test_jdbc_append(spark):
    sink = _sink("ap")
    sink.write(spark.range(5).toDF("id"), "t_ap")
    sink.write(spark.range(5, 8).toDF("id"), "t_ap", mode="append")
    assert sink.read_back(spark, "t_ap").count() == 8


def test_jdbc_write_caps_connections(spark):
    # 32 input partitions must narrow to <= num_partitions on the write
    # path (one JDBC connection per partition).
    sink = _sink("cc")
    df = spark.range(0, 1000, 1, 32).toDF("id")
    sink.write(df, "t_cc", num_partitions=4)
    assert sink.read_back(spark, "t_cc").count() == 1000


def test_jdbc_column_groups_split_and_lossless(spark):
    sink = _sink("cg")
    wide = spark.range(20).select(
        F.col("id").alias("user_id"),
        *[(F.col("id") * (i + 1)).alias(f"c{i}") for i in range(7)],
    )
    names = sink.write_column_groups(
        wide, "mamba_flat", "user_id", max_columns=3
    )
    assert names == ["mamba_flat_1", "mamba_flat_2", "mamba_flat_3"]
    # re-join on the entity key is lossless vs the unsplit wide table
    out = sink.read_back(spark, names[0])
    for n in names[1:]:
        out = out.join(sink.read_back(spark, n), "user_id")
    out = out.select(*wide.columns)
    assert {tuple(r) for r in out.collect()} == {
        tuple(r) for r in wide.collect()
    }


def test_jdbc_column_groups_no_split_below_cap(spark):
    sink = _sink("cg2")
    df = spark.range(5).select(F.col("id").alias("user_id"), F.col("id").alias("v"))
    assert sink.write_column_groups(df, "flat_small", "user_id") == ["flat_small"]


def test_jdbc_flatten_export_path(spark):
    """End-to-end: EAV flatten → width-capped JDBC export → re-join equals
    the flat table (the reference's MySQL handoff, README.md:125,130-131)."""
    from openmrs_module_mamba_etl_spark.operators.flatten import (
        FlattenSpec,
        flatten,
    )

    spec = FlattenSpec(
        entity_col="eid", attr_col="concept", value_col="value", order_col="ts"
    )
    obs = spark.createDataFrame(
        [
            (1, "weight", "60", 1),
            (1, "height", "170", 1),
            (1, "pulse", "70", 1),
            (1, "temp", "37", 1),
            (2, "weight", "80", 1),
        ],
        "eid long, concept string, value string, ts long",
    )
    wide = flatten(obs, spec)
    sink = _sink("fl")
    names = sink.write_column_groups(wide, "mamba_flat_enc", "eid", max_columns=2)
    assert len(names) == 2
    out = sink.read_back(spark, names[0]).join(
        sink.read_back(spark, names[1]), "eid"
    ).select(*wide.columns)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in wide.collect()}
