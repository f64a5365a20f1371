"""read_back contract: empty-increment tolerance + schema-drift detection.

An explicit ``.schema()`` parquet read NULL-fills declared columns the files
don't carry, so a writer-side rename/retype would surface as wrong values.
read_back must instead raise on any declared-vs-written column-name mismatch
(round-6 ADVICE item 1) while keeping the empty-increment contract: a missing
directory or a footerless zero-row sink reads back as an empty relation.
"""

from __future__ import annotations

import pytest

from openmrs_module_mamba_etl_spark.inventory.sink_queries import read_back


def test_missing_dir_reads_back_empty(spark, tmp_path):
    out = read_back(spark, str(tmp_path / "never_written"), "a bigint, b string")
    assert out.count() == 0
    assert out.columns == ["a", "b"]


def test_matching_schema_reads_values(spark, tmp_path):
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("id AS a", "CAST(id AS STRING) AS b") \
        .write.parquet(target)
    out = read_back(spark, target, "a bigint, b string")
    assert out.count() == 3


def test_renamed_column_raises_not_nullfills(spark, tmp_path):
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("id AS a_renamed", "CAST(id AS STRING) AS b") \
        .write.parquet(target)
    with pytest.raises(ValueError, match="schema drift"):
        read_back(spark, target, "a bigint, b string")


def test_partition_column_counts_as_written(spark, tmp_path):
    # partition columns live in directory names, not footers — the drift
    # check must see them as written (sink_partitioned / sink_shards shape)
    target = str(tmp_path / "t")
    spark.range(4).selectExpr("id AS a", "CAST(id % 2 AS STRING) AS part") \
        .write.partitionBy("part").parquet(target)
    out = read_back(spark, target, "a bigint, part string")
    assert out.count() == 4


def test_case_only_rename_is_not_drift(spark, tmp_path):
    # Spark resolves columns case-insensitively by default, so a
    # case-only writer rename reads back correctly — the guard must not
    # raise a spurious drift error (round-7 ADVICE item 1)
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("id AS Person_ID", "CAST(id AS STRING) AS b") \
        .write.parquet(target)
    out = read_back(spark, target, "person_id bigint, b string")
    assert out.count() == 3


def test_same_name_retype_raises(spark, tmp_path):
    # a writer-side retype (string written, bigint declared) must raise
    # instead of reading back coerced/garbled values
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("CAST(id AS STRING) AS a", "id AS b") \
        .write.parquet(target)
    with pytest.raises(ValueError, match="written as string but declared bigint"):
        read_back(spark, target, "a bigint, b bigint")


def test_widened_retype_raises_too(spark, tmp_path):
    # even a losslessly-coercible retype (int written, bigint declared)
    # is drift: the writer's declared schema no longer matches what it
    # serialized, and the next narrowing change would corrupt silently
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("CAST(id AS INT) AS a").write.parquet(target)
    with pytest.raises(ValueError, match="schema drift"):
        read_back(spark, target, "a bigint")


def test_partition_column_type_not_footer_checked(spark, tmp_path):
    # partition-dir values re-infer as int from the directory STRINGS —
    # the dtype leg must skip them or every string-typed partition
    # column would false-positive
    target = str(tmp_path / "t")
    spark.range(4).selectExpr("id AS a", "CAST(id % 2 AS STRING) AS part") \
        .write.partitionBy("part").parquet(target)
    out = read_back(spark, target, "a bigint, part string")
    assert out.count() == 4


def test_retype_in_second_written_file_raises(spark, tmp_path):
    # the round-8 verdict's residual: a retype introduced by a LATER
    # schema-evolution batch (the A8 scenario) lives in a different part
    # file than the first-probed one — the guard must still catch it
    target = str(tmp_path / "t")
    spark.range(3).selectExpr("id AS a").write.parquet(target)
    spark.range(3).selectExpr("CAST(id AS DOUBLE) AS a") \
        .write.mode("append").parquet(target)
    with pytest.raises(ValueError, match="schema drift"):
        read_back(spark, target, "a bigint")


def test_retype_in_newest_lexically_middle_file_raises(spark, tmp_path):
    # the mtime probe leg: a retyped latest batch whose part file sorts
    # lexically BETWEEN two older clean files evades both lexical probes
    # but is the newest file on disk
    import os
    import shutil
    import time

    target = tmp_path / "t"
    target.mkdir()

    def one_file(name: str, expr: str) -> None:
        src = tmp_path / f"src_{name}"
        spark.range(3).selectExpr(expr).coalesce(1).write.parquet(str(src))
        part = next(p for p in src.iterdir() if p.name.endswith(".parquet"))
        shutil.copy(part, target / name)

    one_file("part-aaa.parquet", "id AS a")
    one_file("part-zzz.parquet", "id AS a")
    one_file("part-mmm.parquet", "CAST(id AS DOUBLE) AS a")  # the retype
    now = time.time()
    os.utime(target / "part-aaa.parquet", (now - 100, now - 100))
    os.utime(target / "part-zzz.parquet", (now - 100, now - 100))
    os.utime(target / "part-mmm.parquet", (now, now))
    with pytest.raises(ValueError, match="schema drift"):
        read_back(spark, str(target), "a bigint")
