"""Structured Streaming incremental layer: availableNow file-source ticks
with foreachBatch upsert into a parquet target, checkpointed exactly-once.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from openmrs_module_mamba_etl_spark.operators.incremental import merge_upsert
from openmrs_module_mamba_etl_spark.streaming.scheduler import (
    EtlScheduler,
    stream_incremental,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("v", StringType(), True),
    ]
)


def _write_batch(spark, src_dir: str, rows, name: str):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def test_stream_incremental_ticks(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")

    applied_batches = []

    def upsert(batch_df, batch_id):
        applied_batches.append((batch_id, batch_df.count()))
        if Path(target).exists():
            base = spark.read.parquet(target)
            merged = merge_upsert(base, batch_df, ["id"])
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(target + ".stage")
        import os
        import shutil

        if Path(target).exists():
            shutil.rmtree(target)
        os.replace(target + ".stage", target)

    _write_batch(spark, src, [(1, "a"), (2, "b")], "b1")
    q = stream_incremental(spark, src, SCHEMA, ckpt, upsert, available_now=True)
    q.awaitTermination(60)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a"),
        (2, "b"),
    }

    # tick 2: an update for id=2 and a new id=3 arrive as a new file;
    # the checkpoint must skip the already-consumed first file.
    _write_batch(spark, src, [(2, "B"), (3, "c")], "b2")
    q2 = stream_incremental(spark, src, SCHEMA, ckpt, upsert, available_now=True)
    q2.awaitTermination(60)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }
    # exactly-once per file: second tick saw only the 2 new rows
    assert applied_batches[-1][1] == 2


def test_etl_scheduler_ticks():
    seen = []
    sched = EtlScheduler(
        run_once=lambda inc: seen.append(inc),
        interval_seconds=0,
        incremental=True,
    )
    sched.run(max_ticks=3)
    # first tick full (False), later ticks incremental (True)
    assert seen == [False, True, True]
