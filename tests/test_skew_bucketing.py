"""Skew-mitigation + bucketing: result correctness AND plan-shape proof."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.operators.bucketing import write_bucketed
from openmrs_module_mamba_etl_spark.operators.skew import replicate_join, salted_agg


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def skewed_df(spark):
    # key 0 carries 90% of rows — the classic hot key
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in skewed_df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"])
        for r in salted_agg(
            skewed_df, ["k"], {"s": ("v", "sum"), "n": ("v", "count")}, n_salts=8
        ).collect()
    }
    assert salted == plain


def test_salted_agg_two_phase_plan(spark, skewed_df):
    p = _plan(
        salted_agg(skewed_df, ["k"], {"s": ("v", "sum")}, n_salts=8)
    )
    # two exchange rounds: (k, salt) then (k)
    tree = p.split("(1)")[0]
    assert tree.count("Exchange") == 2


def test_salted_agg_rejects_non_algebraic(spark, skewed_df):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(skewed_df, ["k"], {"a": ("v", "avg")})


def test_replicate_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [(0, "hot"), (10, "ten"), (20, "twenty")], "k long, label string"
    )
    plain = sorted(
        tuple(r)
        for r in skewed_df.join(dim, "k").select("k", "v", "label").collect()
    )
    salted = sorted(
        tuple(r)
        for r in replicate_join(skewed_df, dim, ["k"], n_salts=4)
        .select("k", "v", "label")
        .collect()
    )
    assert salted == plain


def test_bucketed_join_no_shuffle(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored); dropped below
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
    )
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"), "o_orderkey"
        )
        p = _plan(joined)
        # co-located bucketed scan: a sort-merge join with NO Exchange
        assert "SortMergeJoin" in p
        tree = p.split("(1)")[0]
        assert "Exchange" not in tree
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The engine's last line of skew defense needs no code at all: AQE
    detects the fat reduce partition from runtime shuffle statistics and
    splits it across tasks (SortMergeJoin(skew=true) + AQEShuffleRead
    'skewed' in the FINAL plan). Thresholds are lowered so test-scale data
    crosses them; at 100 TB the defaults (256 MB advisory / 5x median)
    trigger on real skew. Salted operators (skew.py) remain the
    deterministic fallback when the skew is in an aggregate, which AQE
    does not split."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # 90% of 1M rows land on key 0 → one fat reduce partition
        left = spark.range(1_000_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select(F.sum("v").alias("s"))
        [row] = j.collect()  # execute THIS plan: AQE finalizes on run
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
        # correctness unchanged by the split: k=0 rows all join right key 0;
        # unskewed rows (k=v) join only right keys < 1000
        assert row["s"] == sum(
            v for v in range(1_000_000) if v % 10 < 9
        ) + sum(v for v in range(1000) if v % 10 >= 9)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
