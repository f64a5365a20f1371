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
