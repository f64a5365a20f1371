"""Bucketized range join: boundary semantics and the exactly-one-bucket
no-duplication property."""

from __future__ import annotations

from openmrs_module_mamba_etl_spark.operators.rangejoin import (
    point_in_interval_join,
)


def _pairs(df):
    return sorted((r["pid"], r["iid"]) for r in df.collect())


def run(spark, points, intervals, width):
    p = spark.createDataFrame(points, "pid long, k long, t long")
    i = spark.createDataFrame(intervals, "iid long, ik long, s long, e long")
    return point_in_interval_join(
        p, i, point_key="k", interval_key="ik",
        ts_col="t", start_col="s", end_col="e", bucket_width=width,
    )


def test_half_open_boundaries(spark):
    points = [(1, 7, 10), (2, 7, 19), (3, 7, 20), (4, 7, 9)]
    intervals = [(100, 7, 10, 20)]  # [10, 20)
    got = _pairs(run(spark, points, intervals, width=5))
    assert got == [(1, 100), (2, 100)]  # start in, end out


def test_interval_spanning_many_buckets_no_duplicates(spark):
    # interval covers 10 buckets; each in-range point must appear ONCE
    points = [(n, 1, n * 10) for n in range(12)]
    intervals = [(200, 1, 5, 95)]
    got = _pairs(run(spark, points, intervals, width=10))
    assert got == [(n, 200) for n in range(1, 10)]


def test_key_isolation(spark):
    points = [(1, 1, 15), (2, 2, 15)]
    intervals = [(300, 1, 10, 20)]
    got = _pairs(run(spark, points, intervals, width=10))
    assert got == [(1, 300)]


def test_interval_overlap_degenerate_interval_matches_theta(spark):
    """Empty [s, s) intervals must behave exactly like the theta predicate
    (they act as the point s): no phantom bucket replication, no dupes."""
    from openmrs_module_mamba_etl_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 50, 200), (1, 150, 160)], "k long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(1, 100, 100)], "k long, rs long, re long"  # empty interval
    )
    got = sorted(
        (r["ls"], r["le"], r["rs"], r["re"])
        for r in interval_overlap_join(
            left.withColumnRenamed("k", "lk"),
            right.withColumnRenamed("k", "rk"),
            "lk", "rk", "ls", "le", "rs", "re", bucket_width=50,
        ).collect()
    )
    # theta: ls < re AND rs < le -> only [50,200) strictly contains 100
    assert got == [(50, 200, 100, 100)]
