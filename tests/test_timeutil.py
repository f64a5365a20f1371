"""ts normalization seam: floor semantics must match DuckDB's epoch_us."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.functions.timeutil import ts_us, ts_timestamp


def test_ts_us_int_floor_matches_epoch_us(spark):
    # ns→µs on int64 input must FLOOR (DuckDB epoch_us semantics), not
    # truncate toward zero — they differ on negative non-multiples of 1000.
    ns = [1_234_567_891, 1_000, 999, 0, -1, -999, -1_000, -1_001]
    df = spark.createDataFrame([(v,) for v in ns], "ts long")
    got = [r[0] for r in df.select(ts_us(df).alias("us")).collect()]
    assert got == [v // 1000 for v in ns]  # python // floors


def test_ts_us_large_ns_exact(spark):
    # ns-since-epoch ≈ 1.7e18 > 2^53: the conversion must not round-trip
    # through double.
    v = 1_723_593_600_123_456_789
    df = spark.createDataFrame([(v,)], "ts long")
    assert df.select(ts_us(df).alias("us")).first()["us"] == v // 1000


def test_ts_timestamp_pre_epoch(spark):
    df = spark.createDataFrame([(-1_001,)], "ts long")
    out = df.select(F.unix_micros(ts_timestamp(df)).alias("us")).first()
    assert out["us"] == -2  # floor(-1001/1000)
