"""As-of join semantics: tie inclusion, left-outer nulls, tiebreak dedup."""

from __future__ import annotations

from openmrs_module_mamba_etl_spark.operators.asof import asof_join


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_basic_ties_and_outer(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 5), (2, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, "at10"), (1, 20, "at20"), (3, 1, "other")],
        "k long, t long, v string",
    )
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["v"],
    )
    got = _rows(out, ["k", "t", "asof_v", "asof_ts"])
    assert got == [
        (1, 5, None, None),      # before any right row → outer nulls
        (1, 10, "at10", 10),     # ts tie counts as "at or before"
        (1, 25, "at20", 20),     # latest right ≤ 25
        (2, 50, None, None),     # key with no right rows at all
    ]


def test_asof_tiebreak_dedupes_equal_timestamps(spark):
    left = spark.createDataFrame([(1, 10)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 1, "first"), (1, 10, 2, "second")],
        "k long, t long, seq long, v string",
    )
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["v"], tiebreak_col="seq",
    )
    got = _rows(out, ["k", "t", "asof_v"])
    assert got == [(1, 10, "second")]  # highest tiebreak wins


def test_asof_multiple_left_rows_share_one_right(spark):
    left = spark.createDataFrame(
        [(1, 15), (1, 16), (1, 17)], "k long, t long"
    )
    right = spark.createDataFrame([(1, 12, 9.5)], "k long, t long, px double")
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["px"],
    )
    got = _rows(out, ["t", "asof_px", "asof_ts"])
    assert got == [(15, 9.5, 12), (16, 9.5, 12), (17, 9.5, 12)]


def test_asof_left_column_name_collision(spark):
    """A left column sharing a payload name must neither feed the carry
    nor be dropped from the output."""
    left = spark.createDataFrame(
        [(1, 30, 999.0)], "k long, t long, price double"
    )
    right = spark.createDataFrame(
        [(1, 10, 7.5)], "k long, t long, price double"
    )
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["price"],
    )
    row = out.collect()[0]
    assert row["price"] == 999.0      # left's own column survives intact
    assert row["asof_price"] == 7.5   # carry comes from the right row
    assert row["asof_ts"] == 10


def test_asof_null_payload_from_latest_row(spark):
    """The attached payload must come from the SAME row as asof_ts — a
    newer right row with a NULL payload supersedes an older non-null."""
    left = spark.createDataFrame([(1, 30)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 10, 7.5), (1, 20, None)], "k long, t long, bid double"
    )
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["bid"],
    )
    row = out.collect()[0]
    assert row["asof_ts"] == 20
    assert row["asof_bid"] is None


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 50)], "k long, t long"
    )
    right = spark.createDataFrame(
        [(1, 10, "at10"), (1, 40, "at40")], "k long, t long, v string"
    )
    out = asof_join(
        left, right, key_col="k", left_ts="t", right_ts="t",
        payload_cols=["v"], direction="forward",
    )
    got = _rows(out, ["k", "t", "asof_v", "asof_ts"])
    assert got == [
        (1, 10, "at10", 10),   # equal ts counts ("at or after")
        (1, 25, "at40", 40),   # earliest right >= 25
        (1, 50, None, None),   # nothing after → outer nulls
    ]
