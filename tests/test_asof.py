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


def test_asof_nearest_prefers_closer_and_ties_backward(spark):
    """nearest: closer side wins in absolute distance; equal distance →
    the earlier (backward) row; one-sided rows still match."""
    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 400), (2, 50)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 210, "b"), (1, 300, "c"), (2, 500, "z")],
        "k long, rts long, tag string",
    )
    out = {
        (r["k"], r["lts"]): (r["asof_tag"], r["asof_ts"])
        for r in asof_join(
            left, right, "k", "lts", "rts", ["tag"], direction="nearest"
        ).collect()
    }
    assert out[(1, 100)] == ("a", 90)    # 10 back vs 110 fwd
    assert out[(1, 205)] == ("b", 210)   # 5 fwd beats 115 back
    assert out[(1, 400)] == ("c", 300)   # only backward side exists
    assert out[(2, 50)] == ("z", 500)    # only forward side exists
    # equal distance: backward wins
    left2 = spark.createDataFrame([(1, 200)], "k long, lts long")
    right2 = spark.createDataFrame(
        [(1, 150, "early"), (1, 250, "late")], "k long, rts long, tag string"
    )
    r2 = asof_join(
        left2, right2, "k", "lts", "rts", ["tag"], direction="nearest"
    ).collect()[0]
    assert (r2["asof_tag"], r2["asof_ts"]) == ("early", 150)


def test_asof_nearest_single_exchange(spark):
    """nearest must stay one exchange: backward prefix-carry and forward
    suffix-first share the same (key, ts) sort."""
    import contextlib, io

    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    left = spark.range(100).selectExpr("id % 5 AS k", "id AS lts")
    right = spark.range(50).selectExpr("id % 5 AS k", "id * 2 AS rts", "id AS v")
    df = asof_join(left, right, "k", "lts", "rts", ["v"], direction="nearest")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # one hash exchange on the key (plus possibly AQE reads); no join
    assert "Join" not in p
    tree = p.split("\n\n")[0]
    assert tree.count("Exchange") == 1, tree
