"""Batch sessionization: gaps-and-islands vs native session_window."""

from __future__ import annotations

from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from openmrs_module_mamba_etl_spark.operators.sessionize import (
    session_stats,
    session_window_agg,
    sessionize,
)

HOUR_NS = 3600 * 1_000_000_000
T0 = 1_700_000_000 * 1_000_000_000

SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _df(spark):
    rows = [
        (1, T0, 1.0),
        (1, T0 + HOUR_NS, 2.0),          # same session (1 h < 6 h)
        (1, T0 + 10 * HOUR_NS, 3.0),     # new session (9 h gap)
        (2, T0, 4.0),                    # single-event session
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_sessionize_ids(spark):
    tagged = sessionize(_df(spark), "user_id", "ts")
    got = {(r["user_id"], r["ts"], r["session_id"]) for r in tagged.collect()}
    assert got == {
        (1, T0, 1),
        (1, T0 + HOUR_NS, 1),
        (1, T0 + 10 * HOUR_NS, 2),
        (2, T0, 1),
    }


def test_session_stats(spark):
    got = {
        (r["user_id"], r["session_id"], r["session_start_ns"], r["session_end_ns"], r["n_events"], r["sum_value"])
        for r in session_stats(_df(spark), "user_id", "ts", "value").collect()
    }
    assert got == {
        (1, 1, T0, T0 + HOUR_NS, 2, 3.0),
        (1, 2, T0 + 10 * HOUR_NS, T0 + 10 * HOUR_NS, 1, 3.0),
        (2, 1, T0, T0, 1, 4.0),
    }


def test_session_window_agg_matches_islands(spark):
    """Native session_window produces the same (count, sum) partition and
    its end bound is last event + gap."""
    native = session_window_agg(_df(spark), "user_id", "ts", "value", "6 hours")
    got = {
        (
            r["user_id"],
            int(r["session_start"].timestamp() * 1_000_000),
            int(r["session_end"].timestamp() * 1_000_000),
            r["n_events"],
            r["sum_value"],
        )
        for r in native.collect()
    }
    us = 1  # bounds below are in µs
    t0 = T0 // 1000
    hour = HOUR_NS // 1000
    gap = 6 * hour
    assert got == {
        (1, t0 * us, (t0 + hour + gap) * us, 2, 3.0),
        (1, (t0 + 10 * hour) * us, (t0 + 16 * hour) * us, 1, 3.0),
        (2, t0 * us, (t0 + gap) * us, 1, 4.0),
    }
