"""SCD2 dimension maintenance: backfill semantics and the incremental
merge's equivalence to a full-history rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.operators.scd2 import (
    scd2_apply,
    scd2_from_history,
)

HIST_SCHEMA = "k long, attr string, ts long, seq long"
DIM_SCHEMA = (
    "k long, attr string, valid_from long, valid_to long, is_current boolean"
)


def _rows(df):
    return sorted(
        (r["k"], r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in df.collect()
    )


def test_scd2_from_history_suppresses_and_closes(spark):
    hist = spark.createDataFrame(
        [
            (1, "a", 10, 0),
            (1, "a", 20, 1),  # suppressed: no change
            (1, "b", 30, 2),  # change -> closes [10, 30)
            (2, "x", 5, 3),   # single observation stays open
        ],
        HIST_SCHEMA,
    )
    out = _rows(scd2_from_history(hist, "k", "attr", "ts", "seq"))
    assert out == [
        (1, "a", 10, 30, False),
        (1, "b", 30, None, True),
        (2, "x", 5, None, True),
    ]


def test_scd2_from_history_tiebreak_is_deterministic(spark):
    # same key, same ts, different seq: seq order decides the chain
    hist = spark.createDataFrame(
        [(1, "b", 10, 2), (1, "a", 10, 1)], HIST_SCHEMA
    )
    out = _rows(scd2_from_history(hist, "k", "attr", "ts", "seq"))
    assert out == [(1, "a", 10, 10, False), (1, "b", 10, None, True)]


def test_scd2_apply_closes_opens_inserts_and_passes_through(spark):
    current = spark.createDataFrame(
        [
            (1, "a", 10, 30, False),  # closed history: untouched
            (1, "b", 30, None, True),  # open, will change
            (2, "x", 5, None, True),   # open, update is a no-op (same attr)
            (3, "y", 7, None, True),   # open, no update row at all
        ],
        DIM_SCHEMA,
    )
    updates = spark.createDataFrame(
        [(1, "c", 50), (2, "x", 60), (4, "z", 70)], "k long, attr string, eff long"
    )
    out = _rows(scd2_apply(current, updates, "k", "attr", "eff"))
    assert out == [
        (1, "a", 10, 30, False),
        (1, "b", 30, 50, False),   # closed at the update's effective time
        (1, "c", 50, None, True),  # new open version
        (2, "x", 5, None, True),   # unchanged attr: still the same open row
        (3, "y", 7, None, True),   # untouched
        (4, "z", 70, None, True),  # brand-new key
    ]


def test_scd2_apply_folds_to_history_rebuild(spark):
    """Applying per-timestamp batches incrementally == one backfill over
    the concatenated history (the invariant that lets a pipeline switch
    between batch rebuild and incremental maintenance freely)."""
    hist_rows = [
        (1, "a", 10, 0),
        (1, "b", 20, 1),
        (1, "b", 30, 2),  # no-op
        (1, "c", 40, 3),
        (2, "x", 20, 4),
        (2, "y", 40, 5),
        (3, "q", 40, 6),
    ]
    hist = spark.createDataFrame(hist_rows, HIST_SCHEMA)
    want = _rows(scd2_from_history(hist, "k", "attr", "ts", "seq"))

    dim = spark.createDataFrame([], DIM_SCHEMA)
    for ts in sorted({r[2] for r in hist_rows}):
        batch = spark.createDataFrame(
            [(k, a, t) for (k, a, t, _) in hist_rows if t == ts],
            "k long, attr string, eff long",
        )
        dim = scd2_apply(dim, batch, "k", "attr", "eff")
        # keep the iterative plan from stacking (mirrors production where
        # each batch reads the materialized table, not a lineage chain)
        dim = dim.localCheckpoint()

    assert _rows(dim) == want


def test_scd2_null_transitions(spark):
    """Transitions to and from NULL attributes are real changes: history
    a -> NULL -> a must produce three intervals, and an update clearing
    the attribute must close the open row."""
    hist = spark.createDataFrame(
        [(1, "a", 10, 0), (1, None, 20, 1), (1, "a", 30, 2)], HIST_SCHEMA
    )
    got = {tuple(r) for r in scd2_from_history(
        hist, "k", "attr", "ts", "seq").collect()}
    assert got == {
        (1, "a", 10, 20, False),
        (1, None, 20, 30, False),
        (1, "a", 30, None, True),
    }

    dim = spark.createDataFrame(
        [(1, "a", 10, None, True)], DIM_SCHEMA
    )
    upd = spark.createDataFrame([(1, None, 20)], "k long, attr string, eff long")
    merged = {tuple(r) for r in scd2_apply(
        dim, upd, "k", "attr", "eff").collect()}
    assert merged == {
        (1, "a", 10, 20, False),
        (1, None, 20, None, True),
    }
