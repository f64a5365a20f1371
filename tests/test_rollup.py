"""Hypertable rollup: chunk-selective refresh equals full rebuild and
touches only the affected chunk directories."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.operators.rollup import (
    rollup_aggregate,
    rollup_refresh,
    rollup_write,
)

HOUR_US = 3_600_000_000
SCHEMA = "tus long, k string, value double"


def _rows(df):
    return sorted(tuple(r) for r in df.select(
        "chunk", "k", "n_events", "sum_value", "min_value", "max_value"
    ).collect())


def test_refresh_touches_only_affected_chunks(spark, tmp_path):
    path = str(tmp_path / "rollup")
    base = [
        (0 * HOUR_US + 5, "a", 1.0),
        (0 * HOUR_US + 9, "a", 2.0),
        (1 * HOUR_US + 1, "b", 3.0),
        (2 * HOUR_US + 1, "a", 4.0),
    ]
    raw = spark.createDataFrame(base, SCHEMA)
    rollup_write(
        rollup_aggregate(raw, "tus", ["k"], "value", HOUR_US), path
    )
    mtimes_before = {
        d: max(os.path.getmtime(f) for f in glob.glob(d + "/*"))
        for d in glob.glob(path + "/chunk=*")
    }

    # a late event lands in chunk 1 only
    late = [(1 * HOUR_US + 30, "b", 10.0)]
    raw2 = spark.createDataFrame(base + late, SCHEMA)
    batch = spark.createDataFrame(late, SCHEMA)
    rollup_refresh(
        spark, batch, path, "tus", ["k"], "value", HOUR_US, raw=raw2
    )

    # incremental result == full rebuild
    got = _rows(
        spark.read.parquet(path).withColumn(
            "chunk", F.col("chunk").cast("long")
        )
    )
    want = _rows(rollup_aggregate(raw2, "tus", ["k"], "value", HOUR_US))
    assert got == want

    # untouched chunk directories byte-stable (mtime unchanged)
    for d, t in mtimes_before.items():
        if d.endswith("chunk=1"):
            continue
        assert max(
            os.path.getmtime(f) for f in glob.glob(d + "/*")
        ) == t, f"untouched chunk rewritten: {d}"


def test_refresh_of_brand_new_chunk_appends(spark, tmp_path):
    path = str(tmp_path / "rollup")
    base = [(0, "a", 1.0)]
    raw = spark.createDataFrame(base, SCHEMA)
    rollup_write(rollup_aggregate(raw, "tus", ["k"], "value", HOUR_US), path)

    new = [(5 * HOUR_US, "z", 7.0)]
    raw2 = spark.createDataFrame(base + new, SCHEMA)
    rollup_refresh(
        spark,
        spark.createDataFrame(new, SCHEMA),
        path, "tus", ["k"], "value", HOUR_US, raw=raw2,
    )
    got = _rows(
        spark.read.parquet(path).withColumn(
            "chunk", F.col("chunk").cast("long")
        )
    )
    assert got == _rows(rollup_aggregate(raw2, "tus", ["k"], "value", HOUR_US))


def test_lttb_invariants_and_known_series():
    """LTTB pure-kernel invariants: endpoints always kept, exactly n_out
    points, strictly increasing selection; plus a hand-checked spike
    series — the bucket's largest-triangle point is the spike, not its
    neighbors."""
    from openmrs_module_mamba_etl_spark.operators.downsample import (
        lttb_indices,
    )

    xs = list(range(20))
    cents = [100] * 20
    cents[7] = 5000  # spike
    sel = lttb_indices(xs, cents, 6)
    assert sel[0] == 0 and sel[-1] == 19
    assert len(sel) == 6
    assert sel == sorted(set(sel))
    assert 7 in sel  # the spike survives downsampling
    # series shorter than n_out passes through whole
    assert lttb_indices(xs[:4], cents[:4], 6) == [0, 1, 2, 3]


def test_lttb_query_shape(spark, sf_dir):
    from openmrs_module_mamba_etl_spark.inventory.window_queries import (
        rollup_downsample_lttb,
    )

    rows = rollup_downsample_lttb(spark, sf_dir).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, pts in by_type.items():
        assert len(pts) == 12, t
        idxs = sorted(p["sel_idx"] for p in pts)
        assert idxs == list(range(12))
        days = [p["day"] for p in sorted(pts, key=lambda p: p["sel_idx"])]
        assert days == sorted(days)
