"""Incremental flatten maintenance: the invariant is
incremental-result ≡ full-re-flatten of current obs, tick after tick."""

from __future__ import annotations

from openmrs_module_mamba_etl_spark.operators.flatten import FlattenSpec, flatten
from openmrs_module_mamba_etl_spark.operators.incremental import (
    WatermarkStore,
    incremental_flatten_parquet,
)

SPEC = FlattenSpec(
    entity_col="encounter_id",
    attr_col="concept",
    value_col="value",
    order_col="obs_ts",
)

SCHEMA = "encounter_id long, concept string, value string, obs_ts long, audit long"


def rows_of(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_incremental_flatten_matches_full(spark, tmp_path):
    target = str(tmp_path / "flat")
    store = WatermarkStore(tmp_path / "wm.json")

    obs1 = spark.createDataFrame(
        [
            (1, "weight", "60", 10, 100),
            (1, "height", "170", 10, 100),
            (2, "weight", "80", 10, 100),
        ],
        SCHEMA,
    )
    out1 = incremental_flatten_parquet(
        spark, obs1, target, SPEC, "audit", store, "flat"
    )
    assert rows_of(out1) == rows_of(flatten(obs1, SPEC))
    assert store.get("flat") == "100"

    # tick 2: entity 1 gets a newer weight; entity 3 is new and introduces a
    # brand-new concept (schema drift); entity 2 untouched.
    obs2 = spark.createDataFrame(
        [
            (1, "weight", "60", 10, 100),
            (1, "height", "170", 10, 100),
            (2, "weight", "80", 10, 100),
            (1, "weight", "65", 20, 200),
            (3, "temp", "37", 20, 200),
        ],
        SCHEMA,
    )
    out2 = incremental_flatten_parquet(
        spark, obs2, target, SPEC, "audit", store, "flat"
    )
    full = flatten(obs2, SPEC)
    assert sorted(out2.columns) == sorted(full.columns)
    assert rows_of(out2.select(*full.columns)) == rows_of(full)
    assert store.get("flat") == "200"

    lookup = {r["encounter_id"]: r for r in out2.collect()}
    assert lookup[1]["weight"] == "65"  # updated entity recomputed
    assert lookup[2]["weight"] == "80"  # untouched entity preserved
    assert lookup[2]["temp"] is None  # drifted column null-filled
    assert lookup[3]["temp"] == "37"


def test_incremental_flatten_noop_tick(spark, tmp_path):
    target = str(tmp_path / "flat2")
    store = WatermarkStore(tmp_path / "wm2.json")
    obs = spark.createDataFrame([(1, "w", "1", 1, 50)], SCHEMA)
    incremental_flatten_parquet(spark, obs, target, SPEC, "audit", store, "t")
    # same obs again: no rows past watermark → output unchanged
    out = incremental_flatten_parquet(spark, obs, target, SPEC, "audit", store, "t")
    assert rows_of(out) == rows_of(flatten(obs, SPEC))
