"""EAV flattener unit tests: naming, latest-wins, configs, auto-by-type."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from openmrs_module_mamba_etl_spark.operators.flatten import (
    FlattenSpec,
    assign_column_names,
    auto_flatten_by_type,
    discover_attrs,
    flatten,
    sanitize_column,
)

SPEC = FlattenSpec(
    entity_col="encounter_id",
    attr_col="concept",
    value_col="value",
    order_col="obs_ts",
)


def obs_df(spark, rows):
    return spark.createDataFrame(
        rows, "encounter_id long, concept string, value string, obs_ts long"
    )


def test_sanitize_column():
    assert sanitize_column("HIV Test Result") == "hiv_test_result"
    assert sanitize_column("Temp (°C)") == "temp_c"
    assert sanitize_column("123weight") == "_123weight"
    assert sanitize_column("!!!") == "col"


def test_assign_column_names_collisions():
    m = assign_column_names(["HIV Test", "hiv test", "hiv-test"])
    assert sorted(m.values()) == ["hiv_test", "hiv_test_2", "hiv_test_3"]
    # deterministic: sorted attr order drives suffix assignment
    assert m["HIV Test"] == "hiv_test"


def test_latest_wins(spark):
    df = obs_df(
        spark,
        [
            (1, "weight", "60", 100),
            (1, "weight", "65", 200),  # later → wins
            (1, "height", "170", 50),
            (2, "weight", "80", 10),
        ],
    )
    wide = flatten(df, SPEC)
    rows = {r["encounter_id"]: r for r in wide.collect()}
    assert rows[1]["weight"] == "65"
    assert rows[1]["height"] == "170"
    assert rows[2]["weight"] == "80"
    assert rows[2]["height"] is None


def test_column_mapping_restricts_and_renames(spark):
    df = obs_df(spark, [(1, "weight", "60", 1), (1, "height", "170", 1)])
    wide = flatten(df, SPEC, column_mapping={"wt": "weight"})
    assert wide.columns == ["encounter_id", "wt"]
    assert wide.first()["wt"] == "60"


def test_carry_cols(spark):
    df = spark.createDataFrame(
        [(1, 10, "weight", "60", 1)],
        "encounter_id long, person_id long, concept string, value string, obs_ts long",
    )
    spec = FlattenSpec(
        entity_col="encounter_id",
        attr_col="concept",
        value_col="value",
        order_col="obs_ts",
        carry_cols=("person_id",),
    )
    wide = flatten(df, spec)
    assert wide.columns == ["encounter_id", "person_id", "weight"]


def test_discover_attrs_guard(spark):
    df = obs_df(spark, [(1, f"c{i}", "v", 1) for i in range(5)])
    spec = FlattenSpec(
        entity_col="encounter_id",
        attr_col="concept",
        value_col="value",
        order_col="obs_ts",
        max_attrs=3,
    )
    with pytest.raises(ValueError, match="max_attrs"):
        discover_attrs(df, spec)


def test_auto_flatten_by_type(spark):
    df = spark.createDataFrame(
        [
            (1, "anc", "weight", "60", 1),
            (2, "anc", "height", "170", 1),
            (3, "hts", "hiv_result", "neg", 1),
        ],
        "encounter_id long, etype string, concept string, value string, obs_ts long",
    )
    res = auto_flatten_by_type(df, "etype", SPEC)
    assert sorted(res.tables) == [
        "mamba_flat_encounter_anc",
        "mamba_flat_encounter_hts",
    ]
    anc = res.tables["mamba_flat_encounter_anc"]
    # per-type tables carry only that type's attribute domain
    assert anc.columns == ["encounter_id", "height", "weight"]
    hts = res.tables["mamba_flat_encounter_hts"]
    assert hts.columns == ["encounter_id", "hiv_result"]
    assert hts.first()["hiv_result"] == "neg"


def test_flatten_null_attrs_ignored(spark):
    df = obs_df(spark, [(1, None, "x", 1), (1, "weight", "60", 1)])
    wide = flatten(df, SPEC)
    assert wide.columns == ["encounter_id", "weight"]


def test_run_per_type_concurrent_wall_clock(spark):
    """With a ~0.7 s artificial cost per type, 4 types must finish in far
    less than 4×0.7 s — the per-type jobs overlap instead of running from
    a serial driver loop. Generous margin: parallel ≈ 0.7 s + overhead,
    serial ≥ 2.8 s; the 2.2 s cutoff separates them robustly."""
    import time

    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.operators.flatten import (
        AutoFlattenResult,
        run_per_type,
    )

    @F.udf("long")
    def slow_id(x):
        time.sleep(0.7)
        return x

    tables = {
        f"t{i}": spark.range(1).select(slow_id(F.col("id")).alias("id"))
        for i in range(4)
    }
    res = AutoFlattenResult(tables=tables)
    t0 = time.monotonic()
    counts = run_per_type(res, lambda _n, df: df.count())
    wall = time.monotonic() - t0
    assert counts == {f"t{i}": 1 for i in range(4)}
    assert wall < 2.2, f"per-type jobs did not overlap: {wall:.2f}s"


def test_write_auto_flatten_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.operators.flatten import (
        write_auto_flatten,
    )

    df = obs_df(
        spark,
        [(1, "weight", "60", 1), (2, "hiv_result", "neg", 1)],
    ).withColumn(
        "etype",
        F.when(F.col("concept") == "weight", "anc").otherwise("hts"),
    )
    res = auto_flatten_by_type(df, "etype", SPEC)
    paths = write_auto_flatten(res, str(tmp_path / "flat"))
    assert sorted(paths) == sorted(res.tables)
    for name, path in paths.items():
        back = spark.read.parquet(path)
        assert back.count() == res.tables[name].count()
