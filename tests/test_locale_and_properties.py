"""Locale-preferred concept naming + runtime-properties config surface."""

from __future__ import annotations

from openmrs_module_mamba_etl_spark.operators.flatten import (
    FlattenSpec,
    apply_concept_locale,
    flatten,
)
from openmrs_module_mamba_etl_spark.sources.properties import MambaProperties

SPEC = FlattenSpec(
    entity_col="encounter_id",
    attr_col="concept",
    value_col="value",
    order_col="obs_ts",
)


def test_apply_concept_locale(spark):
    obs = spark.createDataFrame(
        [(1, "1001", "60", 10), (1, "1002", "170", 10), (1, "9999", "x", 10)],
        "encounter_id long, concept string, value string, obs_ts long",
    )
    vocab = spark.createDataFrame(
        [
            (1001, "Weight (kg)", "en"),
            (1001, "Poids (kg)", "fr"),
            (1002, "Height (cm)", "en"),
        ],
        "concept_id long, name string, locale string",
    )
    named = apply_concept_locale(obs, vocab, SPEC, locale="en")
    wide = flatten(named, SPEC)
    assert sorted(wide.columns) == [
        "_9999",  # unresolved id falls back to raw value, sanitized
        "encounter_id",
        "height_cm",
        "weight_kg",
    ]
    r = wide.first()
    assert r["weight_kg"] == "60" and r["height_cm"] == "170"

    fr = flatten(apply_concept_locale(obs, vocab, SPEC, locale="fr"), SPEC)
    assert "poids_kg" in fr.columns  # locale switch renames columns
    assert "height_cm" not in fr.columns  # 1002 has no fr name → raw id
    assert "_1002" in fr.columns


PROPS = """
# OpenMRS runtime properties (reference README.md:117-140 key surface)
mambaetl.analysis.db_user=etl
mambaetl.analysis.db_password=secret
mambaetl.analysis.db_openmrs=openmrs_prod
mambaetl.analysis.db_etl=warehouse
mambaetl.analysis.locale=fr
mambaetl.analysis.columns=60
mambaetl.analysis.incremental_mode=0
mambaetl.analysis.automated_flattening=1
mambaetl.analysis.etl_interval=600
other.key=ignored
"""


def test_properties_parse():
    p = MambaProperties.parse(PROPS)
    assert p.db_user == "etl"
    assert p.source_db == "openmrs_prod"
    assert p.target_db == "warehouse"
    assert p.locale == "fr"
    assert p.columns == 60  # accepted for compat, unused by the engine
    assert p.incremental_mode is False
    assert p.automated_flattening is True
    assert p.etl_interval_seconds == 600


def test_properties_defaults():
    p = MambaProperties.parse("")
    assert p.source_db == "openmrs"
    assert p.target_db == "analysis_db"
    assert p.incremental_mode is True
    assert p.etl_interval_seconds == 1800
