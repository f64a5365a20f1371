"""openmrs_module_mamba_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference
``smallgod/openmrs-module-mamba-etl`` module (MySQL stored-procedure ETL for
OpenMRS EAV clinical data): EAV→wide flattening, star-schema dims/facts,
full/incremental refresh, JSON-configured parameterized reports — plus the
large-scale training-data operators (dedup, similarity search, multimodal
columns, text analysis) a 100 TB pipeline needs.

Architecture is Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst/AQE, columnar Parquet storage, broadcast/shuffle-aware joins.
Nothing is ported from the reference's stored-procedure execution engine.
"""

__version__ = "0.1.0"

from openmrs_module_mamba_etl_spark.session import get_spark  # noqa: F401

__all__ = ["get_spark"]

# Convenience re-exports of the main operator surface. Imported lazily by
# attribute so `import openmrs_module_mamba_etl_spark` stays light.
_LAZY = {
    "flatten": "openmrs_module_mamba_etl_spark.operators.flatten",
    "FlattenSpec": "openmrs_module_mamba_etl_spark.operators.flatten",
    "auto_flatten_by_type": "openmrs_module_mamba_etl_spark.operators.flatten",
    "sessionize": "openmrs_module_mamba_etl_spark.operators.sessionize",
    "session_stats": "openmrs_module_mamba_etl_spark.operators.sessionize",
    "profile_table": "openmrs_module_mamba_etl_spark.operators.profile",
    "merge_upsert": "openmrs_module_mamba_etl_spark.operators.incremental",
    "compact_parquet": "openmrs_module_mamba_etl_spark.operators.incremental",
    "read_published": "openmrs_module_mamba_etl_spark.operators.incremental",
    "ReportRegistry": "openmrs_module_mamba_etl_spark.plans.reports",
    "hash_split": "openmrs_module_mamba_etl_spark.llm.sampling",
    "stratified_sample": "openmrs_module_mamba_etl_spark.llm.sampling",
    "mixture_sample": "openmrs_module_mamba_etl_spark.llm.sampling",
    "pack_sequences": "openmrs_module_mamba_etl_spark.llm.sampling",
    "decontaminate": "openmrs_module_mamba_etl_spark.llm.curation",
    "repetition_stats": "openmrs_module_mamba_etl_spark.llm.curation",
    "rollup_aggregate": "openmrs_module_mamba_etl_spark.operators.rollup",
    "rollup_refresh": "openmrs_module_mamba_etl_spark.operators.rollup",
}


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(_LAZY[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
