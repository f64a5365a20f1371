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
