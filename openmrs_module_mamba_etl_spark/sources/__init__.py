from openmrs_module_mamba_etl_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_tables,
    register_views,
    table,
)
