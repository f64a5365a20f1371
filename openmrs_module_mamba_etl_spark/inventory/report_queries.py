"""Report-service inventory: the three golden README reports re-expressed
over the star schema (FIXTURES.md §A3), executed through the real report
registry — reports.json shape, typed param binding, MySQL dialect shim
(reference: README.md:288-328).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmrs_module_mamba_etl_spark.plans.clinical import PIPELINE
from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.config import (
    ReportDefinition,
    ReportParam,
)

#: The three README report shapes (reference: README.md:296,313,321) with
#: MySQL-dialect SQL over the pipeline's dim/flat/fact views.
REPORTS = ReportRegistry(
    [
        ReportDefinition(
            report_name="Latest purchase by user (mother_hiv_status shape)",
            report_id="latest_purchase_by_user",
            # flat⋈dim inner join + two bound params
            # (reference: README.md:296 mother_hiv_status).
            sql_query="""
                SELECT f.user_id, f.purchase AS latest_purchase_value,
                       p.segment
                FROM mamba_flat_user_activity f
                INNER JOIN mamba_dim_person p ON f.user_id = p.person_id
                WHERE p.segment = :segment AND f.user_id <= :max_user_id
            """,
            query_params=(
                ReportParam("segment", "VARCHAR(255)"),
                ReportParam("max_user_id", "INT"),
            ),
        ),
        ReportDefinition(
            report_name="Total orders 1997 (total_deliveries shape)",
            report_id="total_orders_1997",
            # dim⋈dim join + literal filter + DATE()/CONCAT date expression +
            # COUNT(*) (reference: README.md:313 total_deliveries).
            sql_query="""
                SELECT COUNT(*) AS total_orders_1997
                FROM mamba_dim_encounter e
                INNER JOIN mamba_dim_person p ON e.person_id = p.person_id
                WHERE p.segment = 'BUILDING'
                  AND DATE(e.encounter_datetime) >= CONCAT('1997', '-01-01')
                  AND DATE(e.encounter_datetime) <  CONCAT('1998', '-01-01')
            """,
        ),
        ReportDefinition(
            report_name="Distinct buyers in window (exposed_infants shape)",
            report_id="distinct_buyers_window",
            # fact⋈dim + BETWEEN + DATE_FORMAT %-tokens + COUNT(DISTINCT)
            # (reference: README.md:321 total_hiv_exposed_infants).
            sql_query="""
                SELECT COUNT(DISTINCT e.person_id) AS total_buyers
                FROM mamba_dim_encounter e
                INNER JOIN mamba_dim_person p ON e.person_id = p.person_id
                WHERE e.encounter_datetime
                        BETWEEN DATE_FORMAT(DATE('1997-06-15'), '%Y-01-01')
                            AND '1997-12-31'
                  AND p.segment = 'MACHINERY'
            """,
        ),
    ]
)

_FLAT_CTE = """
    WITH latest AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC) AS rn
      FROM events
    ), flat AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase
      FROM latest WHERE rn = 1 GROUP BY user_id
    )
"""


def _ensure_views(spark: SparkSession, sf_dir: str, steps: list[str]) -> None:
    """Materialize just the pipeline views a report needs (the report path
    reads pre-built analysis tables — reference: README.md:285-287)."""
    from openmrs_module_mamba_etl_spark.plans.pipeline import PipelineContext

    ctx = PipelineContext(sf_dir=sf_dir)
    for name, fn, publish in PIPELINE._steps:
        if name in steps:
            out = fn(spark, ctx)
            if out is not None and publish:
                ctx.tables[name] = out
                out.createOrReplaceTempView(name)


@query(
    "report_latest_purchase",
    oracle=_FLAT_CTE
    + """
    SELECT f.user_id, f.purchase AS latest_purchase_value,
           c.c_mktsegment AS segment
    FROM flat f
    JOIN customer c ON f.user_id = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND f.user_id <= 100
    """,
)
def report_latest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(
        spark, sf_dir, ["mamba_dim_person", "mamba_flat_user_activity"]
    )
    return REPORTS.run(
        spark, "latest_purchase_by_user", segment="BUILDING", max_user_id=100
    )


@query(
    "report_total_orders",
    oracle="""
    SELECT COUNT(*) AS total_orders_1997
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1998-01-01'
    """,
)
def report_total_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir, ["mamba_dim_person", "mamba_dim_encounter"])
    return REPORTS.run(spark, "total_orders_1997")


@query(
    "report_distinct_buyers",
    oracle="""
    SELECT COUNT(DISTINCT o.o_custkey) AS total_buyers
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
      AND c.c_mktsegment = 'MACHINERY'
    """,
)
def report_distinct_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_views(spark, sf_dir, ["mamba_dim_person", "mamba_dim_encounter"])
    return REPORTS.run(spark, "distinct_buyers_window")


@query(
    "report_rest_payload",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    """,
)
def report_rest_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST result sink round-trip (SURVEY §2.A A6 — reference:
    README.md:277-283 serializes report results as JSON over HTTP).

    The report result is serialized row-by-row with ``to_json(struct(*))``
    — the exact payload the REST handler would stream — then parsed back
    with ``from_json`` against the declared schema. The oracle checks the
    PARSED values, proving serialize→parse is lossless without tying the
    hash to JSON formatting trivia. Both steps are JVM-side codegen
    expressions, so the payload path adds no Python and distributes like
    any projection."""
    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    result = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_value"),
        )
    )
    payload = result.select(
        F.to_json(F.struct("segment", "n_orders", "total_value")).alias("js")
    )
    schema = "segment string, n_orders bigint, total_value double"
    return payload.select(
        F.from_json(F.col("js"), schema).alias("r")
    ).select("r.segment", "r.n_orders", "r.total_value")


@query(
    "sink_database",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def sink_database(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Managed-catalog sink (SURVEY §2.A A4 — reference: README.md:73-75
    creates the analysis DB if missing): CREATE DATABASE IF NOT EXISTS +
    saveAsTable into it, read back via the catalog. The catalog table is
    what downstream report sessions see without knowing file paths."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    spark.sql("CREATE DATABASE IF NOT EXISTS mamba_analysis")
    # Run-scoped table name: the in-memory catalog is per-session, but the
    # warehouse DIRECTORY on disk is shared — a fixed name makes two
    # concurrent suites (parity + driver gate) clobber each other's files
    # mid-write. Per-pid names give each process its own managed location.
    tbl = f"mamba_analysis.order_status_counts_{os.getpid()}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # the catalog is per-session: prior runs' managed-table directories
    # survive as orphans, so prune locations owned by dead pids (plus any
    # unsuffixed dir from older revisions' fixed-name scheme)
    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        prune_dead_pid_dirs,
    )

    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    db_dir = f"{warehouse}/mamba_analysis.db"
    shutil.rmtree(f"{db_dir}/order_status_counts", ignore_errors=True)
    prune_dead_pid_dirs(db_dir, "order_status_counts_")
    agg = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    agg.write.mode("overwrite").saveAsTable(tbl)
    return spark.table(tbl)


@query(
    "etl_full_run",
    oracle="""
    SELECT 'mamba_dim_encounter' AS table_name,
           (SELECT COUNT(*) FROM orders) AS n_rows, 5 AS n_cols
    UNION ALL
    SELECT 'mamba_dim_encounter_type',
           (SELECT COUNT(*) FROM nation), 3
    UNION ALL
    SELECT 'mamba_dim_person',
           (SELECT COUNT(*) FROM customer), 4
    UNION ALL
    SELECT 'mamba_fact_order_totals',
           (SELECT COUNT(DISTINCT o_custkey) FROM orders), 5
    UNION ALL
    SELECT 'mamba_flat_user_activity',
           (SELECT COUNT(DISTINCT user_id) FROM events
            WHERE event_type IS NOT NULL),
           1 + (SELECT COUNT(DISTINCT event_type) FROM events
                WHERE event_type IS NOT NULL)
    """,
)
def etl_full_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's MAIN entry point end-to-end: one full ETL run
    building every dim, flat, and fact table of the star schema
    (reference: README.md:252-256; sp_mamba_data_processing_etl.sql —
    the scheduler-invoked full-refresh procedure chain), as ONE
    driver-checkable row per materialized table. The oracle recomputes
    each table's exact shape contract from the raw sources: dims mirror
    their source row counts, the fact keys are the distinct order
    customers, and the flat table is one row per entity with one column
    per discovered attribute. Per-table count jobs are submitted
    concurrently (run_per_type pattern) — the same scheduler-overlap
    property the auto-flatten path uses."""
    from openmrs_module_mamba_etl_spark.operators.flatten import run_per_type
    from openmrs_module_mamba_etl_spark.plans.clinical import (
        run_clinical_pipeline,
    )

    ctx = run_clinical_pipeline(spark, sf_dir)
    counts = run_per_type(ctx.tables, lambda _n, df: df.count())
    rows = [
        (n, counts[n], len(ctx.tables[n].columns)) for n in sorted(ctx.tables)
    ]
    return spark.createDataFrame(
        rows, "table_name string, n_rows long, n_cols int"
    )


@query(
    "obs_pipeline_metrics",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN o_totalprice > 200000 THEN 1 END) AS n_large,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders WHERE o_orderstatus = 'O'
    """,
)
def obs_pipeline_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via Spark's Observation API: named metrics
    ride along the SAME job that materializes the data (here a noop-sink
    drain of the filtered scan) — zero extra passes, which is how a
    100 TB ETL reports row counts / quality tallies without re-scanning.
    The observed values re-enter as a literal row; the oracle recomputes
    them directly, proving the observed metrics equal the ground truth."""
    from pyspark.sql import Observation, functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    obs = Observation("etl_metrics")
    df = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias(
                "n_large"
            ),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    total = float(m["total_price"]) if m["total_price"] is not None else 0.0
    return spark.createDataFrame(
        [(m["n_rows"], m["n_large"], total)],  # SUM over 0 rows is NULL
        "n_rows long, n_large long, total_price double",
    )
