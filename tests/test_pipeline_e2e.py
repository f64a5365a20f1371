"""Full ETL cycle: pipeline run → materialized analysis store → reports over
the written tables → scheduled re-run. The Spark analog of the reference's
deploy → event-scheduler tick → REST report flow.
"""

from __future__ import annotations

from pathlib import Path

from openmrs_module_mamba_etl_spark.inventory.report_queries import REPORTS
from openmrs_module_mamba_etl_spark.plans.clinical import run_clinical_pipeline
from openmrs_module_mamba_etl_spark.plans.pipeline import materialize
from openmrs_module_mamba_etl_spark.streaming.scheduler import EtlScheduler


def test_full_etl_and_report_cycle(spark, sf_dir, tmp_path):
    ctx = run_clinical_pipeline(spark, sf_dir)
    assert set(ctx.tables) == {
        "mamba_dim_person",
        "mamba_dim_encounter_type",
        "mamba_dim_encounter",
        "mamba_flat_user_activity",
        "mamba_fact_order_totals",
    }

    target = str(tmp_path / "analysis_db")
    paths = materialize(spark, ctx, target)
    for p in paths.values():
        assert Path(p).exists()

    # reports now run over the *written* store (views re-registered on it)
    df = REPORTS.run(spark, "total_orders_1997")
    n = df.first()["total_orders_1997"]
    assert n > 0

    df2 = REPORTS.run(
        spark, "latest_purchase_by_user", segment="BUILDING", max_user_id=100
    )
    assert df2.count() > 0
    assert df2.columns == ["user_id", "latest_purchase_value", "segment"]

    # fact table sanity: one row per person with orders, totals positive.
    # The store publishes through the versioned log (reader-atomic), so
    # on-disk reads resolve a committed snapshot, not a raw directory.
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    fact = VersionedParquetTable(paths["mamba_fact_order_totals"]).read(spark)
    assert fact.count() == fact.select("person_id").distinct().count()


def test_scheduler_drives_pipeline(spark, sf_dir, tmp_path):
    runs: list[bool] = []

    def run_once(incremental: bool) -> None:
        ctx = run_clinical_pipeline(spark, sf_dir, incremental=incremental)
        materialize(spark, ctx, str(tmp_path / "store"))
        runs.append(incremental)

    EtlScheduler(run_once, interval_seconds=0, incremental=True).run(max_ticks=2)
    assert runs == [False, True]
    assert (tmp_path / "store" / "mamba_dim_person").exists()


def test_approx_distinct_error_bound(spark, sf_dir):
    import __spark_entry__ as E

    Q = E.queries()
    approx = Q["agg_approx_distinct"](spark, sf_dir).first()["approx_customers"]
    from openmrs_module_mamba_etl_spark.sources.parquet import table
    from pyspark.sql import functions as F

    exact = table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey")
    ).first()[0]
    assert abs(approx - exact) / exact < 0.1  # HLL default rsd ≈ 5%
