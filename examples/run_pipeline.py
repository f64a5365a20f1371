#!/usr/bin/env python
"""End-to-end demo: the full MambaETL-equivalent lifecycle on testdata.

Mirrors the reference's runtime story (reference: README.md:117-148,277-283)
Spark-side: build the analysis tables (dims → EAV flatten → facts), run a
tick of incremental refresh, execute a parameterized report, and print a
training-data health check — all against /root/testdata parquet.

    python examples/run_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmrs_module_mamba_etl_spark import get_spark
from openmrs_module_mamba_etl_spark.operators.flatten import FlattenSpec, flatten
from openmrs_module_mamba_etl_spark.operators.incremental import (
    WatermarkStore,
    incremental_refresh_parquet,
)
from openmrs_module_mamba_etl_spark.operators.profile import profile_table
from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry
from openmrs_module_mamba_etl_spark.sources.parquet import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = tempfile.mkdtemp(prefix="mamba_demo_")
    spark = get_spark(app_name="mamba-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. EAV flatten: events plays the obs long table (entity=user_id,
    #    attribute=event_type) — one wide row per user, latest value wins.
    events = table(spark, sf_dir, "events")
    spec = FlattenSpec(
        entity_col="user_id", attr_col="event_type", value_col="value", order_col="ts"
    )
    wide = flatten(events, spec)
    wide.write.mode("overwrite").parquet(f"{out}/flat_user_events")
    print(f"flat table: {wide.count()} rows x {len(wide.columns)} cols -> {out}")

    # 2. Incremental tick: orders as the audited source table.
    store = WatermarkStore(f"{out}/watermarks.json")
    refreshed = incremental_refresh_parquet(
        spark,
        table(spark, sf_dir, "orders"),
        f"{out}/dim_orders",
        keys=["o_orderkey"],
        audit_col="o_orderdate",
        store=store,
        table="dim_orders",
    )
    print(f"incremental target: {refreshed.count()} rows, watermark="
          f"{store.get('dim_orders')}")

    # 3. Star-schema build + materialize, then a parameterized report over
    #    the materialized views (reference REST surface, README.md:277-328).
    from openmrs_module_mamba_etl_spark.plans.clinical import run_clinical_pipeline
    from openmrs_module_mamba_etl_spark.plans.pipeline import materialize

    ctx = run_clinical_pipeline(spark, sf_dir)
    paths = materialize(spark, ctx, f"{out}/analysis")
    print(f"analysis store: {len(paths)} tables under {out}/analysis")

    reg = ReportRegistry.from_json(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "reports.json")
    )
    print("report latest_purchase_by_user:",
          reg.run_json(spark, "latest_purchase_by_user",
                       segment="BUILDING", max_user_id=50)[:160])
    print("report total_orders_1997:",
          reg.run(spark, "total_orders_1997").first().asDict())

    # 4. Corpus health: one-pass profile of the documents table.
    profile_table(table(spark, sf_dir, "documents")).show(truncate=False)


if __name__ == "__main__":
    main()
