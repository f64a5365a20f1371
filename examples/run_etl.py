#!/usr/bin/env python
"""End-to-end MambaETL-on-Spark walkthrough.

Mirrors a reference deployment's full lifecycle (reference: README.md —
ETL run → flat/dim/fact tables → JDBC analysis DB → HTTP report API):

1. run the full ETL (dims, flats, facts) over the source tables;
2. export a finished table to the analysis DB over JDBC (embedded Derby
   here; point ``JdbcSink`` at a MySQL URL in production);
3. serve the parameterized report API over HTTP and query it.

Run: ``python examples/run_etl.py [sf_dir]`` (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmrs_module_mamba_etl_spark.plans.clinical import run_clinical_pipeline
from openmrs_module_mamba_etl_spark.plans.report_server import ReportServer
from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry
from openmrs_module_mamba_etl_spark.session import get_spark
from openmrs_module_mamba_etl_spark.sources.jdbc import JdbcSink


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="mamba-etl-example")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. Full ETL run: one call builds every dim/flat/fact table.
    ctx = run_clinical_pipeline(spark, sf_dir)
    for name in sorted(ctx.tables):
        df = ctx.tables[name]
        df.createOrReplaceTempView(name)
        print(f"built {name}: {df.count()} rows x {len(df.columns)} cols")

    # 2. JDBC export of the flat table, width-capped the way a MySQL
    #    target needs (reference README.md:130-131).
    sink = JdbcSink(url="jdbc:derby:memory:analysis_db;create=true")
    written = sink.write_column_groups(
        ctx.tables["mamba_flat_user_activity"],
        "mamba_flat_user_activity",
        entity_col="user_id",
        max_columns=40,
    )
    print(f"exported over JDBC as: {written}")

    # 3. Reports over HTTP, bound params from the query string.
    registry = ReportRegistry.from_json(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "reports.json")
    )
    with ReportServer(spark, registry) as srv:
        url = f"{srv.url}?report_id=total_orders_1997"
        with urllib.request.urlopen(url, timeout=60) as resp:
            body = json.loads(resp.read())
        print(f"GET {url}\n -> {body}")

    spark.stop()


if __name__ == "__main__":
    main()
