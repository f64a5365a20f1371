"""Report registry loaded from the reference-shaped reports.json file
(reference: omod/src/main/resources/_etl/config/reports.json:1-3,
README.md:288-328) + JDBC source option construction."""

from __future__ import annotations

import os

import pytest

from openmrs_module_mamba_etl_spark.inventory.report_queries import _ensure_views
from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry
from openmrs_module_mamba_etl_spark.sources.jdbc import JdbcSource

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "reports.json",
)


def test_registry_from_json_runs(spark, sf_dir):
    reg = ReportRegistry.from_json(EXAMPLES)
    assert reg.ids() == [
        "distinct_buyers_window",
        "latest_purchase_by_user",
        "total_orders_1997",
    ]
    _ensure_views(
        spark, sf_dir, ["mamba_dim_person", "mamba_dim_encounter",
                        "mamba_flat_user_activity"]
    )
    n = reg.run(spark, "total_orders_1997").first()["total_orders_1997"]
    assert n > 0
    out = reg.run_json(
        spark, "latest_purchase_by_user", segment="BUILDING", max_user_id=50
    )
    assert out.startswith("[") and "user_id" in out


def test_jdbc_options_partitioned():
    src = JdbcSource(url="jdbc:mysql://db:3306/openmrs", user="u", password="p")
    opts = src.options(
        "obs", partition_column="obs_id", lower_bound=0,
        upper_bound=1_000_000, num_partitions=64,
    )
    assert opts["partitionColumn"] == "obs_id"
    assert opts["numPartitions"] == "64"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_validation():
    src = JdbcSource(url="jdbc:mysql://db:3306/openmrs", user="u", password="p")
    with pytest.raises(ValueError, match="lower_bound"):
        src.options("obs", partition_column="obs_id")
