"""End-to-end HTTP tests for the report REST surface (reference:
README.md:277-307 — GET .../ws/rest/v1/mamba/report?report_id=...)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.parse
import urllib.request

import pytest

from openmrs_module_mamba_etl_spark.inventory.report_queries import _ensure_views
from openmrs_module_mamba_etl_spark.plans.report_server import ReportServer
from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "reports.json",
)


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    reg = ReportRegistry.from_json(EXAMPLES)
    _ensure_views(
        spark,
        sf_dir,
        ["mamba_dim_person", "mamba_dim_encounter", "mamba_flat_user_activity"],
    )
    with ReportServer(spark, reg) as srv:
        yield srv


def _get(url: str):
    try:
        with urllib.request.urlopen(url, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_get_report_no_params(server, spark):
    status, body = _get(f"{server.url}?report_id=total_orders_1997")
    assert status == 200
    assert body["report_id"] == "total_orders_1997"
    assert body["results"][0]["total_orders_1997"] > 0


def test_get_report_bound_params_matches_registry(server, spark):
    q = urllib.parse.urlencode(
        {
            "report_id": "latest_purchase_by_user",
            "segment": "BUILDING",
            "max_user_id": "50",
        }
    )
    status, body = _get(f"{server.url}?{q}")
    assert status == 200
    # the HTTP rows must equal the in-process registry result exactly
    reg = ReportRegistry.from_json(EXAMPLES)
    expect = json.loads(
        reg.run_json(
            spark, "latest_purchase_by_user", segment="BUILDING", max_user_id="50"
        )
    )
    assert body["results"] == expect
    assert len(expect) > 0


def test_get_unknown_report_is_404(server):
    status, body = _get(f"{server.url}?report_id=nope")
    assert status == 404
    assert "nope" in body["error"]


def test_get_missing_param_is_400(server):
    status, body = _get(f"{server.url}?report_id=latest_purchase_by_user")
    assert status == 400
    assert "missing params" in body["error"]


def test_get_undeclared_param_is_400(server):
    status, body = _get(
        f"{server.url}?report_id=total_orders_1997&bogus=1"
    )
    assert status == 400
    assert "undeclared" in body["error"]


def test_get_missing_report_id_is_400(server):
    status, body = _get(server.url)
    assert status == 400


def test_get_wrong_path_is_404(server):
    status, _ = _get(server.url.replace("/mamba/report", "/other"))
    assert status == 404


def test_row_cap_overflow_is_400_and_bounded(server):
    """A runaway report must not materialize unboundedly driver-side:
    run_json streams via toLocalIterator and raises past max_rows, which
    the HTTP layer maps to 400."""
    q = urllib.parse.urlencode(
        {
            "report_id": "latest_purchase_by_user",
            "segment": "BUILDING",
            "max_user_id": "50",
            "max_rows": "1",
        }
    )
    status, body = _get(f"{server.url}?{q}")
    assert status == 400
    assert "max_rows" in body["error"]


def test_row_cap_under_limit_passes(server):
    q = urllib.parse.urlencode(
        {
            "report_id": "total_orders_1997",
            "max_rows": "5",
        }
    )
    status, body = _get(f"{server.url}?{q}")
    assert status == 200
    assert body["results"][0]["total_orders_1997"] > 0


def test_unexpected_engine_error_is_500_not_connection_drop(spark, sf_dir):
    """A report whose SQL fails inside Spark (missing table) must come
    back as an HTTP 500 with the error named — unhandled, the stdlib
    handler closes the socket with no status and the client sees a bare
    connection reset."""
    from openmrs_module_mamba_etl_spark.sources.config import ReportDefinition

    reg = ReportRegistry(
        [
            ReportDefinition(
                report_name="broken",
                report_id="broken",
                sql_query="SELECT * FROM table_that_does_not_exist_xyz",
            )
        ]
    )
    with ReportServer(spark, reg) as srv:
        status, body = _get(f"{srv.url}?report_id=broken")
    assert status == 500
    assert "table_that_does_not_exist_xyz" in body["error"]
