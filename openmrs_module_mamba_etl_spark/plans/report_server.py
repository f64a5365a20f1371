"""Minimal HTTP surface for the report service.

The reference serves reports at
``GET <EMR_URL>/openmrs/ws/rest/v1/mamba/report?report_id=...`` with any
declared query params bound from the query string (reference:
README.md:277-307). This module binds :class:`ReportRegistry` to a port
with a stdlib threading HTTP server — no web framework, the engine stays a
library and the server is an optional ~100-line adapter.

Request → response mapping:

- ``GET /ws/rest/v1/mamba/report?report_id=X&p1=v1`` → 200, JSON body
  ``{"report_id": X, "results": [...rows...]}`` (rows exactly as
  ``ReportRegistry.run_json`` serializes them);
- unknown ``report_id`` → 404; missing/undeclared params → 400 with the
  registry's error message; missing ``report_id`` → 400.

Spark note: the driver hosting the SparkSession also hosts this server;
concurrent requests submit concurrent Spark jobs, which the scheduler
interleaves (same property run_per_type relies on). Reports are
interactive aggregates over already-flattened tables, so per-request work
is a short job, not a pipeline run.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qsl, urlparse

from pyspark.sql import SparkSession

from openmrs_module_mamba_etl_spark.plans.reports import ReportRegistry

REPORT_PATH = "/ws/rest/v1/mamba/report"


def _make_handler(spark: SparkSession, registry: ReportRegistry):
    class ReportHandler(BaseHTTPRequestHandler):
        def log_message(self, fmt: str, *args) -> None:  # quiet test runs
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self) -> None:  # noqa: N802 — BaseHTTPRequestHandler API
            url = urlparse(self.path)
            if url.path.rstrip("/") != REPORT_PATH:
                self._send(404, {"error": f"unknown path {url.path!r}"})
                return
            params = dict(parse_qsl(url.query))
            report_id = params.pop("report_id", None)
            if report_id is None:
                self._send(400, {"error": "report_id query param is required"})
                return
            try:
                # max_rows is a transport control, not a report param: it
                # caps driver-side materialization (overflow → 400 below).
                max_rows = int(params.pop("max_rows", 10_000))
                rows_json = registry.run_json(
                    spark, report_id, max_rows=max_rows, **params
                )
            except KeyError as e:
                self._send(404, {"error": str(e)})
                return
            except ValueError as e:
                self._send(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 — transport boundary
                # anything else (a Spark analysis error from a bad report
                # definition, a Py4J failure mid-job) must still produce
                # an HTTP response: unhandled, BaseHTTPRequestHandler
                # closes the socket with no status and the client sees a
                # bare connection reset instead of a diagnosable error
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            # run_json already produced the JSON array; splice it verbatim
            body = (
                '{"report_id": %s, "results": %s}'
                % (json.dumps(report_id), rows_json)
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return ReportHandler


class ReportServer:
    """Threaded HTTP server wrapping a ReportRegistry; context-manager."""

    def __init__(
        self,
        spark: SparkSession,
        registry: ReportRegistry,
        host: str = "127.0.0.1",
        port: int = 0,
    ):
        self._httpd = ThreadingHTTPServer(
            (host, port), _make_handler(spark, registry)
        )
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._started = False

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}{REPORT_PATH}"

    def start(self) -> "ReportServer":
        self._thread.start()
        self._started = True
        return self

    def stop(self) -> None:
        # shutdown() BLOCKS until a running serve_forever loop acks it —
        # calling it on a never-started server would deadlock the caller
        # (e.g. cleanup after failed setup), so only the socket is closed
        # in that case.
        if self._started:
            self._httpd.shutdown()
        self._httpd.server_close()

    def __enter__(self) -> "ReportServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
