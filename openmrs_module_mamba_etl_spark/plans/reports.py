"""Parameterized report service — the REST report surface, Spark-side.

The reference serves reports over HTTP (reference: README.md:277-283
``GET .../mamba/report?report_id=...``): look up the id in reports.json,
bind named+typed params (reference: README.md:297-307), run the SQL against
the analysis DB. Here: look up the id in the same JSON shape, validate and
bind params through Spark's parameterized SQL (injection-safe — values never
enter the query text), translate the MySQL dialect, and return a DataFrame
the caller serializes (``to_json`` mirrors the REST response shape).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from openmrs_module_mamba_etl_spark.functions.dialect import translate_mysql
from openmrs_module_mamba_etl_spark.sources.config import (
    ReportDefinition,
    load_report_definitions,
)

_INT_TYPES = re.compile(r"^(INT|INTEGER|BIGINT|SMALLINT|TINYINT)", re.IGNORECASE)
_FLOAT_TYPES = re.compile(r"^(FLOAT|DOUBLE|DECIMAL|NUMERIC|REAL)", re.IGNORECASE)


class ReportRegistry:
    """report_id → definition, with typed parameter binding."""

    def __init__(self, definitions: list[ReportDefinition] | None = None):
        self._defs: dict[str, ReportDefinition] = {}
        for d in definitions or []:
            self.add(d)

    @classmethod
    def from_json(cls, path: str) -> "ReportRegistry":
        return cls(load_report_definitions(path))

    def add(self, definition: ReportDefinition) -> None:
        self._defs[definition.report_id] = definition

    def ids(self) -> list[str]:
        return sorted(self._defs)

    def get(self, report_id: str) -> ReportDefinition:
        try:
            return self._defs[report_id]
        except KeyError:
            raise KeyError(
                f"unknown report_id {report_id!r}; known: {self.ids()}"
            ) from None

    @staticmethod
    def _coerce(value: Any, sql_type: str) -> Any:
        """Coerce a request-string param to its declared SQL type
        (reference type surface: VARCHAR(255)/INT/... — README.md:300-306)."""
        if value is None:
            return None
        if _INT_TYPES.match(sql_type):
            return int(value)
        if _FLOAT_TYPES.match(sql_type):
            return float(value)
        return str(value)

    def run(self, spark: SparkSession, report_id: str, **params: Any) -> DataFrame:
        """Execute a report with named-parameter binding.

        Missing or extra parameters raise before any Spark job starts,
        mirroring the reference's declared-params contract.
        """
        d = self.get(report_id)
        declared = {p.name: p.type for p in d.query_params}
        missing = sorted(set(declared) - set(params))
        extra = sorted(set(params) - set(declared))
        if missing:
            raise ValueError(f"report {report_id!r} missing params: {missing}")
        if extra:
            raise ValueError(f"report {report_id!r} got undeclared params: {extra}")
        bound = {k: self._coerce(v, declared[k]) for k, v in params.items()}
        sql = translate_mysql(d.sql_query)
        return spark.sql(sql, args=bound) if bound else spark.sql(sql)

    def run_json(
        self,
        spark: SparkSession,
        report_id: str,
        max_rows: int = 10_000,
        **params: Any,
    ) -> str:
        """REST-response analog: the report result as a JSON array string.

        Reference reports are bounded lists (indicator tables, line lists);
        a runaway report SQL must not materialize an unbounded result on
        the driver. Rows stream through ``toLocalIterator`` (one partition
        resident at a time) and the response is capped at ``max_rows`` —
        overflow raises, which the HTTP layer maps to a 400.
        """
        df = self.run(spark, report_id, **params)
        out: list[str] = []
        for row in df.toJSON().toLocalIterator():
            if len(out) >= max_rows:
                raise ValueError(
                    f"report {report_id!r} exceeds max_rows={max_rows}; "
                    "narrow the report query or raise the cap"
                )
            out.append(row)
        return "[" + ",".join(out) + "]"
