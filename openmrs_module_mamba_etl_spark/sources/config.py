"""JSON configuration sources: flattening configs + report definitions.

The reference drives its flattener with per-table JSON configs under
``_etl/config`` (reference: README.md:243-253, pom.xml:289-291) and its report
service with ``reports.json`` (reference:
omod/src/main/resources/_etl/config/reports.json:1-3, README.md:288-328).
The same JSON shapes are accepted here; they are driver-side configuration,
not data, so plain ``json`` parsing is correct (no ``spark.read.json``).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any


@dataclass(frozen=True)
class FlattenTableConfig:
    """One flat-table spec: the Spark analog of a reference flattening config
    (reference: README.md:249-253 — table name + column↦concept mapping).

    ``columns`` maps output column name → source attribute (concept) name.
    Empty mapping ⇒ dynamic schema: attributes discovered from the data
    (reference: README.md:246-248 auto-generated configs).
    """

    table_name: str
    encounter_type: str | None = None
    columns: dict[str, str] = field(default_factory=dict)

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "FlattenTableConfig":
        return FlattenTableConfig(
            table_name=obj["table_name"],
            encounter_type=obj.get("encounter_type"),
            columns=dict(obj.get("columns", {})),
        )


@dataclass(frozen=True)
class ReportParam:
    """Named, SQL-typed report parameter (reference: README.md:297-307)."""

    name: str
    type: str  # e.g. VARCHAR(255), INT, DATE


@dataclass(frozen=True)
class ReportDefinition:
    """One report: id + SQL + typed params (reference: README.md:288-328)."""

    report_name: str
    report_id: str
    sql_query: str
    query_params: tuple[ReportParam, ...] = ()

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "ReportDefinition":
        sql = obj["report_sql"]
        return ReportDefinition(
            report_name=obj.get("report_name", obj["report_id"]),
            report_id=obj["report_id"],
            sql_query=sql["sql_query"],
            query_params=tuple(
                ReportParam(p["name"], p["type"])
                for p in sql.get("query_params", [])
            ),
        )


def load_report_definitions(path: str | Path) -> list[ReportDefinition]:
    """Parse a reports.json-shaped file: ``{"report_definitions": [...]}``."""
    obj = json.loads(Path(path).read_text())
    return [ReportDefinition.from_json(r) for r in obj["report_definitions"]]


def load_flatten_configs(path: str | Path) -> list[FlattenTableConfig]:
    """Parse a directory of flat-table JSON configs or a single JSON list."""
    p = Path(path)
    if p.is_dir():
        return [
            FlattenTableConfig.from_json(json.loads(f.read_text()))
            for f in sorted(p.glob("*.json"))
        ]
    loaded = json.loads(p.read_text())
    if isinstance(loaded, dict):
        loaded = [loaded]
    return [FlattenTableConfig.from_json(o) for o in loaded]
