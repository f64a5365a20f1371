"""Ordered ETL step registry — the Spark analog of the reference's
``sp_makefile`` + orchestrator stored procedure.

The reference compiles an ordered list of stored procedures (reference:
omod/src/main/resources/_etl/sp_makefile:1-14 — base SPs, then derived SPs,
then one orchestrator ``sp_mamba_data_processing_etl`` that CALLs them all;
sp_mamba_data_processing_etl.sql:3-12). Here each step is a Python function
``step(spark, ctx) -> DataFrame | None``; steps registered earlier run
earlier (base dims → flatteners → derived facts), and each step's output is
published to ``ctx.tables`` and as a temp view so later steps and report
queries can reference it by name.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class PipelineContext:
    """Run-scoped state shared across steps."""

    sf_dir: str
    incremental: bool = False
    tables: dict[str, DataFrame] = field(default_factory=dict)
    params: dict[str, object] = field(default_factory=dict)


Step = Callable[[SparkSession, PipelineContext], "DataFrame | None"]


class MambaPipeline:
    """Ordered registry of ETL build steps with optional table publication."""

    def __init__(self) -> None:
        self._steps: list[tuple[str, Step, bool]] = []

    def register(self, name: str, publish: bool = True) -> Callable[[Step], Step]:
        """Decorator: append a step; ``publish`` exposes its DataFrame as a
        temp view named after the step (the analysis-DB table analog)."""

        def deco(fn: Step) -> Step:
            self._steps.append((name, fn, publish))
            return fn

        return deco

    def step_names(self) -> list[str]:
        return [n for n, _, _ in self._steps]

    def run(
        self, spark: SparkSession, sf_dir: str, incremental: bool = False
    ) -> PipelineContext:
        """Execute all steps in registration order (full or incremental).

        Mirrors ``sp_mamba_etl_schedule`` → orchestrator → base+derived SPs
        (reference: mamba_main.sql:11-14); the incremental flag is threaded
        to every step exactly like the SP's ``etl_incremental_mode`` arg.
        """
        ctx = PipelineContext(sf_dir=sf_dir, incremental=incremental)
        for name, fn, publish in self._steps:
            out = fn(spark, ctx)
            if out is not None and publish:
                ctx.tables[name] = out
                out.createOrReplaceTempView(name)
        return ctx


def materialize(
    spark: SparkSession, ctx: PipelineContext, target_dir: str,
    versioned: bool = True,
) -> dict[str, str]:
    """Write every published table to the analysis store (full refresh).

    The Parquet analog of the reference's drop+recreate analysis-DB tables
    (reference: README.md:146-148); each table lands at
    ``<target_dir>/<table_name>`` and is re-registered as a view over the
    *written* files, so downstream reports read the materialized store, not
    the live lineage — exactly the reference's pre-materialization contract.

    These ARE the served tables (the report registry and REST surface
    read the re-registered views), so publishes default to the
    reader-atomic versioned path — a report query racing a scheduler
    tick's re-materialization resolves one complete committed snapshot
    instead of a mid-overwrite directory (a bare ``overwrite`` deletes
    the directory before rewriting it — both a truncation window and a
    reader window). ``versioned=False`` keeps each table directly
    ``spark.read.parquet``-able.
    """
    import os

    from openmrs_module_mamba_etl_spark.operators.incremental import _publish

    paths: dict[str, str] = {}
    for name, df in ctx.tables.items():
        path = os.path.join(target_dir, name)
        stored = _publish(spark, df, path, versioned)
        stored.createOrReplaceTempView(name)
        # repoint the context too: later steps that reach a table through
        # ctx.tables must read the materialized files, not re-execute the
        # build lineage (which re-scans sources and can diverge from the
        # written store if they change)
        ctx.tables[name] = stored
        paths[name] = path
    return paths
