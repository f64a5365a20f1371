"""Periodic ETL scheduling — the MySQL event-scheduler analog.

The reference registers ``CREATE EVENT _mamba_etl_scheduler_event ON SCHEDULE
EVERY ? SECOND ... DO CALL sp_mamba_etl_schedule()`` (reference:
api/src/main/resources/mamba/mamba_main.sql:11-14) with a default interval of
1800 s (reference: README.md:139-140). Two Spark-side carriers:

- :class:`EtlScheduler` — a plain driver loop (batch triggers), exact analog
  of the event scheduler, full or incremental per tick.
- :func:`stream_incremental` — Structured Streaming over a file source with
  ``availableNow``/processing-time triggers and ``foreachBatch`` feeding the
  upsert merge; checkpointed, so restarts resume exactly-once per batch.
"""

from __future__ import annotations

import logging
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

logger = logging.getLogger(__name__)


class EtlScheduler:
    """Driver-loop scheduler: run a pipeline every ``interval`` seconds."""

    def __init__(
        self,
        run_once: Callable[[bool], None],
        interval_seconds: int = 1800,
        incremental: bool = True,
        on_error: str = "raise",
    ):
        if on_error not in ("raise", "continue"):
            raise ValueError(
                f"on_error must be 'raise' or 'continue', got {on_error!r}"
            )
        self.run_once = run_once
        self.interval_seconds = interval_seconds
        self.incremental = incremental
        self.on_error = on_error
        self.ticks = 0
        self.failures = 0
        self.last_error: BaseException | None = None

    def run(self, max_ticks: int | None = None) -> None:
        """Tick until ``max_ticks`` (None = forever). First tick immediate,
        like the reference's setup which runs ETL at module start.

        ``max_ticks`` counts THIS call's ticks; ``self.ticks`` is the
        lifetime total of SUCCESSFUL ticks (it decides full-vs-incremental,
        which must survive across calls — a resumed scheduler must not redo
        the full build, and a FAILED tick must not count: if the initial
        full build dies midway, the retry must be full again, not
        incremental over half-built state).

        ``on_error="continue"`` is the reference's resilience model: MySQL
        fires each scheduled event independently, so one failing
        ``sp_mamba_etl_schedule`` CALL doesn't cancel future events
        (reference: mamba_main.sql:11-14 — ``ON SCHEDULE EVERY ? SECOND``
        has no failure linkage between executions). A transient tick
        failure (source briefly unreadable, a concurrent-maintenance race)
        is logged and counted (``failures``/``last_error``) and the loop
        keeps its cadence. The default ``"raise"`` preserves fail-fast for
        drain-N-ticks batch callers, where an exception must surface to
        the driver.
        """
        call_ticks = 0
        while max_ticks is None or call_ticks < max_ticks:
            start = time.monotonic()
            # First tick is a full build even in incremental deployments —
            # the reference behaves the same (no state ⇒ full refresh).
            try:
                self.run_once(self.incremental and self.ticks > 0)
            except Exception as e:  # noqa: BLE001 — tick isolation boundary
                if self.on_error != "continue":
                    raise
                self.failures += 1
                self.last_error = e
                logger.warning(
                    "scheduler tick failed (%d failures so far); "
                    "next tick keeps the cadence: %s: %s",
                    self.failures, type(e).__name__, e,
                )
            else:
                self.ticks += 1
            call_ticks += 1
            if max_ticks is not None and call_ticks >= max_ticks:
                break
            elapsed = time.monotonic() - start
            time.sleep(max(0.0, self.interval_seconds - elapsed))


def stream_incremental(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    checkpoint_dir: str,
    batch_fn: Callable[[DataFrame, int], None],
    available_now: bool = True,
    processing_interval: str | None = None,
    fmt: str = "parquet",
) -> StreamingQuery:
    """File-source incremental stream → ``foreachBatch(batch_fn)``.

    ``availableNow=True`` (the default) drains everything new then stops —
    the idiomatic periodic-batch trigger. Passing ``processing_interval``
    (e.g. ``"1800 seconds"``) selects the reference's resident scheduler
    and overrides the drain-once default; asking for both explicitly is a
    contradiction and raises. The checkpoint tracks which source files
    were consumed — the streaming-native watermark.
    """
    if processing_interval and available_now:
        # available_now's default True must not silently win over an
        # explicit interval — the caller asked for a resident scheduler.
        available_now = False
    reader = spark.readStream.format(fmt).schema(schema).load(source_dir)
    writer = reader.writeStream.foreachBatch(batch_fn).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
