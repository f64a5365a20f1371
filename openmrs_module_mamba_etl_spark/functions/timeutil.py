"""Timestamp-normalization helpers for the event stream.

The driver's ``events.parquet`` has shipped ``ts`` under two physical
encodings across testdata generations:

* ``TIMESTAMP(NANOS)`` — Spark's vectorized reader rejects it, so the
  session sets ``spark.sql.legacy.parquet.nanosAsLong`` and the column
  arrives as int64 ns-since-epoch;
* ``TIMESTAMP(MICROS)`` — arrives as a real ``timestamp_ntz``/``timestamp``
  column.

The engine normalizes at the source seam — ``sources/parquet.py:table()``
and ``inventory/window_queries.py:_events_stream()`` route through
:func:`ts_us` to convert a timestamp scan to the canonical int64
ns-since-epoch — so downstream query code always sees bigint ``ts``.
:func:`ts_us` adapts to whichever physical type it is given and returns
**bigint microseconds since the epoch** — the same value DuckDB's
``epoch_us(ts)`` yields on the oracle side (session timezone is pinned to
UTC in session.py and re-pinned at the source seam, so the NTZ→LTZ cast
is wall-clock-identity).

This is a pure column expression — it stays inside whole-stage codegen and
never forces a Python round trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INT_TYPES = {"bigint", "long", "int", "integer"}


def _floor_div_1000(col: str) -> Column:
    """Exact integer ns→µs floor division, matching DuckDB's ``epoch_us``
    floor semantics on pre-1970 (negative) values too.

    ``div`` truncates toward zero; plain ``/`` would round-trip through
    double (ns-since-epoch exceeds 2^53). ``(x - pmod(x, 1000)) div 1000``
    subtracts the non-negative remainder first, so the ``div`` is exact and
    the result is the floor for either sign — still pure codegen.
    """
    return F.expr(f"(({col} - pmod({col}, 1000)) div 1000)")


def ts_us(df: DataFrame, col: str = "ts") -> Column:
    """Microseconds-since-epoch for ``df[col]`` regardless of physical type.

    int64 input is assumed ns-since-epoch (the legacy nanosAsLong read path)
    and floor-divided by 1000; timestamp input goes through ``unix_micros``.
    """
    dtype = dict(df.dtypes).get(col, "")
    if dtype in _INT_TYPES:
        return _floor_div_1000(col)
    return F.unix_micros(F.col(col).cast("timestamp"))


def ts_timestamp(df: DataFrame, col: str = "ts") -> Column:
    """``df[col]`` as a session-tz TIMESTAMP regardless of physical type."""
    dtype = dict(df.dtypes).get(col, "")
    if dtype in _INT_TYPES:
        return F.timestamp_micros(_floor_div_1000(col))
    return F.col(col).cast("timestamp")
