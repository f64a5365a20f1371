"""Stateful streaming sessionization — `applyInPandasWithState` carrier.

The batch formulation lives in :mod:`..operators.sessionize`; this module
runs the same 6-hour-gap semantics continuously: per-key session state is
kept by the engine's state store, sessions closed by an in-batch gap emit
immediately, and trailing open sessions emit when the event-time watermark
passes ``last_event + gap`` (EventTimeTimeout).

This is the "custom stateful operator" seam: the kernel is an
Arrow-batched pandas function (vectorized gap detection — no per-row
Python), the engine handles grouping, state persistence, checkpointing and
timeout scheduling. At scale, state is hash-partitioned by key across
executors exactly like a shuffle — the operator inherits Spark's state
store sizing/eviction story rather than inventing one.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from openmrs_module_mamba_etl_spark.operators.sessionize import (
    DEFAULT_GAP_NS,
    ns_to_ts,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_ns", LongType()),
        StructField("session_end_ns", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

#: (session_start_ns, last_event_ns, n_events, sum_value)
STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
        StructField("s", DoubleType()),
    ]
)


def _make_kernel(gap_ns: int, ts_col: str, value_col: str):
    """Build the per-group pandas kernel (closure over the gap)."""

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def row(start: int, last: int, n: int, s: float) -> dict:
            return {
                "user_id": int(user_id),
                "session_start_ns": int(start),
                "session_end_ns": int(last),
                "n_events": int(n),
                "sum_value": round(float(s), 2),
            }

        if state.hasTimedOut:
            start, last, n, s = state.get
            state.remove()
            yield pd.DataFrame([row(start, last, n, s)])
            return

        pdf = pd.concat(list(pdfs)).sort_values(ts_col)
        ts = pdf[ts_col].to_numpy(dtype=np.int64)
        val = pdf[value_col].to_numpy(dtype=np.float64)

        carry = state.get if state.exists else None
        # Vectorized gap detection; the carried session supplies the
        # "previous event" for the first row (sentinel forces a new
        # session when no state exists).
        prev0 = carry[1] if carry else ts[0] - gap_ns - 1
        prev = np.concatenate(([prev0], ts[:-1]))
        sid = np.cumsum((ts - prev) > gap_ns)  # 0 ⇒ continues carried session

        out = []
        if carry and sid[0] > 0:  # batch starts a new session → close carried
            out.append(row(*carry))

        bounds = np.flatnonzero(np.concatenate(([True], sid[1:] != sid[:-1])))
        segments = np.split(np.arange(len(ts)), bounds[1:])
        for seg in segments[:-1]:
            st, en = ts[seg[0]], ts[seg[-1]]
            n, s = len(seg), float(val[seg].sum())
            if sid[seg[0]] == 0:  # carried session extended then closed
                st, n, s = carry[0], carry[2] + n, carry[3] + s
            out.append(row(st, en, n, s))

        seg = segments[-1]  # trailing (open) session → state
        st, en = ts[seg[0]], ts[seg[-1]]
        n, s = len(seg), float(val[seg].sum())
        if sid[seg[0]] == 0 and carry:
            st, n, s = carry[0], carry[2] + n, carry[3] + s
        state.update((int(st), int(en), int(n), float(s)))
        # Close the open session when the watermark passes last + gap.
        state.setTimeoutTimestamp((int(en) + gap_ns) // 1_000_000)

        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return kernel


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ns: int = DEFAULT_GAP_NS,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Wire the stateful kernel onto a streaming DataFrame whose ``ts_col``
    is int64 ns-since-epoch. Returns the stream of closed sessions."""
    with_ts = stream.withColumn(
        "_event_ts", ns_to_ts(ts_col)
    ).withWatermark("_event_ts", watermark_delay)
    return with_ts.groupBy(key_col).applyInPandasWithState(
        _make_kernel(gap_ns, ts_col, value_col),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
