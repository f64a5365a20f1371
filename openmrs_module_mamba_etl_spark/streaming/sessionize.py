"""Stateful streaming sessionization — `applyInPandasWithState` carrier.

The batch formulation lives in :mod:`..operators.sessionize`; this module
runs the same 6-hour-gap semantics continuously: per-key sessions are kept
in the engine's state store and a session emits ONLY once the event-time
watermark passes ``last_event + gap`` — the point after which no
late-but-admissible event could still extend or merge it. (Emitting on
in-batch gap evidence alone would be retractable: a later batch may carry
an older-but-within-watermark event that belonged to the "closed" session,
and append mode cannot retract.) Sessions are merged as atomic
[start, last] blocks under the gap rule, so late events that bridge two
pending sessions collapse them exactly as a batch re-run would.

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
    ArrayType,
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

#: Parallel arrays, one entry per not-yet-watermark-safe session (the
#: trailing open session included) — a key's pending sessions, oldest first.
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),
        StructField("lasts", ArrayType(LongType())),
        StructField("ns", ArrayType(LongType())),
        StructField("ss", ArrayType(DoubleType())),
    ]
)


def _make_kernel(gap_ns: int, ts_col: str, value_col: str):
    """Build the per-group pandas kernel (closure over the gap)."""

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_ms = state.getCurrentWatermarkMs()
        wm_ns = wm_ms * 1_000_000

        # blocks: [start, last, n, sum] — state sessions + batch events as
        # singletons. Sessionization is interval merging under the gap
        # rule, which treats an aggregated block exactly like its events.
        blocks: list[list] = []
        if state.exists:
            starts, lasts, ns_, ss = state.get
            blocks = [
                [int(a), int(b), int(c), float(d)]
                for a, b, c, d in zip(starts, lasts, ns_, ss)
            ]
        if not state.hasTimedOut:
            pdf = pd.concat(list(pdfs))
            if len(pdf):
                ts = pdf[ts_col].to_numpy(dtype=np.int64)
                val = pdf[value_col].to_numpy(dtype=np.float64)
                blocks += [
                    [int(t), int(t), 1, float(v)] for t, v in zip(ts, val)
                ]

        blocks.sort(key=lambda b: (b[0], b[1]))
        merged: list[list] = []
        for b in blocks:
            if merged and b[0] - merged[-1][1] <= gap_ns:
                m = merged[-1]
                m[1] = max(m[1], b[1])
                m[2] += b[2]
                m[3] += b[3]
            else:
                merged.append(list(b))

        # Emit only watermark-safe sessions (nothing admissible can still
        # touch them); everything else — trailing open session included —
        # stays in state until its own timeout.
        done = [m for m in merged if m[1] + gap_ns <= wm_ns]
        keep = [m for m in merged if m[1] + gap_ns > wm_ns]

        if keep:
            state.update(
                (
                    [m[0] for m in keep],
                    [m[1] for m in keep],
                    [m[2] for m in keep],
                    [m[3] for m in keep],
                )
            )
            next_ms = -(-(min(m[1] for m in keep) + gap_ns) // 1_000_000)
            state.setTimeoutTimestamp(max(wm_ms + 1, next_ms))
        elif state.exists:
            state.remove()

        yield pd.DataFrame(
            [
                {
                    "user_id": int(user_id),
                    "session_start_ns": int(m[0]),
                    "session_end_ns": int(m[1]),
                    "n_events": int(m[2]),
                    "sum_value": round(float(m[3]), 2),
                }
                for m in done
            ],
            columns=[f.name for f in OUTPUT_SCHEMA.fields],
        )

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
