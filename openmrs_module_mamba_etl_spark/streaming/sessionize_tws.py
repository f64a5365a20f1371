"""Sessionization on Spark 4's transformWithStateInPandas (TWS) API.

Functional twin of :mod:`.sessionize` (same 6-hour-gap semantics, same
watermark-safe emission contract — the two share one oracle), carried by
the NEW arbitrary-stateful-processing API instead of
``applyInPandasWithState``:

- typed, named state handles (``getValueState`` with a schema) instead of
  one positional state tuple;
- explicit per-key timers (``registerTimer``/``handleExpiredTimer``)
  instead of the single group-state timeout — a key with pending sessions
  re-awakens exactly when its oldest pending session becomes
  watermark-safe, even if the key never receives another event;
- the engine requires the RocksDB state store provider, which is also the
  provider you would run at 100 TB state (changelog checkpointing,
  bounded memory via spill-to-disk).

The session-block merge itself is the same interval-merging kernel the
applyInPandasWithState path uses; both reduce state to one block per
pending session regardless of event volume.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from openmrs_module_mamba_etl_spark.operators.sessionize import (
    DEFAULT_GAP_NS,
    ns_to_ts,
)
from openmrs_module_mamba_etl_spark.streaming.sessionize import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
)

_OUT_COLS = [f.name for f in OUTPUT_SCHEMA.fields]


def _merge_blocks(blocks: list[list], gap_ns: int) -> list[list]:
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
    return merged


class SessionProcessor(StatefulProcessor):
    """Per-key session state machine over TWS value state + timers."""

    def __init__(self, gap_ns: int, ts_col: str, value_col: str):
        self._gap_ns = gap_ns
        self._ts_col = ts_col
        self._value_col = value_col

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState("sessions", STATE_SCHEMA)

    def close(self) -> None:
        pass

    def _load_blocks(self) -> list[list]:
        if not self._state.exists():
            return []
        starts, lasts, ns_, ss = self._state.get()
        return [
            [int(a), int(b), int(c), float(d)]
            for a, b, c, d in zip(starts, lasts, ns_, ss)
        ]

    def _settle(
        self, user_id: int, blocks: list[list], wm_ns: int
    ) -> pd.DataFrame:
        """Merge, emit the watermark-safe prefix, keep + re-time the rest."""
        merged = _merge_blocks(blocks, self._gap_ns)
        done = [m for m in merged if m[1] + self._gap_ns <= wm_ns]
        keep = [m for m in merged if m[1] + self._gap_ns > wm_ns]
        # One live timer per key: drop stale registrations before placing
        # the new one — otherwise every settle pass with pending sessions
        # stacks another timer on hot keys, each firing a redundant pass.
        existing = list(self._handle.listTimers())
        if keep:
            self._state.update(
                (
                    [m[0] for m in keep],
                    [m[1] for m in keep],
                    [m[2] for m in keep],
                    [m[3] for m in keep],
                )
            )
            wm_ms = wm_ns // 1_000_000
            next_ms = -(-(min(m[1] for m in keep) + self._gap_ns) // 1_000_000)
            target = max(wm_ms + 1, next_ms)
            for t in existing:
                if t != target:
                    self._handle.deleteTimer(t)
            if target not in existing:
                self._handle.registerTimer(target)
        else:
            for t in existing:
                self._handle.deleteTimer(t)
            if self._state.exists():
                self._state.clear()
        return pd.DataFrame(
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
            columns=_OUT_COLS,
        )

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_ns = timerValues.getCurrentWatermarkInMs() * 1_000_000
        blocks = self._load_blocks()
        for pdf in rows:
            if len(pdf):
                ts = pdf[self._ts_col].to_numpy(dtype=np.int64)
                val = pdf[self._value_col].to_numpy(dtype=np.float64)
                blocks += [
                    [int(t), int(t), 1, float(v)] for t, v in zip(ts, val)
                ]
        yield self._settle(user_id, blocks, wm_ns)

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_ns = timerValues.getCurrentWatermarkInMs() * 1_000_000
        yield self._settle(user_id, self._load_blocks(), wm_ns)


def streaming_sessionize_tws(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ns: int = DEFAULT_GAP_NS,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """TWS carrier for the session stream (requires the RocksDB state
    store provider — set ``spark.sql.streaming.stateStore.providerClass``
    before starting the query)."""
    with_ts = stream.withColumn("_event_ts", ns_to_ts(ts_col)).withWatermark(
        "_event_ts", watermark_delay
    )
    return with_ts.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionProcessor(gap_ns, ts_col, value_col),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
