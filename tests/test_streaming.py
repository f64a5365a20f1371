"""Structured Streaming incremental layer: availableNow file-source ticks
with foreachBatch upsert into a parquet target, checkpointed exactly-once.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from openmrs_module_mamba_etl_spark.operators.incremental import merge_upsert
from openmrs_module_mamba_etl_spark.streaming.scheduler import (
    EtlScheduler,
    stream_incremental,
)

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("v", StringType(), True),
    ]
)


def _write_batch(spark, src_dir: str, rows, name: str):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)


def test_stream_incremental_ticks(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")

    applied_batches = []

    def upsert(batch_df, batch_id):
        applied_batches.append((batch_id, batch_df.count()))
        if Path(target).exists():
            base = spark.read.parquet(target)
            merged = merge_upsert(base, batch_df, ["id"])
        else:
            merged = batch_df
        merged.write.mode("overwrite").parquet(target + ".stage")
        import os
        import shutil

        if Path(target).exists():
            shutil.rmtree(target)
        os.replace(target + ".stage", target)

    _write_batch(spark, src, [(1, "a"), (2, "b")], "b1")
    q = stream_incremental(spark, src, SCHEMA, ckpt, upsert, available_now=True)
    q.awaitTermination(60)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a"),
        (2, "b"),
    }

    # tick 2: an update for id=2 and a new id=3 arrive as a new file;
    # the checkpoint must skip the already-consumed first file.
    _write_batch(spark, src, [(2, "B"), (3, "c")], "b2")
    q2 = stream_incremental(spark, src, SCHEMA, ckpt, upsert, available_now=True)
    q2.awaitTermination(60)
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
    }
    # exactly-once per file: second tick saw only the 2 new rows
    assert applied_batches[-1][1] == 2


HOUR_NS = 3600 * 1_000_000_000
T0 = 1_700_000_000 * 1_000_000_000  # arbitrary epoch base, ns

EV_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), True),
        StructField("ts", LongType(), True),
        StructField("value", DoubleType(), True),
    ]
)


def _drain_sessions(spark, src, ckpt, target):
    """availableNow drain into a parquet sink (checkpoint-recoverable,
    unlike the memory sink); returns the cumulative emitted-session set."""
    from openmrs_module_mamba_etl_spark.streaming.sessionize import (
        streaming_sessionize,
    )

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        streaming_sessionize(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], r["session_start_ns"], r["session_end_ns"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(target).collect()
    }


def test_streaming_sessionize_gap_close_and_timeout(spark, tmp_path):
    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    target = str(tmp_path / "sessions")

    # batch 1 — user 1: two events 1 h apart (one open session);
    # user 2: events 10 h apart (first session closed by the in-batch gap).
    b1 = [
        (1, T0, 1.0),
        (1, T0 + HOUR_NS, 2.0),
        (2, T0, 5.0),
        (2, T0 + 10 * HOUR_NS, 7.0),
    ]
    spark.createDataFrame(b1, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    got1 = _drain_sessions(spark, src, ckpt, target)
    # user 2 session 1 closed by the in-batch gap; user 1's session times
    # out in the trailing no-data micro-batch (watermark reaches T0+9h,
    # past its T0+1h+6h timeout). User 2's open session survives.
    assert got1 == {
        (2, T0, T0, 1, 5.0),
        (1, T0, T0 + HOUR_NS, 2, 3.0),
    }

    # batch 2 — an event 30 days later advances the watermark far enough
    # that user 2's open session (last event T0+10h, timeout at +6h) times
    # out; user 1's already-emitted session must NOT re-emit.
    b2 = [(1, T0 + 30 * 24 * HOUR_NS, 9.0)]
    spark.createDataFrame(b2, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    new2 = _drain_sessions(spark, src, ckpt, target) - got1
    assert (2, T0 + 10 * HOUR_NS, T0 + 10 * HOUR_NS, 1, 7.0) in new2
    assert not any(r[0] == 1 for r in new2)


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Closed sessions emitted by the stream == batch gaps-and-islands
    sessionization of the same data (minus still-open trailing sessions)."""
    from openmrs_module_mamba_etl_spark.operators.sessionize import session_stats

    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    target = str(tmp_path / "sessions")
    rows = [
        (u, T0 + i * 4 * HOUR_NS + u * HOUR_NS // 7, float(u * 10 + i))
        for u in (1, 2, 3)
        for i in (0, 1, 2)  # 4 h spacing < 6 h gap ⇒ one session each...
    ] + [
        (2, T0 + 100 * HOUR_NS, 99.0),  # ...except user 2: second session
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    streamed = _drain_sessions(spark, src, ckpt, target)

    batch = {
        (r["user_id"], r["session_start_ns"], r["session_end_ns"], r["n_events"], r["sum_value"])
        for r in session_stats(
            spark.read.parquet(src), "user_id", "ts", "value"
        ).collect()
    }
    # every streamed (closed) session appears identically in the batch result
    assert streamed <= batch
    # the only still-open session is user 2's trailing one — its timeout
    # (last + 6 h) is beyond the final watermark (max event − 1 h); users 1
    # and 3 timed out because user 2's late event advanced the watermark.
    assert len(batch) - len(streamed) == 1
    missing = batch - streamed
    assert [r[0] for r in missing] == [2]


def test_etl_scheduler_ticks():
    seen = []
    sched = EtlScheduler(
        run_once=lambda inc: seen.append(inc),
        interval_seconds=0,
        incremental=True,
    )
    sched.run(max_ticks=3)
    # first tick full (False), later ticks incremental (True)
    assert seen == [False, True, True]
    # a resumed run() ticks again (max_ticks is per-call) and must NOT
    # redo the full build — lifetime state says it already ran
    sched.run(max_ticks=2)
    assert seen == [False, True, True, True, True]


def test_etl_scheduler_on_error_continue_keeps_cadence():
    """Reference parity (mamba_main.sql:11-14): MySQL fires each scheduled
    event independently — one failing CALL doesn't cancel future events.
    on_error='continue' must log-and-keep-ticking, and a FAILED tick must
    not count toward full-vs-incremental state: if the initial full build
    dies midway, the retry is full again, not incremental over half-built
    state."""
    seen = []

    def run_once(inc):
        seen.append(inc)
        if len(seen) in (1, 3):  # first (full) tick and one later tick fail
            raise RuntimeError(f"transient failure on call {len(seen)}")

    sched = EtlScheduler(
        run_once, interval_seconds=0, incremental=True, on_error="continue"
    )
    sched.run(max_ticks=5)
    # call 1 full (failed) -> call 2 full again (retry of the full build),
    # calls 3-5 incremental (ticks>0 after call 2 succeeded), call 3's
    # failure doesn't demote later ticks back to full
    assert seen == [False, False, True, True, True]
    assert sched.ticks == 3  # successful ticks only
    assert sched.failures == 2
    assert isinstance(sched.last_error, RuntimeError)
    assert "call 3" in str(sched.last_error)


def test_etl_scheduler_default_raises_fail_fast():
    def run_once(inc):
        raise RuntimeError("boom")

    sched = EtlScheduler(run_once, interval_seconds=0)
    with pytest.raises(RuntimeError, match="boom"):
        sched.run(max_ticks=3)
    assert sched.ticks == 0

    with pytest.raises(ValueError, match="on_error"):
        EtlScheduler(run_once, on_error="retry")


def test_streaming_windowed_counts_matches_batch(spark, tmp_path):
    """Append-mode tumbling windows: emitted set == batch window aggregate
    restricted to windows finalized by the final watermark."""
    from openmrs_module_mamba_etl_spark.operators.sessionize import ns_to_ts
    from openmrs_module_mamba_etl_spark.streaming.windows import windowed_counts

    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    target = str(tmp_path / "out")
    DAY = 24 * HOUR_NS
    # calendar-day windows need a midnight-aligned base (T0 itself is 22:25)
    T0D = (1_700_000_000 - 1_700_000_000 % 86_400) * 1_000_000_000
    rows = [
        (1, T0D + 1 * HOUR_NS, 1.0),          # day 0
        (2, T0D + 2 * HOUR_NS, 2.0),          # day 0
        (1, T0D + DAY + 3 * HOUR_NS, 4.0),    # day 1
        (1, T0D + 3 * DAY, 8.0),              # day 3 — watermark driver
    ]
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(EV_SCHEMA).parquet(src)
    q = (
        windowed_counts(stream, window="1 day", watermark_delay="1 hour")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["window_end"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(target).collect()
    }

    batch_src = spark.read.parquet(src).withColumn("_event_ts", ns_to_ts("ts"))
    batch = {
        (r["w"]["start"], r["w"]["end"], r["n_events"], r["sum_value"])
        for r in batch_src.groupBy(F.window("_event_ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    # day-0 and day-1 windows finalized (watermark = day3 - 1h); the
    # day-3 window holds the watermark-driving event and stays in state
    assert len(streamed) == 2
    assert streamed < batch
    open_windows = batch - streamed
    assert {r[2] for r in open_windows} == {1}  # only the day-3 singleton


def test_streaming_dedup_exactly_once_across_batches(spark, tmp_path):
    """dropDuplicates state spans micro-batches: a key re-arriving in a
    LATER batch is dropped, so the emission set == distinct keys."""
    from openmrs_module_mamba_etl_spark.streaming.dedup import streaming_dedup

    src, ckpt = str(tmp_path / "docs"), str(tmp_path / "ckpt")
    target = str(tmp_path / "out")
    doc_schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
        ]
    )
    # two files => availableNow may split batches; dup keys span the files
    spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], doc_schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, "ALPHA   beta"), (4, "delta")], doc_schema  # 3 dups 1 after norm
    ).coalesce(1).write.mode("append").parquet(src)

    from openmrs_module_mamba_etl_spark.functions.text import content_hash

    stream = spark.readStream.schema(doc_schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        streaming_dedup(stream, content_hash(F.col("text")))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", target)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = [r["content_hash"] for r in spark.read.parquet(target).collect()]
    assert len(emitted) == len(set(emitted)) == 3  # alpha-beta, gamma, delta

    batch = (
        spark.read.parquet(src)
        .select(content_hash(F.col("text")).alias("h"))
        .distinct()
    )
    assert set(emitted) == {r["h"] for r in batch.collect()}


def test_streaming_dedup_within_watermark_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark collapses near-in-time duplicates but
    re-admits a key after state eviction — bounded-state semantics."""
    from openmrs_module_mamba_etl_spark.streaming.dedup import (
        streaming_dedup_within_watermark,
    )

    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    target = str(tmp_path / "out")
    schema = StructType(
        [
            StructField("k", StringType(), True),
            StructField("ts", LongType(), True),
        ]
    )
    T0 = 1_700_000_000 * 1_000_000_000

    def drain():
        # sequential availableNow drains over one checkpoint = guaranteed
        # batch order (state eviction lags one batch: a key expires only
        # after a LATER batch advances the watermark past firstSeen+delay)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_dedup_within_watermark(
                stream, F.col("k"), ts_col="ts", delay="1 hour", key_name="k"
            )
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", target)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: A twice within the delay (collapse) + B
    spark.createDataFrame(
        [("A", T0), ("A", T0 + HOUR_NS // 2), ("B", T0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    # batch 2: watermark driver → advances watermark past A's expiry
    spark.createDataFrame(
        [("C", T0 + 10 * HOUR_NS)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()
    # batch 3: A re-arrives after eviction — admitted again
    spark.createDataFrame(
        [("A", T0 + 48 * HOUR_NS)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    drain()

    out = [r["k"] for r in spark.read.parquet(target).collect()]
    assert sorted(out) == ["A", "A", "B", "C"]  # A re-admitted after eviction


def test_streaming_sessionize_late_event_merges_pending(spark, tmp_path):
    """A late-but-admissible event must MERGE into the pending session it
    belongs to, not fork a retractable duplicate — the reason sessions
    emit only once watermark-safe."""
    src, ckpt = str(tmp_path / "ev"), str(tmp_path / "ckpt")
    target = str(tmp_path / "sessions")

    # batch 1: events at 0h and 20h -> watermark 19h. Session [0,0] is
    # watermark-safe (0+6h <= 19h) and emits; [20,20] stays pending.
    b1 = [(1, T0, 1.0), (1, T0 + 20 * HOUR_NS, 2.0)]
    spark.createDataFrame(b1, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    got1 = _drain_sessions(spark, src, ckpt, target)
    assert (1, T0, T0, 1, 1.0) in got1
    assert not any(r[1] == T0 + 20 * HOUR_NS or r[2] == T0 + 20 * HOUR_NS
                   for r in got1)

    # batch 2: a LATE event at 19.5h (admissible: above the 19h watermark,
    # within gap of the pending session) plus a 40h event that advances
    # the watermark to 39h, making the merged session watermark-safe.
    b2 = [(1, T0 + 19 * HOUR_NS + HOUR_NS // 2, 4.0),
          (1, T0 + 40 * HOUR_NS, 8.0)]
    spark.createDataFrame(b2, EV_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    new2 = _drain_sessions(spark, src, ckpt, target) - got1
    # ONE merged session [19.5h, 20h] with both events — never two
    # overlapping fragments
    assert (1, T0 + 19 * HOUR_NS + HOUR_NS // 2, T0 + 20 * HOUR_NS, 2, 6.0) in new2
    assert len([r for r in new2 if r[1] <= T0 + 20 * HOUR_NS]) == 1


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def registerTimer(self, ms):
        self.timers.append(ms)

    def listTimers(self):
        return iter(list(self.timers))

    def deleteTimer(self, ms):
        if ms in self.timers:
            self.timers.remove(ms)


class _FakeTimerValues:
    def __init__(self, wm_ms):
        self._wm = wm_ms

    def getCurrentWatermarkInMs(self):
        return self._wm


def test_tws_processor_semantics_match_kernel():
    """The transformWithStateInPandas processor (protobuf-gated in this
    container) must implement the same merge/emit state machine as the
    applyInPandasWithState kernel: emit only watermark-safe sessions,
    keep the rest in state, re-register a timer at the oldest pending
    session's safe point."""
    import pandas as pd

    from openmrs_module_mamba_etl_spark.streaming.sessionize_tws import (
        SessionProcessor,
    )

    gap_ns = 6 * 3600 * 1_000_000_000
    p2 = SessionProcessor(gap_ns, "ts", "value")
    h2 = _FakeHandle()
    p2.init(h2)
    hr = 3600 * 1_000_000_000
    batch2 = pd.DataFrame(
        {"ts": [0, 1 * hr, 20 * hr], "value": [1.0, 2.0, 4.0]}
    )
    wm2_ns = 10 * hr  # session [0,1h] safe at 1h+6h<=10h; [20h] not
    out2 = list(
        p2.handleInputRows(
            (7,), iter([batch2]), _FakeTimerValues(wm2_ns // 1_000_000)
        )
    )
    emitted = pd.concat(out2)
    assert len(emitted) == 1
    row = emitted.iloc[0]
    assert row["user_id"] == 7
    assert row["session_start_ns"] == 0
    assert row["session_end_ns"] == 1 * hr
    assert row["n_events"] == 2
    assert row["sum_value"] == 3.0
    # pending session stays in state with a timer at its safe point —
    # and exactly ONE live timer (stale registrations are deleted)
    assert h2.state.exists()
    assert h2.timers == [(20 * hr + gap_ns) // 1_000_000]

    # timer expiry after the watermark passes -> pending session emits
    out3 = list(
        p2.handleExpiredTimer(
            (7,), _FakeTimerValues((27 * hr) // 1_000_000), None
        )
    )
    emitted3 = pd.concat(out3)
    assert len(emitted3) == 1
    assert emitted3.iloc[0]["session_start_ns"] == 20 * hr
    assert not h2.state.exists()


def test_tws_processor_merges_across_batches():
    import pandas as pd

    from openmrs_module_mamba_etl_spark.streaming.sessionize_tws import (
        SessionProcessor,
    )

    hr = 3600 * 1_000_000_000
    p = SessionProcessor(6 * hr, "ts", "value")
    h = _FakeHandle()
    p.init(h)
    # batch 1: event at 10h stays pending (wm 0)
    list(p.handleInputRows((1,), iter([pd.DataFrame({"ts": [10 * hr], "value": [1.0]})]), _FakeTimerValues(0)))
    # batch 2: event at 12h merges into the pending session (gap 6h)
    list(p.handleInputRows((1,), iter([pd.DataFrame({"ts": [12 * hr], "value": [2.0]})]), _FakeTimerValues(0)))
    starts, lasts, ns_, ss = h.state.get()
    assert list(starts) == [10 * hr] and list(lasts) == [12 * hr]
    assert list(ns_) == [2] and list(ss) == [3.0]
