"""Window-function inventory: SURVEY.md §2.E.

All orderings carry a unique tiebreak column so ranks are deterministic —
window results must hash identically across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from openmrs_module_mamba_etl_spark.operators.sessionize import session_stats
from openmrs_module_mamba_etl_spark.operators.windows import latest_per_key, top_k_per_key
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


@query(
    "window_sessionize",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tus - prev > 21600000000
                     THEN 1 ELSE 0 END AS is_new
      FROM t
    ), tagged AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(tus) AS session_start_us,
           MAX(tus) AS session_end_us,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM tagged GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (6 h gap) rolled up to per-session
    stats. Lag, running sum, and the final aggregate all share the
    user_id hash partitioning — one shuffle end to end (SURVEY.md §2.E /
    §2.I behavioral pre-aggregation). Run at µs grain (exact integer
    `div`) because the DuckDB oracle reads TIMESTAMP(NANOS) at µs."""
    ev = table(spark, sf_dir, "events").withColumn(
        "ts_us", F.expr("ts div 1000")
    )
    return session_stats(
        ev,
        key_col="user_id",
        ts_col="ts_us",
        value_col="value",
        gap=6 * 3600 * 1_000_000,
        order_tiebreak="event_id",
        bounds_suffix="_us",
    )


@query(
    "window_latest_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def window_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key — the dedup idiom the EAV flattener relies on
    (repeated obs per (encounter, concept) → latest wins, SURVEY.md §2.E)."""
    return latest_per_key(
        table(spark, sf_dir, "orders").select(
            "o_custkey", "o_orderkey", "o_orderdate"
        ),
        keys=["o_custkey"],
        order_col="o_orderdate",
        tiebreak=["o_orderkey"],
    )


@query(
    "window_topk_per_key",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def window_topk_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by value."""
    df = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    # top_k_per_key orders by one column; add the deterministic tiebreak here.
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 3)
        .drop("_rn")
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (ROWS frame ⇒ deterministic accumulation
    order ⇒ bit-stable doubles after rounding)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           DATE_DIFF('day',
                     LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate ASC, o_orderkey ASC),
                     o_orderdate) AS days_since_prev
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + date arithmetic: days since the previous order per customer."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev = F.lag("o_orderdate").over(w)
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias(
            "days_since_prev"
        ),
    )


@query(
    "window_rank_dense",
    oracle="""
    SELECT c_custkey, c_acctbal,
           RANK() OVER (ORDER BY ROUND(c_acctbal, 0) DESC) AS bal_rank,
           DENSE_RANK() OVER (ORDER BY ROUND(c_acctbal, 0) DESC) AS bal_dense_rank
    FROM customer
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK/DENSE_RANK with intentional ties (rounded balances).

    Scale shape (round-5 verdict task 3): global ranking is the operator's
    semantics, but a global ``Window.orderBy`` plans a single-partition
    WindowExec over the WHOLE table. Because rank ranges over the rounded
    key, ties share one rank value, so the two-pass form is exact: contract
    to the value histogram (one map-side-combined aggregate, ≤#distinct
    rounded balances — bounded by the value domain, not the row count),
    compute RANK = 1 + prefix-sum of higher-value counts and DENSE_RANK =
    row_number on the CONTRACTED table, then broadcast-join the rank pair
    back to the fact rows. No corpus-sized partition anywhere."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", F.round(F.col("c_acctbal"), 0).alias("k")
    )
    hist = cust.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.col("k").desc())
    prefix = order.rowsBetween(Window.unboundedPreceding, -1)
    ranks = hist.select(
        "k",
        (F.coalesce(F.sum("cnt").over(prefix), F.lit(0)) + 1).alias(
            "bal_rank"
        ),
        F.row_number().over(order).alias("bal_dense_rank"),
    )
    return cust.join(F.broadcast(ranks), "k").select(
        "c_custkey", "c_acctbal", "bal_rank", "bal_dense_rank"
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS spend_30d
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: trailing-30-day spend per customer.

    The ordering key is days-since-epoch so the frame bound is a plain
    integer offset; ties (same-day orders) all share one frame, so the
    result is deterministic without a tiebreak column (SURVEY.md §2.E
    frames via ``rangeBetween``)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.to_date("o_orderdate")))
        .rangeBetween(-30, Window.currentRow)
    )
    return table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("spend_30d"),
    )


def _events_stream_schema():
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    return StructType(
        [
            StructField("event_id", LongType(), True),
            StructField("ts", LongType(), True),
            StructField("user_id", LongType(), True),
            StructField("event_type", StringType(), True),
            StructField("value", DoubleType(), True),
            StructField("props", StringType(), True),
        ]
    )


_EVENTS_STREAM_SCHEMA = _events_stream_schema()


def _drain(q, seconds: int = 300) -> None:
    """Await an availableNow drain; fail LOUDLY on timeout.

    ``awaitTermination`` returns False (it does not raise) when the clock
    runs out — reading the sink then would hand partial output to the
    correctness gate while the query keeps writing into a scratch dir the
    next run deletes from under it.
    """
    if not q.awaitTermination(seconds):
        q.stop()
        raise TimeoutError(
            f"streaming drain did not finish within {seconds}s"
        )


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File stream over the raw events table with ``ts`` normalized to the
    engine's canonical int64 ns (see sources/parquet.py). The stream schema
    mirrors whatever the parquet footer declares (nanos-as-long or
    timestamp_ntz); one codegen projection converts — so every downstream
    streaming operator keeps exact integer time arithmetic."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if dict(stream.dtypes).get("ts") != "bigint":
        from openmrs_module_mamba_etl_spark.functions.timeutil import ts_us

        stream = stream.withColumn("ts", ts_us(stream) * F.lit(1000))
    return stream


@query(
    "stream_sessionize",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tus - prev > 21600000000
                     THEN 1 ELSE 0 END AS is_new
      FROM t
    ), tagged AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id, sid, MIN(tus) AS s_us, MAX(tus) AS e_us,
             COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
      FROM tagged GROUP BY user_id, sid
    ), mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events)
    SELECT user_id, s_us * 1000 AS session_start_ns,
           e_us * 1000 AS session_end_ns, n_events, sum_value
    FROM sess s, mx
    WHERE e_us + 21600000000 <= ((m // 1000) - 3600000) * 1000
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-streaming sessionization over the events table: one
    availableNow drain through ``applyInPandasWithState`` (6 h gap, 1 h
    watermark). The emission set is deterministic — exactly the sessions
    whose ``end + gap`` lies at or below the final watermark (max event
    time − delay, millisecond-floored the way Spark tracks it); later
    sessions stay in state because an admissible late event could still
    extend them. The oracle's gaps-and-islands SQL pins that set; the
    incremental batch/stream equivalence is separately pinned by
    tests/test_streaming.py."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.streaming.sessionize import (
        streaming_sessionize,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_sessionize")
    # the file source wants a directory; glob down to the one table
    stream = _events_stream(spark, sf_dir)
    sdf = streaming_sessionize(stream)
    q = (
        sdf
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), sdf.schema)


def _tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf wire format for its
    state server; gate on the import so environments without
    `google.protobuf` (like this container) simply don't register the
    TWS twin instead of registering a guaranteed crash. The processor
    logic itself is protobuf-free and unit-tested against fake state
    handles either way (tests/test_streaming.py)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


_TWS_ORACLE = """
    WITH t AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id) AS prev
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tus - prev > 21600000000
                     THEN 1 ELSE 0 END AS is_new
      FROM t
    ), tagged AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                  ORDER BY tus, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    ), sess AS (
      SELECT user_id, sid, MIN(tus) AS s_us, MAX(tus) AS e_us,
             COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
      FROM tagged GROUP BY user_id, sid
    ), mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events)
    SELECT user_id, s_us * 1000 AS session_start_ns,
           e_us * 1000 AS session_end_ns, n_events, sum_value
    FROM sess s, mx
    WHERE e_us + 21600000000 <= ((m // 1000) - 3600000) * 1000
    """


def stream_sessionize_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization on Spark 4's transformWithStateInPandas — the NEW
    arbitrary-stateful API (typed state handles + explicit per-key
    timers, RocksDB state store). Same gap/watermark emission contract as
    stream_sessionize, pinned by the SAME oracle — proving the two
    stateful-API carriers implement identical semantics."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.streaming.sessionize_tws import (
        streaming_sessionize_tws,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # TWS requires the RocksDB provider — also the provider for 100 TB
    # state (spill-to-disk, changelog checkpoints)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    scratch = _scratch_dir("stream_sessionize_tws")
    stream = _events_stream(spark, sf_dir)
    sdf = streaming_sessionize_tws(stream)
    q = (
        sdf
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), sdf.schema)


if _tws_available():
    query("stream_sessionize_tws", oracle=_TWS_ORACLE)(stream_sessionize_tws)


@query(
    "stream_log_append",
    oracle="""
    SELECT event_id, user_id, event_type, ROUND(value, 2) AS value
    FROM events
    """,
)
def stream_log_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming ingestion into the versioned table log:
    each micro-batch commits via ``append_batch`` (manifest records the
    batch_id, so a re-delivered batch after a crash is a no-op — the
    idempotent foreachBatch sink pattern). Four time-split micro-batches
    must reassemble EXACTLY the source table, which is what the oracle
    checks; the final manifest shows one commit per batch."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
    )
    from openmrs_module_mamba_etl_spark.sources.txnlog import (
        VersionedParquetTable,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_log_append")
    src = os.path.join(scratch, "in")
    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )
    t = VersionedParquetTable(os.path.join(scratch, "log"))

    def sink(batch: DataFrame, batch_id: int) -> None:
        t.append_batch(
            batch.select(
                "event_id",
                "user_id",
                "event_type",
                F.round("value", 2).alias("value"),
            ),
            batch_id,
        )

    q = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return t.read(spark)


@query(
    "stream_windowed_counts",
    oracle="""
    WITH t AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws, value FROM events
    ), mx AS (SELECT MAX(ts) AS m FROM events)
    SELECT ws AS window_start,
           ws + INTERVAL 1 DAY AS window_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM t, mx
    WHERE ws + INTERVAL 1 DAY <= m - INTERVAL 1 HOUR
    GROUP BY ws
    """,
)
def stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window rollup (built-in streaming late-data
    path): daily event counts/sums per window, emitted append-mode when
    the watermark passes each window's end. One availableNow drain makes
    the emission set DETERMINISTIC — exactly the windows whose end ≤
    max(event time) − watermark delay — which is what the oracle pins;
    trailing windows above the final watermark stay in state (and would
    emit on the next incremental drain, exercised by
    tests/test_streaming.py)."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.streaming.windows import windowed_counts

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_windowed_counts")
    stream = _events_stream(spark, sf_dir)
    sdf = windowed_counts(stream, window="1 day", watermark_delay="1 hour")
    q = (
        sdf
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), sdf.schema)


def _documents_stream_schema():
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    return StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("text", StringType(), True),
            StructField("lang", StringType(), True),
            StructField("source", StringType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )


_DOCUMENTS_STREAM_SCHEMA = _documents_stream_schema()

_TOKS_SQL = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x != '')"
)


@query(
    "stream_dedup",
    oracle=f"""
    SELECT DISTINCT md5(array_to_string({_TOKS_SQL}, ' ')) AS content_hash
    FROM documents
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once document dedup: ``dropDuplicates`` on the
    content hash with append emission — each distinct document admitted
    once across ALL micro-batches (state = seen-hash set). The emission
    set equals the batch distinct-hash set whatever the batch boundaries,
    so this streaming operator is fully oracle-checkable."""
    import os

    from openmrs_module_mamba_etl_spark.functions.text import content_hash
    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.streaming.dedup import streaming_dedup

    scratch = _scratch_dir("stream_dedup")
    stream = (
        spark.readStream.schema(_DOCUMENTS_STREAM_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    sdf = streaming_dedup(stream, content_hash(F.col("text")))
    q = (
        sdf
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), sdf.schema)


@query(
    "stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join: each event joined against the (batch)
    customer dimension as it flows through — stateless, append-mode, every
    matched event emitted exactly once, so the emission set equals the
    batch join. The static side re-resolves per micro-batch (dimension
    updates are picked up); Spark broadcasts it under the usual
    autoBroadcast threshold, so at 100 TB of stream the dimension never
    shuffles the stream side."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_static_join")
    stream = _events_stream(spark, sf_dir)
    customers = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = stream.join(
        customers, stream.user_id == customers.c_custkey, "inner"
    ).select("event_id", "user_id", "c_mktsegment", "value")
    q = (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), joined.schema)


# Re-export for API users; keeps operators/windows.py the canonical impl.
__all__ = ["latest_per_key", "top_k_per_key"]


@query(
    "grouped_user_trend",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(REGR_SLOPE(value, epoch_us(ts) / 86400000000.0), 4)
             AS slope_per_day
    FROM events GROUP BY user_id
    """,
)
def grouped_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map seam (`applyInPandas`): per-user OLS slope of value over
    time, computed by a vectorized numpy kernel on each full group — the
    whole-group numeric pattern built-in aggregates can't express. Checked
    against SQL's REGR_SLOPE definition (µs grain — DuckDB reads the nanos
    timestamp at µs)."""
    from openmrs_module_mamba_etl_spark.operators.grouped import user_trend

    ev = table(spark, sf_dir, "events").withColumn(
        "ts", F.expr("ts div 1000") * 1000
    )
    out = user_trend(ev, "user_id", "ts", "value")
    return out.select(
        "user_id", "n_events", F.round("slope_per_day", 4).alias("slope_per_day")
    )


@query(
    "window_ntile_pctrank",
    oracle="""
    SELECT c_custkey,
           NTILE(10) OVER (ORDER BY ROUND(c_acctbal, 2) ASC, c_custkey ASC)
             AS bal_decile,
           ROUND(PERCENT_RANK() OVER (ORDER BY ROUND(c_acctbal, 2) ASC,
                                      c_custkey ASC), 6) AS bal_pct_rank
    FROM customer
    """,
)
def window_ntile_pctrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (SURVEY.md §2.E): decile bucketing + percent
    rank over account balance, deterministic via the custkey tiebreak.

    Scale shape (round-5 verdict task 3): ``NTILE``/``PERCENT_RANK`` over a
    global ORDER BY would plan a single-partition WindowExec over the whole
    table. Both are pure functions of (global row number, total count), and
    the ordering key leads with the ROUNDED balance, so the two-pass form
    is exact: contract to the rounded-balance histogram (map-side-combined,
    ≤#distinct rounded values — domain-bounded), broadcast back each
    value's prefix-sum offset and the grand total, and recover the global
    row number as offset + row_number WITHIN the balance partition (a
    partitioned window, never a global one). NTILE(10) is then integer
    arithmetic: the first ``n % 10`` buckets carry ``n div 10 + 1`` rows,
    the rest ``n div 10``; PERCENT_RANK is ``(rn−1)/(n−1)``."""
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", F.round(F.col("c_acctbal"), 2).alias("k")
    )
    hist = cust.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    order = Window.orderBy(F.col("k").asc())
    offs = hist.select(
        "k",
        F.coalesce(
            F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("off"),
        F.sum("cnt")
        .over(
            order.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("n"),
    )
    within = F.row_number().over(
        Window.partitionBy("k").orderBy(F.col("c_custkey").asc())
    )
    ranked = cust.join(F.broadcast(offs), "k").select(
        "c_custkey", (F.col("off") + within).alias("rn"), "n"
    )
    # NTILE(10): buckets 1..(n%10) hold (n div 10)+1 rows, the rest n div 10;
    # both branches are exact integer ceil-division on (rn, n).
    ntile = F.expr(
        "CASE WHEN rn <= ((n div 10) + 1) * (n % 10) "
        "THEN (rn + (n div 10)) div ((n div 10) + 1) "
        "ELSE (n % 10) + ((rn - ((n div 10) + 1) * (n % 10)) + (n div 10) - 1)"
        " div (n div 10) END"
    )
    return ranked.select(
        "c_custkey",
        ntile.alias("bal_decile"),
        F.when(
            F.col("n") > 1,
            F.round((F.col("rn") - 1) / (F.col("n") - 1), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("bal_pct_rank"),
    )


@query(
    "rollup_hypertable",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS chunk, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable continuous rollup: daily chunk × event_type aggregate,
    materialized partitionBy(chunk) and read back — the time-partitioned
    rollup table whose chunk-selective refresh is pinned by
    tests/test_rollup.py. Readers hit partition pruning on any chunk
    predicate; maintenance rewrites only touched chunk directories."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.operators.rollup import (
        rollup_aggregate,
        rollup_write,
    )

    ev = table(spark, sf_dir, "events").select(
        F.expr("ts div 1000").alias("tus"), "event_type", "value"
    )
    rolled = rollup_aggregate(
        ev, "tus", ["event_type"], "value", chunk_us=86_400_000_000
    )
    target = _scratch_dir("rollup_hypertable")
    rollup_write(rolled, target)
    # partition col `chunk` reads back from directory names as string
    out = read_back(
        spark,
        target,
        "event_type string, n_events bigint, sum_value double, "
        "min_value double, max_value double, chunk string",
    )
    # partition column round-trips as its directory value; cast back to long
    return out.select(
        F.col("chunk").cast("long").alias("chunk"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
    )


@query(
    "stream_rollup",
    oracle="""
    SELECT epoch_us(ts) // 86400000000 AS chunk, event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MIN(value), 2) AS min_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous aggregate: a streaming drain maintains the hypertable
    rollup incrementally — each micro-batch appends to the raw archive
    and recomputes ONLY the daily chunks it touches (foreachBatch →
    rollup_refresh, dynamic partition overwrite). Four time-local batches
    (maxFilesPerTrigger=1 over range-split files) prove multi-batch
    convergence; the oracle checks the FINAL rollup state equals the
    one-shot batch aggregate — the TimescaleDB continuous-aggregate
    contract. At scale each refresh costs one chunk rewrite, never a
    full-table rebuild."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.operators.rollup import rollup_refresh

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_rollup")
    src = os.path.join(scratch, "in")
    raw = os.path.join(scratch, "raw")
    rollup = os.path.join(scratch, "rollup")

    # stage the stream as 4 time-local files → 4 micro-batches
    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    def refresh(batch: DataFrame, batch_id: int) -> None:
        b = batch.select(
            F.expr("ts div 1000").alias("tus"), "event_type", "value"
        )
        b.write.mode("append").parquet(raw)
        rollup_refresh(
            batch.sparkSession,
            b,
            rollup,
            "tus",
            ["event_type"],
            "value",
            chunk_us=86_400_000_000,
            raw=batch.sparkSession.read.parquet(raw),
        )

    q = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(refresh)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    out = read_back(
        spark,
        rollup,
        "event_type string, n_events bigint, sum_value double, "
        "min_value double, max_value double, chunk string",
    )
    return out.select(
        F.col("chunk").cast("long").alias("chunk"),
        "event_type",
        "n_events",
        "sum_value",
        "min_value",
        "max_value",
    )


@query(
    "stream_stream_join",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
    )
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           p.tus - c.tus AS delay_us
    FROM e c JOIN e p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.tus >= c.tus AND p.tus <= c.tus + 21600000000
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream event-time interval join: clicks joined to purchases
    by the same user within the following 6 hours, BOTH sides watermarked
    so the engine can bound join state (a click's state is droppable once
    the purchase watermark passes click_ts + 6 h — without the time bound
    the state grows forever). Inner join + availableNow drain ⇒ the
    emitted set equals the batch interval join, which is exactly what the
    oracle computes. State is hash-partitioned by user_id; at scale the
    interval width is the state-size knob."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_stream_join")
    stream = _events_stream(spark, sf_dir)
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            ts.alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            ts.alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND p_ts >= c_ts "
            "AND p_ts <= c_ts + interval 6 hours"
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("c_ts"))).alias(
            "delay_us"
        ),
    )
    q = (
        joined.writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    return read_back(spark, os.path.join(scratch, "out"), joined.schema)


@query(
    "grouped_weighted_mean",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice * epoch_us(o_orderdate)) /
                 SUM(epoch_us(o_orderdate)), 6) AS recency_weighted_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def grouped_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDAF seam (SURVEY §2.H): recency-weighted mean
    order value per priority via a GROUPED_AGG pandas_udf — Arrow ships
    each group's columns as whole Series. The weighting is also plain SQL,
    so the UDAF mechanism itself is value-checked against the oracle."""
    from openmrs_module_mamba_etl_spark.operators.grouped import (
        weighted_mean_udaf,
    )

    wm = weighted_mean_udaf()
    o = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").alias("price"),
        # NTZ → TIMESTAMP in the UTC session ⇒ same epoch-µs as the
        # oracle's epoch_us(o_orderdate)
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .cast("double")
        .alias("w"),
    )
    return o.groupBy("o_orderpriority").agg(
        F.round(wm(F.col("price"), F.col("w")), 6).alias(
            "recency_weighted_price"
        )
    )


@query(
    "window_session_native",
    oracle="""
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts)) AS prev
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev IS NULL OR tus - prev >= 21600000000
                     THEN 1 ELSE 0 END AS is_new
      FROM t
    ), tagged AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus
                                  ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           make_timestamp(MIN(tus)) AS session_start,
           make_timestamp(MAX(tus) + 21600000000) AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM tagged GROUP BY user_id, sid
    """,
)
def window_session_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native merging session windows (``F.session_window`` groupBy) —
    the same one-shuffle profile as the gaps-and-islands form, and the
    exact formulation the streaming path reuses under a watermark.
    Boundary semantics differ from the islands query: an event landing at
    EXACTLY gap after its predecessor starts a NEW session (window end is
    exclusive), so the oracle's island rule is ``>= gap``, not ``>``."""
    from openmrs_module_mamba_etl_spark.operators.sessionize import (
        session_window_agg,
    )

    return session_window_agg(
        table(spark, sf_dir, "events"), "user_id", "ts", "value", "6 hours"
    )


@query(
    "stream_upsert",
    oracle="""
    SELECT user_id, event_type AS last_event,
           ROUND(value, 2) AS last_value, epoch_us(ts) AS last_tus
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
      ) AS rn FROM events
    ) WHERE rn = 1
    """,
)
def stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming keyed upsert (the MERGE/CDC-sink shape): a foreachBatch
    drain maintains a per-user latest-event table — each micro-batch
    reduces to its own latest row per key, merges against current state
    by event time (never arrival order), and publishes a new state
    version.

    The oracle is the batch latest-per-key over ALL events, so parity
    proves the upsert is batch-boundary-invariant: four time-split
    micro-batches converge to exactly the one-shot answer. Versioned
    state directories give atomic publish (readers never see a
    half-written merge); at scale the state table is hash-partitioned
    by key and each merge touches one partition's worth of keys."""
    import os
    import shutil

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_upsert")
    src = os.path.join(scratch, "in")

    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    cur: dict[str, str] = {}

    def latest_per_key(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("last_tus").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        b = batch.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("last_event"),
            F.round("value", 2).alias("last_value"),
            F.expr("ts div 1000").alias("last_tus"),
        )
        merged = latest_per_key(b)
        if "path" in cur:
            state = ss.read.parquet(cur["path"])
            merged = latest_per_key(state.unionByName(merged))
        new_path = os.path.join(scratch, f"state_v{batch_id}")
        merged.write.mode("overwrite").parquet(new_path)
        old = cur.get("path")
        cur["path"] = new_path
        if old:
            shutil.rmtree(old, ignore_errors=True)

    q = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # Zero micro-batches (empty source) leaves cur without a path: the
    # upsert must read back as an empty state table, not a KeyError —
    # same empty-increment contract as stream_flatten's cell store.
    state = read_back(
        spark,
        cur.get("path", os.path.join(scratch, "state_v0")),
        "user_id long, event_id long, last_event string, "
        "last_value double, last_tus long",
    )
    return state.select("user_id", "last_event", "last_value", "last_tus")


@query(
    "stream_jdbc_upsert",
    oracle="""
    SELECT user_id, event_type AS last_event,
           ROUND(value, 2) AS last_value, epoch_us(ts) AS last_tus
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC
      ) AS rn FROM events
    ) WHERE rn = 1
    """,
)
def stream_jdbc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous ETL handoff to the analysis DB: the stream_upsert MERGE
    shape, but the state table lives in the JDBC analysis database
    (reference target: MySQL, README.md:125) — each micro-batch reads the
    current table back, merges latest-per-key by EVENT time, and
    overwrite-publishes through JdbcSink (insert batching + connection
    cap). Oracle = the one-shot batch latest-per-key, so parity proves
    the JDBC round trip is batch-boundary-invariant end to end. Embedded
    Derby stands in for MySQL exactly as in sink_jdbc."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
    )
    from openmrs_module_mamba_etl_spark.sources.jdbc import JdbcSink

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_jdbc_upsert")
    src = os.path.join(scratch, "in")
    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    sink = JdbcSink(
        url="jdbc:derby:memory:mamba_stream;create=true", batch_size=1000
    )
    dbtable = "analysis_latest_event"
    state = {"exists": False}

    def latest_per_key(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.col("last_tus").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def upsert(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        b = batch.select(
            "user_id",
            "event_id",
            F.col("event_type").alias("last_event"),
            F.round("value", 2).alias("last_value"),
            F.expr("ts div 1000").alias("last_tus"),
        )
        merged = latest_per_key(b)
        if state["exists"]:
            prev = sink.read_back(ss, dbtable)
            merged = latest_per_key(prev.unionByName(merged))
        # JDBC overwrite is not atomic like the versioned-dir publish; a
        # production MySQL target would MERGE/upsert by key or write to a
        # staging table + RENAME. The batch-invariance contract (what the
        # oracle pins) is identical.
        sink.write(
            merged.localCheckpoint(),  # materialize BEFORE dropping the table read above
            dbtable,
            mode="overwrite",
            num_partitions=2,
        )
        state["exists"] = True

    q = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(upsert)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    if not state["exists"]:
        # Zero micro-batches: the Derby table was never created — an
        # empty increment reads back as an empty relation, not an error.
        return spark.createDataFrame(
            [],
            "user_id long, last_event string, "
            "last_value double, last_tus long",
        )
    return sink.read_back(spark, dbtable).select(
        "user_id", "last_event", "last_value", "last_tus"
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(FIRST_VALUE(o_totalprice) OVER w, 2) AS first_price,
           ROUND(NTH_VALUE(o_totalprice, 2) OVER w, 2) AS second_price,
           ROUND(LAST_VALUE(o_totalprice) OVER w, 2) AS latest_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional value windows: each order annotated with the
    customer's first, second, and latest order value — the
    frame-sensitive family (FIRST_VALUE / NTH_VALUE / LAST_VALUE) where
    the default frame is the classic silent-wrong-answer trap
    (LAST_VALUE over the default RANGE..CURRENT ROW returns the current
    row); the explicit unbounded frame is the contract, identical in
    both engines.

    One (custkey, date, orderkey) sort-exchange serves all three
    functions; ordering ties break on orderkey so positions are
    engine-independent."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.to_date("o_orderdate"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    orders = table(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias(
            "second_price"
        ),
        F.round(F.last("o_totalprice").over(w), 2).alias("latest_price"),
    )


@query(
    "stream_topk_trending",
    oracle="""
    WITH t AS (
      SELECT time_bucket(INTERVAL 1 DAY, ts) AS ws, event_type FROM events
    ), mx AS (SELECT MAX(ts) AS m FROM events), counts AS (
      SELECT ws, event_type, COUNT(*) AS n_events
      FROM t, mx
      WHERE ws + INTERVAL 1 DAY <= m - INTERVAL 1 HOUR
      GROUP BY ws, event_type
    )
    SELECT ws AS window_start, event_type, n_events, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY ws
                                   ORDER BY n_events DESC,
                                            event_type ASC) AS rnk
      FROM counts
    ) WHERE rnk <= 3
    """,
)
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming trending-topics: watermarked daily (window, event_type)
    counts emit append-mode into a parquet landing table; top-3 ranking
    per window runs batch on the landing table. Ranking needs ALL of a
    window's keys, and append mode finalizes a (window, key) row exactly
    when the watermark passes the window end — so every emitted window is
    complete and the post-drain rank equals the batch rank over the
    emitted set (what the oracle replays: windows whose end ≤ final
    watermark, then ROW_NUMBER). State: one partial count per
    (window, type) — bounded by window count × type cardinality, not
    event volume; the rank stage reads the contracted landing table."""
    import os

    from pyspark.sql import Window

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )
    from openmrs_module_mamba_etl_spark.streaming.windows import (
        windowed_counts,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_topk_trending")
    stream = _events_stream(spark, sf_dir)
    sdf = windowed_counts(stream, key_col="event_type").select(
        "window_start", "event_type", "n_events"
    )
    q = (
        sdf.writeStream.format("parquet")
        .outputMode("append")
        .option("path", os.path.join(scratch, "out"))
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    counts = read_back(spark, os.path.join(scratch, "out"), sdf.schema)
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return counts.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= 3
    )


def _lttb_oracle(n_out: int = 12) -> str:
    """Unrolled DuckDB replay of the LTTB selection loop: fixed bucket
    assignment, per-step (prev-selected, candidate, next-bucket-average)
    triangle argmax as chained CTEs — the same unroll technique as the
    BPE and logreg oracles. Integer-days x, integer-cents y, one fixed
    operand order and single-division means keep every float op
    bit-identical to the pandas kernel."""
    n_b = n_out - 2
    steps = []
    for i in range(n_b):
        anchor = (
            f"(SELECT event_type, cx, cy FROM avgs WHERE b = {i + 1})"
            if i < n_b - 1
            else "(SELECT event_type, CAST(day AS DOUBLE) AS cx,"
            " cents / 100.0 AS cy FROM lastp)"
        )
        prev = "sel0" if i == 0 else f"s{i}"
        steps.append(
            f""", s{i + 1} AS (
      SELECT event_type, day, cents FROM (
        SELECT c.event_type, c.day, c.cents,
               ROW_NUMBER() OVER (PARTITION BY c.event_type ORDER BY
                 ABS((s.day - na.cx) * (c.cents / 100.0 - s.cents / 100.0)
                     - (s.day - c.day) * (na.cy - s.cents / 100.0)) DESC,
                 c.day ASC) AS rn
        FROM bkt c
        JOIN {prev} s USING (event_type)
        JOIN {anchor} na USING (event_type)
        WHERE c.b = {i}
      ) WHERE rn = 1
    )"""
        )
    sel = "\nUNION ALL\n".join(
        ["SELECT event_type, day, cents / 100.0 AS total, 0 AS sel_idx"
         " FROM sel0"]
        + [
            f"SELECT event_type, day, cents / 100.0, {i} FROM s{i}"
            for i in range(1, n_b + 1)
        ]
        + [
            f"SELECT event_type, day, cents / 100.0, {n_out - 1} FROM lastp"
        ]
    )
    return f"""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
             CAST(ROUND(SUM(value) * 100) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ), seq AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day ASC) - 1 AS idx,
             COUNT(*) OVER (PARTITION BY event_type) AS m
      FROM daily
    ), bkt AS (
      SELECT *, CAST(((idx - 1) * {n_b}) // (m - 2) AS INT) AS b
      FROM seq WHERE idx >= 1 AND idx <= m - 2
    ), avgs AS (
      SELECT event_type, b,
             SUM(day) / (1.0 * COUNT(*)) AS cx,
             CAST(SUM(cents) AS BIGINT) / (100.0 * COUNT(*)) AS cy
      FROM bkt GROUP BY 1, 2
    ), sel0 AS (
      SELECT event_type, day, cents FROM seq WHERE idx = 0
    ), lastp AS (
      SELECT event_type, day, cents FROM seq WHERE idx = m - 1
    ){"".join(steps)}
    {sel}
    """


@query("rollup_downsample_lttb", oracle=_lttb_oracle(12))
def rollup_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-preserving timeseries downsampling: each event type's daily
    total series reduced to 12 LTTB points (Steinarsson 2013) — what a
    dashboard fetches instead of the raw series. The daily hash aggregate
    contracts the event stream FIRST (#types×#days rows, map-side
    combined); the sequential selection loop then runs per contracted
    series in an applyInPandas kernel — the grouped-pandas seam, used
    exactly where recursion defeats window expressions. Integer-day /
    integer-cent arithmetic makes the kernel bit-replayable by the
    unrolled CTE oracle."""
    from openmrs_module_mamba_etl_spark.operators.downsample import (
        lttb_downsample,
    )

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.expr("CAST((ts div 1000) div 86400000000 AS BIGINT)").alias("day"),
    ).agg(F.round(F.sum("value") * 100).cast("long").alias("cents"))
    return lttb_downsample(daily, "event_type", "day", "cents", n_out=12)


@query(
    "stream_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(DISTINCT user_id // 63) AS BIGINT) AS n_blocks
    FROM events GROUP BY event_type
    """,
)
def stream_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING exact distinct counting — the op COUNT(DISTINCT) cannot
    stream — via mergeable bitmap state (the agg_bitmap_distinct words):
    each micro-batch reduces to (event_type, block, word) partials that
    OR-merge into the standing state table; the published count is the
    popcount sum over final state.

    The oracle is the one-shot batch COUNT(DISTINCT) over ALL events, so
    parity proves batch-boundary invariance: four time-split micro-batches
    converge to exactly the full-scan answer because OR is associative,
    commutative, and idempotent — re-delivered events are absorbed free,
    which also makes the sink at-least-once safe. ``n_blocks`` (state
    rows per group) is published too: state is O(keyspace/63) words, not
    O(stream).

    Scale shape: per batch, one map-side-combined word aggregate over the
    increment + a state merge keyed (group, block); versioned state dirs
    give atomic publish, same contract as stream_upsert."""
    import os
    import shutil

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    scratch = _scratch_dir("stream_bitmap_distinct")
    src = os.path.join(scratch, "in")

    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    cur: dict[str, str] = {}

    def words(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "event_type", F.expr("user_id div 63").alias("blk")
        ).agg(
            F.bit_or(
                F.expr("shiftleft(1L, CAST(user_id % 63 AS INT))")
            ).alias("word")
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        w = words(batch.select("event_type", "user_id"))
        if "path" in cur:
            state = ss.read.parquet(cur["path"])
            w = (
                state.unionByName(w)
                .groupBy("event_type", "blk")
                .agg(F.bit_or("word").alias("word"))
            )
        new_path = os.path.join(scratch, f"state_v{batch_id}")
        w.write.mode("overwrite").parquet(new_path)
        old = cur.get("path")
        cur["path"] = new_path
        if old:
            shutil.rmtree(old, ignore_errors=True)

    q = (
        spark.readStream.schema(_EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # Zero micro-batches (empty source): empty bitmap state, not KeyError.
    state = read_back(
        spark,
        cur.get("path", os.path.join(scratch, "state_v0")),
        "event_type string, blk long, word long",
    )
    return state.groupBy("event_type").agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_users"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
