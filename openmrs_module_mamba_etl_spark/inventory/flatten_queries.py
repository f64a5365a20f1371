"""EAV-flattening inventory — the signature operator (SURVEY.md §2.D D6/D7).

The ``events`` table plays the obs EAV long table: entity=user_id,
attribute=event_type, value=value, ts=ts (FIXTURES.md §B). The ANSI oracle
reproduces latest-wins pivot semantics with ROW_NUMBER + MAX(CASE WHEN) —
the SQL a human would write in an engine without a pivot operator, which is
exactly what the one-shuffle ``pivot + max_by`` plan must match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.operators.flatten import (
    EVENTS_AS_OBS_SPEC as EVENTS_SPEC,
    auto_flatten_by_type,
    run_per_type,
    flatten,
)
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table

#: The declared event-type contract: the wide-schema columns every flatten/
#: pivot in this module publishes even on an empty increment (the oracles
#: bake the same five as CASE WHEN literals). One constant so the schema
#: can't silently diverge between queries when the contract changes.
EVENT_TYPE_CONTRACT = ("click", "error", "purchase", "signup", "view")

_LATEST_CTE = """
    WITH latest AS (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC) AS rn
      FROM events
    )
"""


@query(
    "pivot_eav_flatten",
    oracle=_LATEST_CTE
    + """
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click'    THEN value END) AS click,
           MAX(CASE WHEN event_type = 'error'    THEN value END) AS error,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           MAX(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
           MAX(CASE WHEN event_type = 'view'     THEN value END) AS view
    FROM latest WHERE rn = 1 GROUP BY user_id
    """,
)
def pivot_eav_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic two-phase pivot: discover attributes, then one-shuffle
    ``groupBy(entity).pivot(attr, values).agg(max_by(value, ts))``
    (reference semantics: README.md:8-12,246-253)."""
    return flatten(table(spark, sf_dir, "events"), EVENTS_SPEC)


@query(
    "pivot_eav_config",
    oracle=_LATEST_CTE
    + """
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click'    THEN value END) AS clicks,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchases
    FROM latest WHERE rn = 1 GROUP BY user_id
    """,
)
def pivot_eav_config(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Config-driven pivot: declarative column↦attribute mapping restricts
    and renames the flat table (reference: README.md:249-253 JSON config)."""
    return flatten(
        table(spark, sf_dir, "events"),
        EVENTS_SPEC,
        column_mapping={"clicks": "click", "purchases": "purchase"},
    )


@query(
    "pivot_agg_sum",
    oracle="""
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           ROUND(SUM(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           ROUND(SUM(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           ROUND(SUM(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with a SUM measure (wide metrics table per entity)."""
    ev = table(spark, sf_dir, "events")
    attrs = list(EVENT_TYPE_CONTRACT)
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", attrs)
        .agg(F.round(F.sum("value"), 2))
    )
    return wide


@query(
    "flatten_auto_by_type",
    oracle="""
    WITH typed AS (
      SELECT CASE WHEN user_id % 2 = 0 THEN 'even_users'
                  ELSE 'odd_users' END AS etype,
             user_id, event_type
      FROM events
    )
    SELECT 'mamba_flat_encounter_' || etype AS table_name,
           COUNT(DISTINCT user_id) AS n_rows,
           CAST(1 + COUNT(DISTINCT event_type) AS INT) AS n_cols
    FROM typed GROUP BY etype
    """,
)
def flatten_auto_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated flattening (reference: README.md:136-137,246-248): one flat
    table per attribute-domain partition. The N wide tables themselves have
    no single-statement ANSI twin, but their full shape contract does:
    per-type row count = |distinct entities| and width = 1 + |distinct
    attributes| — which is what the oracle pins."""
    ev = table(spark, sf_dir, "events").withColumn(
        "etype", F.when(F.col("user_id") % 2 == 0, "even_users").otherwise("odd_users")
    )
    res = auto_flatten_by_type(ev, "etype", EVENTS_SPEC)
    # per-type count jobs submitted concurrently (run_per_type) — a driver
    # for-loop would serialize N independent Spark jobs
    counts = run_per_type(res, lambda _n, df: (df.count(), len(df.columns)))
    rows = [(name, *counts[name]) for name in sorted(res.tables)]
    return spark.createDataFrame(rows, "table_name string, n_rows long, n_cols int")


@query(
    "dim_scd2",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev,
             LAG(tus) OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS prev_ts
      FROM events
    ), c AS (
      SELECT user_id, event_type, tus, event_id FROM o
      WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev
    )
    SELECT user_id, event_type, tus AS valid_from,
           LEAD(tus) OVER (PARTITION BY user_id
                           ORDER BY tus, event_id) AS valid_to,
           LEAD(tus) OVER (PARTITION BY user_id
                           ORDER BY tus, event_id) IS NULL AS is_current
    FROM c
    """,
)
def dim_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 backfill: collapse each user's event_type history into type-2
    validity intervals (change-suppressed, LEAD-closed). Timestamps are
    pre-truncated to µs so ordering and interval bounds share the oracle's
    grain (events.parquet is TIMESTAMP(NANOS); DuckDB reads µs)."""
    from openmrs_module_mamba_etl_spark.operators.scd2 import scd2_from_history

    ev = table(spark, sf_dir, "events").withColumn(
        "tus", F.expr("ts div 1000")
    )
    return scd2_from_history(
        ev, key_col="user_id", attr_col="event_type",
        ts_col="tus", tiebreak_col="event_id",
    )


@query(
    "flatten_column_groups",
    oracle=_LATEST_CTE
    + """
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click'    THEN value END) AS click,
           MAX(CASE WHEN event_type = 'error'    THEN value END) AS error,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           MAX(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
           MAX(CASE WHEN event_type = 'view'     THEN value END) AS view
    FROM latest WHERE rn = 1 GROUP BY user_id
    """,
)
def flatten_column_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizontal column partitioning of the flat table — the reference's
    `mambaetl.analysis.columns` cap (README.md:130-131,154: MySQL rows
    break past ~160 columns, so wide flats split into sibling tables
    sharing the entity key). Columnar parquet has NO width ceiling, so
    Spark doesn't need this — but the export surface keeps it for
    MySQL-compatible handoff: the flat table is written as column-group
    tables (cap forced to 3 here ⇒ two groups) and the re-join on the
    entity key must be LOSSLESS (this oracle is the unsplit flatten's).
    At export scale, write the group tables bucketed on the entity key so
    the re-join is exchange-free."""
    import os

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
    )

    from openmrs_module_mamba_etl_spark.operators.flatten import discover_attrs

    ev = table(spark, sf_dir, "events")
    # discovered ∪ declared event types: the export schema (and the g0
    # group dir) must exist even on an empty increment
    attrs = sorted(
        set(discover_attrs(ev, EVENTS_SPEC)) | set(EVENT_TYPE_CONTRACT)
    )
    wide = flatten(ev, EVENTS_SPEC, attrs=attrs)
    value_cols = [c for c in wide.columns if c != "user_id"]
    cap = 3  # force >1 group on the 5-attribute fixture
    groups = [value_cols[i : i + cap] for i in range(0, len(value_cols), cap)]
    target = _scratch_dir("flatten_column_groups")
    for gi, cols in enumerate(groups):
        wide.select("user_id", *cols).write.mode("overwrite").parquet(
            os.path.join(target, f"g{gi}")
        )
    out = spark.read.parquet(os.path.join(target, "g0"))
    for gi in range(1, len(groups)):
        out = out.join(
            spark.read.parquet(os.path.join(target, f"g{gi}")), "user_id"
        )
    return out.select("user_id", *value_cols)


@query(
    "stream_flatten",
    oracle=_LATEST_CTE
    + """
    SELECT user_id,
           MAX(CASE WHEN event_type = 'click'    THEN value END) AS click,
           MAX(CASE WHEN event_type = 'error'    THEN value END) AS error,
           MAX(CASE WHEN event_type = 'purchase' THEN value END) AS purchase,
           MAX(CASE WHEN event_type = 'signup'   THEN value END) AS signup,
           MAX(CASE WHEN event_type = 'view'     THEN value END) AS view
    FROM latest WHERE rn = 1 GROUP BY user_id
    """,
)
def stream_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS refresh of the signature EAV flatten — the reference's
    periodic incremental ETL (README.md:133-140, 1800 s scheduler)
    expressed streaming-natively: a foreachBatch drain maintains the flat
    table's CELL STORE — latest (value, ts) per (entity, attribute) —
    merging each micro-batch by event time with atomic versioned publish;
    the wide table is a projection (one MAX(CASE) aggregate) of that
    state. Four time-split micro-batches must converge to EXACTLY the
    one-shot ``pivot_eav_flatten`` answer (same oracle), proving the
    incremental refresh is batch-boundary-invariant. At scale the cell
    store is hash-partitioned by entity and each merge touches only
    changed cells — incremental cost ∝ change volume, the reference's
    incremental-mode contract."""
    import os
    import shutil

    from pyspark.sql import Window

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
    )
    from openmrs_module_mamba_etl_spark.inventory.window_queries import (
        _EVENTS_STREAM_SCHEMA,
        _drain,
    )

    scratch = _scratch_dir("stream_flatten")
    src = os.path.join(scratch, "in")
    (
        table(spark, sf_dir, "events")
        .repartitionByRange(4, "ts")
        .write.mode("overwrite")
        .parquet(src)
    )

    cur: dict[str, str] = {}

    def latest_cells(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").desc()
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )

    def merge(batch: DataFrame, batch_id: int) -> None:
        ss = batch.sparkSession
        cells = latest_cells(
            batch.select("user_id", "event_type", "value", "ts")
        )
        if "path" in cur:
            cells = latest_cells(
                ss.read.parquet(cur["path"]).unionByName(cells)
            )
        new_path = os.path.join(scratch, f"cells_v{batch_id}")
        cells.write.mode("overwrite").parquet(new_path)
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

    if "path" in cur:
        cells = spark.read.parquet(cur["path"])
    else:  # zero micro-batches (empty source): empty cell store
        cells = spark.createDataFrame(
            [], "user_id long, event_type string, value double, ts long"
        )
    # Discovered attributes ∪ the oracle's declared event-type contract:
    # on an empty/partial increment the wide schema must stay stable (the
    # same empty-increment rule as plans/clinical.py REPORT_CONTRACT_ATTRS),
    # and an empty attrs list would make agg() throw outright.
    attrs = sorted(
        {r[0] for r in cells.select("event_type").distinct().collect()}
        | set(EVENT_TYPE_CONTRACT)
    )
    return cells.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == a, F.col("value"))
            ).alias(a)
            for a in attrs
        ]
    )
