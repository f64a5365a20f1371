"""Behavioral / pipeline-hygiene analytics: ordered funnel, PII redaction,
time-bucket gap-fill.

These extend the free-form report surface (reference: README.md:288-328)
with the event-analytics and data-curation shapes a training-data pipeline
needs (SURVEY.md §2.I): a ClickHouse-style ordered conversion funnel, a
regex PII scrubber for text corpora, and a TimescaleDB-style
``time_bucket_gapfill`` + LOCF interpolation over sparse series.

Scale notes: the funnel is three window passes + two aggregates all
partitioned by ``user_id`` — ONE hash shuffle end to end, state per user
is three timestamps. Redaction is pure codegen-side ``regexp_replace``
(no Python in the hot path). Gap-fill builds the calendar from one
aggregate row (``sequence`` + explode, broadcast-joined) so the dense
spine never shuffles the fact side on anything but its natural key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table

_US_PER_DAY = 86_400_000_000


@query(
    "window_funnel",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
    ), s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
                  OVER (PARTITION BY user_id) AS t1
      FROM e
    ), s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t1 THEN tus END)
                  OVER (PARTITION BY user_id) AS t2
      FROM s1
    ), s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t2 THEN tus END)
                  OVER (PARTITION BY user_id) AS t3
      FROM s2
    ), per_user AS (
      SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
      FROM s3 GROUP BY user_id
    )
    SELECT COUNT(user_id) AS n_users,
           COUNT(t1) AS n_viewed,
           COUNT(t2) AS n_clicked_after_view,
           COUNT(t3) AS n_purchased_after_click
    FROM per_user
    """,
)
def window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view→click→purchase: a stage counts only
    when it happens strictly *after* the user's earliest previous stage
    (the windowFunnel semantics — min-over-partition per stage, each
    conditioned on the prior stage's time).

    All three window passes and both aggregates share the ``user_id``
    hash partitioning: one shuffle, per-user state = three timestamps,
    so the plan is linear in events at any scale."""
    w = Window.partitionBy("user_id")
    ev = (
        table(spark, sf_dir, "events")
        .select("user_id", "event_type", F.expr("ts div 1000").alias("tus"))
        .withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "view", F.col("tus"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("tus") > F.col("t1")),
                    F.col("tus"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("tus") > F.col("t2")),
                    F.col("tus"),
                )
            ).over(w),
        )
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("user_id").alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after_view"),
        F.count("t3").alias("n_purchased_after_click"),
    )


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?1-[0-9]{3}-[0-9]{3}-[0-9]{4}"
_IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


@query(
    "text_pii_redact",
    oracle=f"""
    WITH synth AS (
      SELECT doc_id,
             substr(text, 1, 60) || ' reach user' || doc_id ||
             '@mail.example or +1-202-555-' ||
             lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' from 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
               AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM synth
    """,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for text corpora: email / phone / IPv4 patterns
    replaced with typed placeholder tokens (SURVEY.md §2.I curation).

    The testdata corpus is synthetic word-soup, so deterministic
    PII-shaped strings are first woven in from ``doc_id`` (identically in
    the oracle) and then redacted — the check exercises the scrubber, not
    the generator. Map-only codegen ``regexp_replace`` chain: no shuffle,
    no Python, linear scan at any corpus size."""
    docs = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring("text", 1, 60),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-202-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return docs.select("doc_id", redacted.alias("redacted"))


@query(
    "rollup_gapfill",
    oracle=f"""
    WITH actual AS (
      SELECT epoch_us(ts) // {_US_PER_DAY} AS day_idx,
             ROUND(SUM(value), 2) AS day_value
      FROM events
      WHERE event_type = 'purchase' AND user_id % 97 = 0
      GROUP BY 1
    ), bounds AS (
      SELECT MIN(day_idx) AS lo, MAX(day_idx) AS hi FROM actual
    ), spine AS (
      SELECT UNNEST(generate_series(lo, hi)) AS day_idx FROM bounds
    )
    SELECT s.day_idx,
           a.day_value,
           LAST_VALUE(a.day_value IGNORE NULLS)
             OVER (ORDER BY s.day_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS locf_value,
           (a.day_idx IS NULL) AS is_gap
    FROM spine s LEFT JOIN actual a ON s.day_idx = a.day_idx
    ORDER BY s.day_idx
    """,
)
def rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap-fill with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill`` + ``locf`` idiom over a sparse
    per-day series (a thin user slice so real gaps exist in a month of
    events).

    The dense day spine comes from ONE aggregate row expanded with
    ``sequence``+``explode`` and joined back; the carry-forward is a
    single ordered window. At scale the spine is proportional to the
    time range (not the data) and the series is grouped per entity, so
    the window partitions by entity — here the single-series case, which
    keeps the oracle exact."""
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0)
    )
    actual = ev.groupBy(
        F.expr(f"(ts div 1000) div {_US_PER_DAY}").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    spine = (
        actual.agg(
            F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi")
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day_idx"))
    )
    w = (
        Window.orderBy("day_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = spine.join(
        actual.withColumnRenamed("day_idx", "a_day_idx"),
        F.col("day_idx") == F.col("a_day_idx"),
        "left_outer",
    )
    return (
        joined.select(
            "day_idx",
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
            F.col("a_day_idx").isNull().alias("is_gap"),
        )
        .orderBy("day_idx")
    )
