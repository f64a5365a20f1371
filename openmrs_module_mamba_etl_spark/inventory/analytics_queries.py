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

from openmrs_module_mamba_etl_spark.operators.rangejoin import (
    interval_overlap_join,
)
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


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey AS key, o_orderkey AS id,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS s,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 30 AS e
      FROM orders
    )
    SELECT a.key AS key, a.id AS a_id, b.id AS b_id
    FROM o a JOIN o b
      ON a.key = b.key AND a.id < b.id AND a.s < b.e AND b.s < a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of same-customer orders whose
    30-day fulfillment windows overlap (half-open), in integer
    epoch-day units (timezone-proof across engines).

    Runs through ``interval_overlap_join`` — bucketized (key, bucket)
    equi-join with first-common-bucket dedup — NOT a per-key theta join,
    so cost stays linear in replicated interval length at 100 TB. The
    oracle is the direct theta join, proving the bucketized plan emits
    exactly the true pair set, once each."""
    orders = table(spark, sf_dir, "orders")
    left = orders.select(
        F.col("o_custkey").alias("l_key"),
        F.col("o_orderkey").alias("a_id"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("a_s"),
        (F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) + 30).alias(
            "a_e"
        ),
    )
    right = orders.select(
        F.col("o_custkey").alias("r_key"),
        F.col("o_orderkey").alias("b_id"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("b_s"),
        (F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")) + 30).alias(
            "b_e"
        ),
    )
    pairs = interval_overlap_join(
        left,
        right,
        left_key="l_key",
        right_key="r_key",
        left_start="a_s",
        left_end="a_e",
        right_start="b_s",
        right_end="b_e",
        # near the interval length: replication factor ~2 per side
        bucket_width=30,
    )
    return pairs.where(F.col("a_id") < F.col("b_id")).select(
        F.col("l_key").alias("key"), "a_id", "b_id"
    )


@query(
    "window_pattern_match",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
    ), m AS (
      SELECT user_id, event_type, tus,
             MIN(CASE WHEN event_type = 'error' THEN tus END) OVER (
               PARTITION BY user_id ORDER BY tus
               RANGE BETWEEN CURRENT ROW AND 3600000000 FOLLOWING
             ) AS next_err
      FROM e
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           COUNT(next_err) AS n_error_within_1h
    FROM m WHERE event_type = 'purchase'
    GROUP BY user_id
    """,
)
def window_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection (MATCH_RECOGNIZE-lite): purchases
    followed by an error within one hour, counted per user.

    A value-based RANGE frame looks one hour ahead from every row and a
    conditional MIN picks the first error inside it — no self-join, no
    per-event pair blowup. The frame scan, the purchase filter, and the
    final aggregate all share the ``user_id`` partitioning: one shuffle,
    sorted-run state bounded by the frame width."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(0, 3_600_000_000)
    )
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    marked = ev.withColumn(
        "next_err",
        F.min(
            F.when(F.col("event_type") == "error", F.col("tus"))
        ).over(w),
    )
    return (
        marked.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("next_err").alias("n_error_within_1h"),
        )
    )


@query(
    "text_ngram_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents
      ) WHERE len(tok) > 0
    ), vocab AS (
      SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
    ), tot AS (
      SELECT SUM(n) AS total FROM vocab
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-LN(v.n / tot.total)), 2) AS avg_neg_logprob
    FROM toks t JOIN vocab v ON t.tok = v.tok CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def text_ngram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score (the CCNet recipe's shape):
    per-document mean negative log-probability under the corpus's own
    unigram distribution — high = rare-token-heavy/noisy, low = fluent.

    Two passes: (1) token histogram — the only token-keyed shuffle;
    (2) probabilities are ONE broadcast vocab join + a doc_id-keyed
    partial aggregate, so the scoring pass is map-side at any corpus
    size (vocab ≪ corpus; a real deployment broadcasts the top-K vocab
    and floors the tail)."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("tok"),
        )
        .where(F.length("tok") > 0)
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    total = vocab.agg(F.sum("n").alias("total"))
    vocab_p = vocab.crossJoin(F.broadcast(total))
    return (
        toks.join(F.broadcast(vocab_p), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("n") / F.col("total"))), 2
            ).alias("avg_neg_logprob"),
        )
    )


_URL_FRAGMENT_RE = "#.*$"
_URL_TRACKING_RE = "utm_[a-z]+=[^&#]*&?"
_URL_DANGLING_RE = "[?&]$"


@query(
    "dedup_url",
    oracle=f"""
    WITH urls AS (
      SELECT doc_id,
             'https://' || lower(source) || '.example.com/page/' ||
             (doc_id % 500) || '?utm_source=feed&utm_campaign=c' ||
             (doc_id % 7) || '&ref=' || (doc_id % 3) || '#sec' ||
             (doc_id % 5) AS url
      FROM documents
    ), canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(url, '{_URL_FRAGMENT_RE}', ''),
                 '{_URL_TRACKING_RE}', '', 'g'),
               '{_URL_DANGLING_RE}', '') AS canonical_url
      FROM urls
    )
    SELECT canonical_url,
           COUNT(*) AS n_dups,
           MIN(doc_id) AS keeper_id
    FROM canon
    GROUP BY canonical_url
    """,
)
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup (the CommonCrawl first-pass recipe):
    strip fragments and tracking params, then group on the canonical
    form keeping the smallest doc_id.

    URLs are woven deterministically from ``doc_id``/``source`` (the
    corpus is synthetic word-soup) identically in the oracle, so the
    check exercises the canonicalizer + keeper selection. Normalization
    is a map-only codegen regexp chain; the dedup is one hash aggregate
    on the canonical key — the same single-shuffle shape as
    ``dedup_exact`` at 100 TB."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.lower("source"),
        F.lit(".example.com/page/"),
        (F.col("doc_id") % 500).cast("string"),
        F.lit("?utm_source=feed&utm_campaign=c"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&ref="),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 5).cast("string"),
    )
    canonical = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(url, _URL_FRAGMENT_RE, ""),
            _URL_TRACKING_RE,
            "",
        ),
        _URL_DANGLING_RE,
        "",
    )
    return (
        docs.select(canonical.alias("canonical_url"), "doc_id")
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper_id"),
        )
    )
