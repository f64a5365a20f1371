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
    "window_trending",
    oracle=f"""
    WITH weekly AS (
      SELECT (epoch_us(ts) // {_US_PER_DAY}) // 7 AS wk, event_type,
             ROUND(SUM(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT wk, event_type, total, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY wk
                                   ORDER BY total DESC, event_type ASC)
                  AS rnk
      FROM weekly
    ) WHERE rnk <= 3
    """,
)
def window_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items per time bucket: top-3 event types by weekly value
    — the product-analytics leaderboard shape. One map-side-combined
    (week, type) rollup then a rank window partitioned by week; the
    window input is #weeks × #types rows, so the ranking cost is
    bucket-bounded regardless of event volume."""
    ev = table(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.expr(f"((ts div 1000) div {_US_PER_DAY}) div 7").alias("wk"),
        "event_type",
    ).agg(F.round(F.sum("value"), 2).alias("total"))
    w = Window.partitionBy("wk").orderBy(
        F.col("total").desc(), F.col("event_type").asc()
    )
    return (
        weekly.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("wk", "event_type", "total", "rnk")
    )


@query(
    "rollup_interpolate",
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
    ), j AS (
      SELECT s.day_idx, a.day_value, a.day_idx AS a_day_idx
      FROM spine s LEFT JOIN actual a ON s.day_idx = a.day_idx
    ), ctx AS (
      SELECT day_idx, day_value,
             LAST_VALUE(day_value IGNORE NULLS) OVER (
               ORDER BY day_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             LAST_VALUE(a_day_idx IGNORE NULLS) OVER (
               ORDER BY day_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pi,
             FIRST_VALUE(day_value IGNORE NULLS) OVER (
               ORDER BY day_idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
             FIRST_VALUE(a_day_idx IGNORE NULLS) OVER (
               ORDER BY day_idx
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ni
      FROM j
    )
    SELECT day_idx, day_value,
           CASE WHEN day_value IS NOT NULL THEN day_value
                WHEN pv IS NULL OR nv IS NULL THEN NULL
                ELSE ROUND(pv + (nv - pv) * (day_idx - pi)
                           / (ni - pi), 6)
           END AS interp_value
    FROM ctx ORDER BY day_idx
    """,
)
def rollup_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill with LINEAR interpolation — the TimescaleDB
    ``interpolate`` sibling of rollup_gapfill's LOCF: each gap day takes
    the line between the previous and next observed points; leading/
    trailing gaps (no anchor on one side) stay NULL.

    Same spine + join shape as LOCF, plus one backward-looking and one
    forward-looking window over the SAME ordering — Catalyst evaluates
    both frame directions in one Window operator pair over a single sort,
    so the marginal cost vs LOCF is an extra scan of the (time-range-
    proportional) spine, never of the data."""
    ev = table(spark, sf_dir, "events").where(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0)
    )
    actual = ev.groupBy(
        F.expr(f"(ts div 1000) div {_US_PER_DAY}").alias("day_idx")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    spine = (
        actual.agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day_idx"))
    )
    joined = spine.join(
        actual.withColumnRenamed("day_idx", "a_day_idx"),
        F.col("day_idx") == F.col("a_day_idx"),
        "left_outer",
    )
    wb = Window.orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.orderBy("day_idx").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    pv = F.last("day_value", ignorenulls=True).over(wb)
    pi = F.last("a_day_idx", ignorenulls=True).over(wb)
    nv = F.first("day_value", ignorenulls=True).over(wf)
    ni = F.first("a_day_idx", ignorenulls=True).over(wf)
    interp = (
        F.when(F.col("day_value").isNotNull(), F.col("day_value"))
        .when(pv.isNull() | nv.isNull(), F.lit(None))
        .otherwise(
            F.round(pv + (nv - pv) * (F.col("day_idx") - pi) / (ni - pi), 6)
        )
    )
    return (
        joined.select(
            "day_idx", "day_value", interp.alias("interp_value")
        ).orderBy("day_idx")
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


@query(
    "agg_market_basket",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           COUNT(*) AS support
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING COUNT(*) >= 2
    """,
)
def agg_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs ordered together in >= 2
    distinct orders, with support counts (the frequent-itemset k=2 pass).

    Apriori pruning makes the pair blowup scale-safe: a pair can reach
    support 2 only if BOTH parts appear in >= 2 orders, so items are
    pre-filtered against the frequent-item set (one aggregate + semi
    join) before the basket self-join. The pruning is provably lossless
    — the oracle is the UNPRUNED self-join with HAVING — and at 100 TB
    it is the difference between pairing every basket and pairing only
    the frequent tail. The self-join shuffles on orderkey, the pair
    count on (part_a, part_b): two shuffles, both on keys that
    hash-spread evenly."""
    items = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    freq = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
        .select("l_partkey")
    )
    pruned = items.join(freq, "l_partkey", "left_semi")
    a = pruned.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_a")
    )
    b = pruned.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, "_ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= 2)
    )


@query(
    "cohort_retention",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_type,
             (epoch_us(ts) // 86400000000) // 7 AS wk
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(wk) AS cohort_wk
      FROM ev WHERE event_type = 'signup' GROUP BY user_id
    )
    SELECT c.cohort_wk, e.wk - c.cohort_wk AS week_offset,
           COUNT(DISTINCT e.user_id) AS n_active
    FROM ev e JOIN cohort c ON e.user_id = c.user_id
    WHERE e.wk >= c.cohort_wk
    GROUP BY c.cohort_wk, week_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by signup week, counted as
    active in each subsequent week offset — the canonical product-
    analytics triangle.

    Week indices are integer µs-epoch arithmetic (``div``, never float
    division — exact in both engines). Cohort assignment and the
    activity join both key on ``user_id``, so the whole query is one
    user_id shuffle followed by a (cohort, offset) hash aggregate; the
    cohort side is |users|, small enough to broadcast at most scales."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("(ts div 1000) div 86400000000 div 7").alias("wk"),
    )
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_wk"))
    )
    return (
        ev.join(cohort, "user_id")
        .where(F.col("wk") >= F.col("cohort_wk"))
        .withColumn("week_offset", F.col("wk") - F.col("cohort_wk"))
        .groupBy("cohort_wk", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "window_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS prev_event
      FROM events
    )
    SELECT prev_event, event_type AS next_event, COUNT(*) AS n
    FROM seq WHERE prev_event IS NOT NULL
    GROUP BY prev_event, next_event
    """,
)
def window_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user event streams:
    counts of (previous event -> next event) adjacent pairs per the
    per-user timeline.

    The lag is one ``user_id`` sort-window — no self-join on sequence
    position — and the transition count is a 25-cell hash aggregate
    whose map-side combine collapses nearly everything before the
    (tiny) final shuffle. Ordering ties break on ``event_id`` so the
    sequence, and therefore the matrix, is engine-independent."""
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    return (
        ev.withColumn("prev_event", F.lag("event_type").over(w))
        .where(F.col("prev_event").isNotNull())
        .groupBy("prev_event", F.col("event_type").alias("next_event"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_fuzzy_blocked",
    oracle="""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS dist,
           a.n AS n_a, b.n AS n_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND levenshtein(a.p_name, b.p_name) <= 2
    """,
)
def join_fuzzy_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity-resolution join: pairs of part-name spellings within
    Levenshtein distance 2, with each spelling's row count (cluster
    sizing for canonicalization).

    Two scale defenses stack: (1) comparison runs over the DISTINCT
    name vocabulary (one hash aggregate), never row pairs — vocab is
    sublinear in corpus size; (2) candidates are blocked on the name's
    noun token, so comparisons are |block|^2 over small blocks, not
    |vocab|^2. Blocking is lossless here because inter-noun edit
    distance (>= 3) exceeds the threshold; the oracle is the UNBLOCKED
    all-pairs join, so parity proves no true pair escaped the blocks."""
    names = (
        table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("_block", F.split("p_name", " ").getItem(1))
    )
    a = names.select(
        F.col("_block"), F.col("p_name").alias("name_a"), F.col("n").alias("n_a")
    )
    b = names.select(
        F.col("_block"), F.col("p_name").alias("name_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, "_block")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .where(F.col("dist") <= 2)
        .select("name_a", "name_b", "dist", "n_a", "n_b")
    )


@query(
    "agg_path_sequences",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS rn
      FROM events
    ), paths AS (
      SELECT user_id,
             STRING_AGG(event_type, '->' ORDER BY rn) AS path
      FROM ranked WHERE rn <= 5 GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
    """,
)
def agg_path_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: each user's first five events joined
    into an ordered path string, counted across users — the funnel-
    discovery complement of ``window_funnel`` (which checks ONE known
    path; this surfaces which paths exist).

    One ``user_id`` sort-window ranks events, the head filter bounds
    per-user state to five rows, and the path assembly is an in-group
    ``array_sort`` over those five structs (struct order = (time, id,
    type), so the tie order is pinned and engine-independent). Path
    cardinality, not user count, sizes the final aggregate."""
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.expr("ts div 1000").alias("tus")
    )
    paths = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("tus", "event_id", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                "->",
            ).alias("path")
        )
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "window_zscore_outliers",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             SUM(value) AS total
      FROM events GROUP BY event_type, day
    ), scored AS (
      SELECT event_type, day, total,
             AVG(total) OVER (PARTITION BY event_type) AS mu,
             STDDEV_SAMP(total) OVER (PARTITION BY event_type) AS sd
      FROM daily
    )
    SELECT event_type, day, ROUND(total, 2) AS total,
           ROUND((total - mu) / sd, 2) AS z
    FROM scored WHERE sd > 0 AND ABS((total - mu) / sd) > 2
    """,
)
def window_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection on the metric stream: days whose per-type total
    deviates more than two sample standard deviations from that type's
    mean — the monitoring query behind every alerting rule.

    The daily aggregate collapses events to |types|x|days| rows BEFORE
    the statistics window touches anything, so mean/stddev run over the
    tiny rollup, not the raw stream; at 100 TB the only full-data pass
    is the decomposable SUM with map-side combine."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        )
        .agg(F.sum("value").alias("total"))
    )
    w = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        "total",
        F.avg("total").over(w).alias("mu"),
        F.stddev_samp("total").over(w).alias("sd"),
    )
    z = (F.col("total") - F.col("mu")) / F.col("sd")
    return (
        scored.where((F.col("sd") > 0) & (F.abs(z) > 2))
        .select(
            "event_type",
            "day",
            F.round("total", 2).alias("total"),
            F.round(z, 2).alias("z"),
        )
    )


def _pagerank_oracle(iters: int) -> str:
    """Chained-CTE unrolling of the power iteration (one CTE per round)
    so the oracle stays plain ANSI SQL — no reliance on aggregates
    inside recursive terms."""
    ctes = [
        """edges AS (
      SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY src, dst
    )""",
        """outw AS (SELECT src, SUM(w) AS total FROM edges GROUP BY src)""",
        """norm AS (
      SELECT e.src, e.dst, e.w / o.total AS p
      FROM edges e JOIN outw o ON e.src = o.src
    )""",
        """pr0 AS (SELECT n_nationkey AS node, 1.0 AS pr FROM nation)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""pr{i} AS (
      SELECT n.n_nationkey AS node,
             0.15 + 0.85 * COALESCE(SUM(m.p * prev.pr), 0) AS pr
      FROM nation n
      LEFT JOIN norm m ON m.dst = n.n_nationkey
      LEFT JOIN pr{i - 1} prev ON prev.node = m.src
      GROUP BY n.n_nationkey
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"\n    SELECT node, ROUND(pr, 2) AS pagerank FROM pr{iters}"
    )


@query(
    "graph_triangles",
    oracle="""
    WITH contracted AS (
      SELECT c.c_nationkey AS cn, s.s_nationkey AS sn
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
    ), e AS (
      SELECT DISTINCT LEAST(cn, sn) AS a, GREATEST(cn, sn) AS b
      FROM contracted WHERE cn <> sn
    )
    SELECT 'n_nodes' AS metric,
           (SELECT COUNT(DISTINCT x) FROM (
              SELECT a AS x FROM e UNION SELECT b FROM e)) AS value
    UNION ALL
    SELECT 'n_edges', (SELECT COUNT(*) FROM e)
    UNION ALL
    SELECT 'n_triangles',
           (SELECT COUNT(*) FROM e e1
            JOIN e e2 ON e1.b = e2.a
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the undirected nation trade graph — the
    clustering-structure metric next to PageRank (centrality) and
    connected components (reachability). The oriented-edge formulation:
    every edge stored once as (a < b), wedges from E⋈E on the middle
    node, closed by a second equi-join — each triangle counted exactly
    once, no symmetry factor. At scale the standard refinement orients
    by DEGREE instead of id so the wedge join fans out on low-degree
    middles; the plan shape (two equi-joins over the contracted edge
    list) is identical. The expensive step here, as in pagerank, is the
    one pass contracting the fact table to |nations|² edges."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    e = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a"))
    tri = wedges.join(
        e3,
        (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
    ).agg(F.count(F.lit(1)).alias("value"))
    nodes = (
        e.select(F.col("a").alias("x"))
        .union(e.select(F.col("b").alias("x")))
        .agg(F.countDistinct("x").alias("value"))
    )
    n_edges = e.agg(F.count(F.lit(1)).alias("value"))

    def tag(df: DataFrame, name: str) -> DataFrame:
        return df.select(F.lit(name).alias("metric"), "value")

    # union of three aggregates, not a 1×1 cross join: keeps the summary
    # plan join-free above the graph joins (the profile_constraints rule)
    return (
        tag(nodes, "n_nodes")
        .unionByName(tag(n_edges, "n_edges"))
        .unionByName(tag(tri, "n_triangles"))
    )


@query("graph_pagerank", oracle=_pagerank_oracle(3))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation-level trade graph (customer
    nation -> supplier nation, edge weight = lineitem count): the
    iterative-graph-algorithm representative alongside
    ``dedup_clusters``'s label propagation.

    The expensive part is the ONE pass that contracts 100 TB of fact
    rows into the |nations|^2 edge list; the power iteration then runs
    on the contracted graph. Each round is a join + dst-keyed hash
    aggregate — at web scale the same loop hash-partitions ranks and
    edges on the same key so iterations reuse one co-partitioning —
    and every round is ``localCheckpoint``-ed to stop logical-plan
    growth (the iterative-loop rule from dedup_clusters)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node")
    )
    edges = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("total"))
    norm = (
        edges.join(outw, "src")
        .select("src", "dst", (F.col("w") / F.col("total")).alias("p"))
        .localCheckpoint()
    )
    ranks = nation.select("node", F.lit(1.0).alias("pr"))
    for _ in range(3):
        contrib = (
            norm.join(ranks, norm["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("pr")).alias("incoming"))
        )
        ranks = (
            nation.join(contrib, nation["node"] == contrib["dst"], "left")
            .select(
                "node",
                (0.15 + 0.85 * F.coalesce("incoming", F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("pr", 2).alias("pagerank"))


@query(
    "window_ewma",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             ROUND(SUM(value), 2) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day,
           ROUND(
             (total * 0.3
              + COALESCE(LAG(total, 1) OVER w, 0) * 0.3 * 0.7
              + COALESCE(LAG(total, 2) OVER w, 0) * 0.3 * 0.49
              + COALESCE(LAG(total, 3) OVER w, 0) * 0.3 * 0.343
              + COALESCE(LAG(total, 4) OVER w, 0) * 0.3 * 0.2401
              + COALESCE(LAG(total, 5) OVER w, 0) * 0.3 * 0.16807
              + COALESCE(LAG(total, 6) OVER w, 0) * 0.3 * 0.117649),
             4) AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
)
def window_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over the per-type daily
    rollup (α=0.3, 7-day horizon) — the smoothing primitive behind
    monitoring dashboards and anomaly baselines.

    Finite-horizon formulation as an explicit lag-weight sum: the
    textbook recursive EWMA is inexpressible declaratively, and the
    closed-form ``(1-α)^(d)``-rescaling trick explodes ``(1-α)^(-d)``
    beyond double range on long histories. Seven lag terms with literal
    weights are exact, engine-portable (the oracle is the same seven
    terms), and stay inside one window sort — the same single exchange
    every other per-type window here uses. The daily pre-aggregate
    contracts the stream first, so the window runs over |types|×|days|
    rows, never raw events."""
    a = 0.3
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("(ts div 1000) div 86400000000").alias("day"),
        )
        .agg(F.round(F.sum("value"), 2).alias("total"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    terms = F.col("total") * F.lit(a)
    for k in range(1, 7):
        terms = terms + F.coalesce(
            F.lag("total", k).over(w), F.lit(0.0)
        ) * F.lit(a * (1 - a) ** k)
    return daily.select(
        "event_type", "day", F.round(terms, 4).alias("ewma")
    )


@query(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), t AS (
      SELECT user_id, SUM(n) AS total FROM c GROUP BY 1
    )
    SELECT c.user_id,
           ROUND(-SUM((n * 1.0 / total) * LOG2(n * 1.0 / total)), 4)
             AS type_entropy
    FROM c JOIN t ON c.user_id = t.user_id
    GROUP BY c.user_id
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity profile (0 = single-type bots, log2(5) ≈ 2.32 =
    uniform across all five types). Two hash aggregates sharing the
    user_id partitioning plus a broadcast-sized totals join; the entropy
    sum runs over ≤|types| rows per user, so the plan is aggregate-bound
    at any scale."""
    c = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy("user_id").agg(F.sum("n").alias("total"))
    p = F.col("n") / F.col("total")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(F.round(-F.sum(p * F.log2(p)), 4).alias("type_entropy"))
    )
