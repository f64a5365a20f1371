"""Corpus-mining inventory: span-level dedup, classical model training as
aggregation, and concentration diagnostics.

These extend the training-data-pipeline surface (SURVEY.md §2.I) with the
ops a curation team reaches for right after document-level dedup: removing
*repeated spans* inside otherwise-unique documents (the C4 / Falcon
"duplicated line" filter, here at token-segment granularity since the
synthetic corpus has no newlines), fitting the tiny models used as quality
gates (multinomial naive Bayes, closed-form OLS), TF-IDF keyword
extraction, and a Gini concentration report.

Bit-exactness strategy, same as the rest of the inventory: integer
counts stay integral until a final double division; money/quantity
doubles are cast to DECIMAL(14,2) so every SUM is exact and
order-independent, and only the final scalar arithmetic (identical
expression text on both engines) runs in IEEE doubles, rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from openmrs_module_mamba_etl_spark.functions.similarity import tokens
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table

#: DuckDB expression mirroring functions.similarity.tokens().
_TOKS = (
    "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"
)

#: Segment width (tokens) for span-level dedup.
_SEG = 16


# --- span-level (segment) dedup ------------------------------------------


@query(
    "text_segment_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
    ), expl AS (
      SELECT doc_id, toks,
             unnest(range(CAST(ceil(len(toks) / {_SEG}.0) AS BIGINT))) AS seg_idx
      FROM t WHERE len(toks) > 0
    ), segs AS (
      SELECT doc_id, seg_idx,
             array_to_string(
               list_slice(toks, seg_idx * {_SEG} + 1,
                          least((seg_idx + 1) * {_SEG}, len(toks))),
               ' ') AS seg
      FROM expl
    ), ranked AS (
      SELECT doc_id, seg_idx, seg,
             ROW_NUMBER() OVER (
               PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    )
    SELECT doc_id,
           COUNT(*) AS n_segs,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(
             string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY seg_idx),
             '')) AS kept_hash
    FROM ranked GROUP BY doc_id
    """,
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (the C4 "remove duplicated lines" / Falcon
    repeated-span filter, at fixed 16-token segment granularity): every
    document is split into consecutive token segments, each segment
    survives only at its FIRST corpus occurrence (lowest ``(doc_id,
    seg_idx)``), and each document reports how much of it survived plus a
    hash of its cleaned text.

    Scale shape: the winner election shuffles ``(md5(seg), doc_id,
    seg_idx)`` triples keyed on the content hash — segment text itself is
    carried only for the final reassembly, which shuffles on ``doc_id``
    (the same key the scan is naturally clustered by). Two shuffles, both
    with contracted payloads; no corpus-sized broadcast, no driver
    collection. At 100 TB the hash shuffle is the classic dedup exchange —
    uniform by construction (md5), so no salting needed."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .where(F.size("toks") > 0)
    )
    segs = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / F.lit(float(_SEG))).cast("int")
                    - F.lit(1),
                ),
                lambda i: F.array_join(
                    F.slice(F.col("toks"), i * _SEG + 1, _SEG), " "
                ),
            )
        ).alias("seg_idx", "seg"),
    ).select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"), "seg")
    ranked = segs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy(F.md5("seg")).orderBy("doc_id", "seg_idx")
        ),
    )
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("seg_idx", "seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("kept_hash"),
    )


# --- classical model training as aggregation ------------------------------


@query(
    "train_naive_bayes",
    oracle=f"""
    WITH t AS (
      SELECT lang, {_TOKS} AS toks FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL
    ), posting AS (
      SELECT lang, unnest(toks) AS token FROM t
    ), counts AS (
      SELECT lang, token, COUNT(*) AS cnt FROM posting GROUP BY lang, token
    ), totals AS (
      SELECT lang, CAST(SUM(cnt) AS BIGINT) AS tot FROM counts GROUP BY lang
    ), vocab AS (
      SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS v FROM posting
    )
    SELECT c.lang, c.token, CAST(c.cnt AS BIGINT) AS cnt,
           ROUND(ln((c.cnt + 1.0) / (t.tot + (SELECT v FROM vocab))), 6)
             AS log_prob
    FROM counts c JOIN totals t USING (lang)
    """,
)
def train_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes training (Laplace-smoothed token
    likelihoods per language class) — the classic fastText-before-fastText
    quality/language gate, expressed as pure aggregation: the "model" IS a
    groupBy result.

    Scale shape: one posting-list shuffle keyed on ``(lang, token)`` with
    full map-side combine (the only exchange proportional to data); class
    totals re-aggregate the already-contracted count table
    (#langs×#vocab rows), and the vocabulary size is a single
    ``COUNT(DISTINCT)`` scalar re-entering the plan as a literal join-free
    divisor via a 1-row broadcast. Output is model-sized, never
    corpus-sized. ``ln`` of an exact integer ratio is deterministic IEEE
    double on both engines."""
    posting = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & F.col("lang").isNotNull())
        .select("lang", F.explode(tokens(F.col("text"))).alias("token"))
    )
    counts = posting.groupBy("lang", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.groupBy("lang").agg(F.sum("cnt").alias("tot"))
    vocab = posting.agg(
        F.count_distinct("token").cast("double").alias("v")
    )
    return (
        counts.join(F.broadcast(totals), "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang",
            "token",
            "cnt",
            F.round(
                F.log((F.col("cnt") + F.lit(1.0)) / (F.col("tot") + F.col("v"))),
                6,
            ).alias("log_prob"),
        )
    )


@query(
    "train_ols",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(q) AS DOUBLE) AS sq, CAST(SUM(d) AS DOUBLE) AS sd,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(q * q) AS DOUBLE) AS sqq,
             CAST(SUM(q * d) AS DOUBLE) AS sqd,
             CAST(SUM(d * d) AS DOUBLE) AS sdd,
             CAST(SUM(q * y) AS DOUBLE) AS sqy,
             CAST(SUM(d * y) AS DOUBLE) AS sdy,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM (SELECT CAST(l_quantity AS DECIMAL(14,2)) AS q,
                   CAST(l_discount AS DECIMAL(14,2)) AS d,
                   CAST(l_extendedprice AS DECIMAL(14,2)) AS y
            FROM lineitem)
    ), solved AS (
      SELECT n,
             n * (sqq * sdd - sqd * sqd)
               - sq * (sq * sdd - sqd * sd)
               + sd * (sq * sqd - sqq * sd) AS det,
             sy * (sqq * sdd - sqd * sqd)
               - sq * (sqy * sdd - sqd * sdy)
               + sd * (sqy * sqd - sqq * sdy) AS det0,
             n * (sqy * sdd - sdy * sqd)
               - sy * (sq * sdd - sqd * sd)
               + sd * (sq * sdy - sqy * sd) AS det1,
             n * (sqq * sdy - sqd * sqy)
               - sq * (sq * sdy - sqy * sd)
               + sy * (sq * sqd - sqq * sd) AS det2,
             sy, sqy, sdy, syy
      FROM m
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND(det0 / det, 6) AS b0,
           ROUND(det1 / det, 6) AS b1,
           ROUND(det2 / det, 6) AS b2,
           ROUND(1.0 - (syy - (det0 / det) * sy - (det1 / det) * sqy
                        - (det2 / det) * sdy)
                       / (syy - sy * sy / n), 6) AS r2
    FROM solved
    """,
)
def train_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multiple linear regression (``extendedprice ~ quantity +
    discount``) via the normal equations: one aggregation pass collects the
    9 second-moment sums, then a 3×3 Cramer solve runs as scalar column
    arithmetic on the single moment row — distributed training with a
    constant-size reduce, the textbook pattern for fitting linear quality
    predictors over a 100 TB corpus in one pass.

    Bit-exactness: inputs are cast to DECIMAL(14,2) so every moment SUM is
    exact integer arithmetic (order-independent across partitions — double
    sums would drift by fold order); the Cramer determinants then run in
    IEEE doubles with identical expression text on both engines.

    Scale shape: ONE map-side-combined aggregation producing a single row;
    the solve is plan-side scalar math (no driver round-trip, no second
    scan). Adding features grows the moment vector O(k²), never the data
    passes."""
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(14,2)").alias("q"),
        F.col("l_discount").cast("decimal(14,2)").alias("d"),
        F.col("l_extendedprice").cast("decimal(14,2)").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("q").cast("double").alias("sq"),
        F.sum("d").cast("double").alias("sd"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("q") * F.col("q")).cast("double").alias("sqq"),
        F.sum(F.col("q") * F.col("d")).cast("double").alias("sqd"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum(F.col("q") * F.col("y")).cast("double").alias("sqy"),
        F.sum(F.col("d") * F.col("y")).cast("double").alias("sdy"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    n, sq, sd, sy = F.col("n"), F.col("sq"), F.col("sd"), F.col("sy")
    sqq, sqd, sdd = F.col("sqq"), F.col("sqd"), F.col("sdd")
    sqy, sdy, syy = F.col("sqy"), F.col("sdy"), F.col("syy")
    solved = m.select(
        n,
        (
            n * (sqq * sdd - sqd * sqd)
            - sq * (sq * sdd - sqd * sd)
            + sd * (sq * sqd - sqq * sd)
        ).alias("det"),
        (
            sy * (sqq * sdd - sqd * sqd)
            - sq * (sqy * sdd - sqd * sdy)
            + sd * (sqy * sqd - sqq * sdy)
        ).alias("det0"),
        (
            n * (sqy * sdd - sdy * sqd)
            - sy * (sq * sdd - sqd * sd)
            + sd * (sq * sdy - sqy * sd)
        ).alias("det1"),
        (
            n * (sqq * sdy - sqd * sqy)
            - sq * (sq * sdy - sqy * sd)
            + sy * (sq * sqd - sqq * sd)
        ).alias("det2"),
        sy,
        sqy,
        sdy,
        syy,
    )
    det = F.col("det")
    b0 = F.col("det0") / det
    b1 = F.col("det1") / det
    b2 = F.col("det2") / det
    return solved.select(
        F.col("n").cast("long").alias("n"),
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(
            F.lit(1.0)
            - (syy - b0 * sy - b1 * sqy - b2 * sdy)
            / (syy - sy * sy / F.col("n")),
            6,
        ).alias("r2"),
    )


# --- TF-IDF keyword extraction --------------------------------------------


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents WHERE text IS NOT NULL
    ), posting AS (
      SELECT doc_id, unnest(toks) AS token FROM t
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM posting GROUP BY doc_id, token
    ), idf AS (
      SELECT token,
             ln(((SELECT COUNT(*) FROM t) + 1.0) / (COUNT(*) + 1.0)) + 1.0
               AS idf
      FROM tf GROUP BY token
    ), scored AS (
      SELECT tf.doc_id, tf.token,
             ROUND(tf.tf * idf.idf, 6) AS tfidf
      FROM tf JOIN idf USING (token)
    ), ranked AS (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS rk
      FROM scored
    )
    SELECT doc_id, token, tfidf, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (sklearn's smooth idf,
    ``ln((N+1)/(df+1)) + 1``) — the keyword-extraction primitive used for
    corpus topic audits and cluster labeling.

    Ranking compares the ROUNDED score (then token asc) so the order is a
    pure function of the published values — a last-ulp ``ln`` divergence
    between engines cannot flip ranks that the output itself can't
    distinguish.

    Scale shape: the ``(doc, token)`` tf shuffle is the posting-list
    exchange (map-side combined); document frequencies contract to
    vocab-sized and re-join the tf table — vocab ≪ corpus, so AQE picks a
    broadcast at realistic vocabulary sizes and a plain shuffled hash join
    beyond; the corpus total is a 1-row broadcast. Per-doc top-k is the
    windowed rank over the already-contracted tf table."""
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("toks"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    tf = docs.select(
        "doc_id", F.explode("toks").alias("token")
    ).groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    idf = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            (
                F.log((F.col("n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
                + F.lit(1.0)
            ).alias("idf"),
        )
    )
    scored = tf.join(idf, "token").select(
        "doc_id",
        "token",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    ranked = scored.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("tfidf").desc(), F.col("token").asc()
            )
        ),
    )
    return ranked.where(F.col("rk") <= 3)


# --- concentration diagnostics --------------------------------------------


@query(
    "agg_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
             CAST(o_totalprice AS DECIMAL(14,2)) AS x,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority
               ORDER BY o_totalprice ASC, o_orderkey ASC) AS i,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_g
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM((2 * i - n_g - 1) * x) AS DOUBLE)
                 / (COUNT(*) * CAST(SUM(x) AS DOUBLE)), 6) AS gini
    FROM ranked GROUP BY o_orderpriority
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order value per priority class — the
    concentration diagnostic a data-mixing pipeline runs on per-source
    token counts (here on the TPC-H money column the oracle can check):
    ``G = Σ(2i−n−1)·x₍ᵢ₎ / (n·Σx)`` over ascending-sorted values.

    Ties in ``x`` contribute identically under any permutation of a tied
    block (the weight sum over the block is order-free), and the
    within-group rank is tie-broken by key anyway — fully deterministic.
    DECIMAL sums keep the weighted accumulation exact; only the final
    division is floating point.

    Scale shape: one shuffle on the group key, then a per-group sort
    (window rank) and a map-side-combinable aggregate — the same shape as
    any percentile-by-group. Group count is tiny (5 priorities), but the
    per-group sort is distributed, not collected."""
    w = Window.partitionBy("o_orderpriority")
    ranked = table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(14,2)").alias("x"),
        F.row_number()
        .over(w.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc()))
        .alias("i"),
        F.count(F.lit(1)).over(w).alias("n_g"),
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(
                (2 * F.col("i") - F.col("n_g") - 1) * F.col("x")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("x").cast("double")),
            6,
        ).alias("gini"),
    )
