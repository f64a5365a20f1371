"""Sampling / splitting / packing inventory (SURVEY.md §2.I).

Deterministic curation operators a training pipeline runs between dedup
and tokenization: hash-bucketed train/valid/test split, per-stratum
sampling, mixture reweighting toward target source shares, concat-and-
chunk sequence packing, and deterministic shard export. All decisions are
md5-bucket functions of the row id, so every oracle replicates them
exactly in ANSI SQL — these are value-hash checked, not rows-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.llm.sampling import (
    bucket_sql,
    hash_bucket,
    hash_split,
    mixture_sample,
    pack_sequences,
    priority_sql,
    stratified_sample,
    temperature_sample,
    weighted_priority_sample,
)
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table

_B = bucket_sql("doc_id")  # ('0x'||substr(md5(...),1,8))::BIGINT % 1000

#: permille kept per language stratum (others dropped) — an English-heavy
#: curation pass with long-tail languages downweighted.
_LANG_PM = {"en": 800, "de": 400, "fr": 400, "es": 250, "zh": 250}

#: target mixture over `source` and the total-row target it aims at.
_MIX_W = {"src0": 3, "src1": 2, "src2": 1}
_MIX_K = 60


@query(
    "sample_hash_split",
    oracle=f"""
    SELECT doc_id, b AS bucket,
           CASE WHEN b < 900 THEN 'train'
                WHEN b < 950 THEN 'valid'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_B} AS b FROM documents)
    """,
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test split: the split is a pure
    md5-bucket function of doc_id — no shuffle, no RNG, identical
    assignment at any scale/cluster/row-order (the reproducibility contract
    `df.randomSplit` cannot give a 100 TB pipeline)."""
    docs = table(spark, sf_dir, "documents")
    out = hash_split(
        docs, "doc_id", [("train", 900), ("valid", 950), ("test", 1000)]
    )
    return out.select("doc_id", "bucket", "split")


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM (SELECT doc_id, lang, {_B} AS b FROM documents)
    WHERE b < CASE lang WHEN 'en' THEN 800 WHEN 'de' THEN 400
                        WHEN 'fr' THEN 400 WHEN 'es' THEN 250
                        WHEN 'zh' THEN 250 ELSE 0 END
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic sampling: each stratum keeps its own
    permille of the id-bucket space (map-side CASE, zero shuffles)."""
    docs = table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", "lang", _LANG_PM).select(
        "doc_id", "lang"
    )


@query(
    "sample_mixture",
    oracle=f"""
    WITH rates AS (
      SELECT source, COUNT(*) AS n_rows,
             LEAST(1000, 1000 * (CASE source WHEN 'src0' THEN {3 * _MIX_K // 6}
                                             WHEN 'src1' THEN {2 * _MIX_K // 6}
                                             WHEN 'src2' THEN {1 * _MIX_K // 6}
                                             ELSE 0 END) // COUNT(*))
               AS rate_pm
      FROM documents GROUP BY source
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {bucket_sql('d.doc_id')} < r.rate_pm
    """,
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: resample sources toward 3:2:1 target shares.

    Per-source rates come from ONE tiny aggregate (rows = #sources,
    integer arithmetic so any engine derives identical rates), broadcast
    back as a map-side filter — the corpus itself is never shuffled."""
    docs = table(spark, sf_dir, "documents")
    return mixture_sample(docs, "doc_id", "source", _MIX_W, _MIX_K).select(
        "doc_id", "source"
    )


@query(
    "pack_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             {bucket_sql('doc_id', 8)} AS shard,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents
    )
    SELECT doc_id, shard, n_tok,
           CAST((SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tok) // 2048
                AS BIGINT) AS chunk_id
    FROM t
    """,
)
def pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing: documents concatenated in id order per
    shard, sliced every 2048 tokens — each doc's chunk is where its
    exclusive token prefix-sum lands (the pretraining loader layout).
    One shard-hash shuffle + one window cumsum; shard count bounds sort
    size and write parallelism at 100 TB."""
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
    )
    out = pack_sequences(docs, "doc_id", "n_tok", budget=2048, shards=8)
    return out.select("doc_id", "shard", "n_tok", "chunk_id")


@query(
    "pack_sliding_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), sized AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ), wins AS (
      SELECT doc_id, n, toks,
             CAST(unnest(generate_series(0, GREATEST(1,
               CAST(CEIL((n - 64) / 48.0) AS BIGINT) + 1) - 1)) AS INT)
               AS chunk_index
      FROM sized
    )
    SELECT doc_id, chunk_index,
           len(toks[chunk_index * 48 + 1 : chunk_index * 48 + 64])
             AS n_chunk_tok,
           md5(array_to_string(
             toks[chunk_index * 48 + 1 : chunk_index * 48 + 64], ' '))
             AS chunk_md5
    FROM wins
    """,
)
def pack_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the OTHER pretraining
    layout next to concat-and-chunk: each document explodes into
    64-token windows at stride 48 (16-token overlap), so long documents
    become model-sized samples without losing cross-boundary context.
    The window fan-out is a pure codegen transform+explode (no UDF, no
    shuffle — only the explode's row multiplication); the md5 of each
    chunk's joined text proves exact chunk CONTENT against the oracle,
    not just counts. At 100 TB the blow-up factor is bounded by
    n_tok/stride per doc and happens map-side."""
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens

    chunk, stride = 64, 48
    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select("doc_id", tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .where(F.col("n") > 0)
    )
    n_win = F.greatest(
        F.lit(1),
        F.ceil((F.col("n") - chunk) / float(stride)).cast("long") + 1,
    )
    wins = docs.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), (n_win - 1).cast("int"))).alias(
            "chunk_index"
        ),
    )
    window = F.slice(
        F.col("toks"), F.col("chunk_index") * stride + 1, chunk
    )
    return wins.select(
        "doc_id",
        "chunk_index",
        F.size(window).cast("long").alias("n_chunk_tok"),
        F.md5(F.array_join(window, " ")).alias("chunk_md5"),
    )


@query(
    "sink_shards",
    oracle=f"""
    SELECT {bucket_sql('doc_id', 16)} AS shard,
           COUNT(*) AS n_docs, CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
    FROM documents GROUP BY 1
    """,
)
def sink_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard export: the corpus written as 16 id-hash shards
    (training-data layout — every re-export bins each doc identically, so
    downstream loaders can resume mid-epoch). Physically written
    partitionBy(shard) and read back; the aggregate hash-checks the
    assignment, not just counts."""
    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_dir,
        read_back,
    )

    docs = table(spark, sf_dir, "documents").withColumn(
        "shard", hash_bucket(F.col("doc_id"), 16)
    )
    target = _scratch_dir("sink_shards")
    # one file per shard directory: repartition on the partition column
    docs.repartition(16, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(target)
    # schema-explicit: an empty corpus writes no shard dirs at all
    out = read_back(
        spark,
        target,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint, shard string",
    )
    return out.groupBy(F.col("shard").cast("long").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


@query(
    "sample_weighted",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM documents
    ORDER BY {priority_sql("doc_id", "n_chars")} DESC, doc_id
    LIMIT 20
    """,
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement: 20 documents drawn with
    probability proportional to length (the 'sample long documents more
    often' curation knob), via deterministic A-Res priorities.

    No RNG anywhere: the priority is a pure function of doc_id under the
    portable md5 contract, so the sample is identical across engines,
    runs, and row orders — and the oracle can ORDER BY the very same
    expression. Top-k by priority is a TakeOrdered (per-partition heaps,
    k-row merge), not a global sort."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_priority_sample(docs, "doc_id", "n_chars", 20)


@query(
    "sample_temperature",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_rows FROM documents GROUP BY lang
    ),
    anchor AS (SELECT MIN(n_rows) AS n_min FROM counts),
    rates AS (
        SELECT lang,
               CAST(FLOOR(1000 * SQRT(CAST(n_min AS DOUBLE)
                                      / CAST(n_rows AS DOUBLE))) AS BIGINT)
                   AS rate_pm
        FROM counts, anchor
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {bucket_sql('d.doc_id')} < r.rate_pm
    """,
)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced sampling (alpha = 0.5, the multilingual-LM
    recipe): big languages thin by (n_min/n_s)^0.5, the smallest keeps
    everything — flattening the size distribution toward uniform. Rates
    anchor on the smallest stratum so every rate depends on exactly two
    counts (no cross-stratum float sum an engine could reorder); the
    inclusion test is the md5 bucket contract, map-side against the
    broadcast #strata-row rate table."""
    docs = table(spark, sf_dir, "documents")
    return temperature_sample(docs, "doc_id", "lang", alpha=0.5).select(
        "doc_id", "lang"
    )


@query(
    "sample_shuffle_order",
    oracle=f"""
    SELECT doc_id, shard, pos FROM (
      SELECT doc_id,
             {bucket_sql('doc_id', 8)} AS shard,
             ROW_NUMBER() OVER (
               PARTITION BY {bucket_sql('doc_id', 8)}
               ORDER BY ('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT,
                        doc_id
             ) AS pos
      FROM documents
    ) t
    """,
)
def sample_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle for training order: every doc gets a
    (shard, position) from the md5 contract — the epoch-0 read order is a
    pure function of the id, reproducible across engines, runs, and
    re-exports (resume mid-epoch = seek to (shard, pos)).

    Scale shape: NO global sort — shard assignment is a map-side bucket
    hash and the position is a row_number inside each shard's
    (salted-hash, id) window, so the only exchange is the 8-way shard
    partition; shard count scales the sort width. A global ROW_NUMBER
    (single-partition window) would serialize the corpus through one
    task — this formulation is what survives 100 TB."""
    from pyspark.sql import Window

    from openmrs_module_mamba_etl_spark.functions.similarity import (
        portable_hash32,
    )

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", hash_bucket(F.col("doc_id"), 8).alias("shard")
    )
    shuffle_key = portable_hash32(
        F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("shard").orderBy(shuffle_key, F.col("doc_id"))
    return docs.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


@query(
    "pack_firstfit",
    oracle=r"""
    WITH RECURSIVE d AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 16
               AS shard,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ), r AS (
      SELECT doc_id, shard, n_tok,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY n_tok DESC, doc_id ASC) AS rn
      FROM d
    ), steps AS (
      SELECT shard, rn, doc_id, n_tok, 1 AS bin_id,
             [256 - n_tok] AS caps
      FROM r WHERE rn = 1
      UNION ALL
      SELECT n.shard, n.rn, n.doc_id, n.n_tok,
             CASE WHEN fit = 0 THEN len(s.caps) + 1 ELSE fit END AS bin_id,
             CASE WHEN fit = 0 THEN list_append(s.caps, 256 - n.n_tok)
                  ELSE list_transform(s.caps,
                         (c, i) -> CASE WHEN i = fit THEN c - n.n_tok
                                        ELSE c END)
             END AS caps
      FROM steps s
      JOIN r n ON n.shard = s.shard AND n.rn = s.rn + 1
      , LATERAL (SELECT list_position(
                   list_transform(s.caps, c -> c >= n.n_tok), true) AS fit) f
    )
    SELECT doc_id, shard, bin_id, n_tok AS size FROM steps
    """,
)
def pack_firstfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-Fit-Decreasing packing of documents into 256-token bins,
    md5-sharded 16 ways (llm/sampling.py:firstfit_pack). The oracle
    replays the SEQUENTIAL heuristic exactly as a per-shard lockstep
    recursion: each recursive step advances every shard by one item,
    carrying the bin-capacity list and choosing the first fitting bin —
    so the whole greedy trajectory, not just the final histogram, is
    hash-verified. (DuckDB note: list_position returns 0, not NULL, on
    no-match.)"""
    from openmrs_module_mamba_etl_spark.llm.sampling import firstfit_pack
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens

    docs = (
        table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
        )
    )
    return firstfit_pack(docs, "doc_id", "n_tok", capacity=256, n_shards=16)
