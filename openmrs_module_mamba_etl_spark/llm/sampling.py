"""Deterministic sampling / splitting / packing for training-data curation.

Every operator here is MAP-SIDE ONLY on the fact table: the sampling
decision for a row is a pure function of its id (an md5-derived bucket),
so there is no shuffle, no RNG state, and the same row lands in the same
split/sample/shard on every run, on any cluster size, in any row order —
the reproducibility property training pipelines need (re-running a 100 TB
curation job must not re-roll the dice). Rates/quotas that depend on
corpus statistics (mixture weighting) are computed in one small aggregate
and broadcast back — the big table is still touched exactly once.

The bucket hash is md5 over the decimal string of the id: portable across
engines (identical in Spark, DuckDB, any ANSI SQL with md5), unlike
engine-native hashes (xxhash64, murmur) whose seeds/variants differ.

Reference scope note: the reference engine (openmrs-module-mamba-etl) has
no sampling surface at all — its closest notion is the incremental-mode
row filter (api/.../mamba_main.sql). This family is part of the
beyond-reference training-data mandate (SURVEY.md §2.I).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Number of buckets all permille-based rates quantize to.
PERMILLE = 1000


def hash_bucket(id_col: Column, buckets: int = PERMILLE) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id.

    First 8 hex chars of md5(decimal string) → 32-bit int → mod. The same
    expression is one line of ANSI SQL
    (``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT % buckets``),
    so splits survive an engine migration bit-for-bit. Codegen-side
    (md5 + conv are JVM built-ins) — no Python in the path.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return (h.cast("long") % buckets).alias("bucket")


def bucket_sql(id_expr: str, buckets: int = PERMILLE) -> str:
    """The DuckDB/ANSI twin of :func:`hash_bucket` (for oracles/docs)."""
    return (
        f"('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {buckets}"
    )


def hash_split(
    df: DataFrame, id_col: str, cuts: list[tuple[str, int]]
) -> DataFrame:
    """Disjoint, exhaustive train/valid/test split by bucket range.

    ``cuts`` are (name, upper_permille) with increasing uppers; the last
    upper must be 1000 so every row gets a split. Adds ``split`` and
    ``bucket`` columns; no shuffle, no sampling drift between runs.
    """
    if cuts[-1][1] != PERMILLE:
        raise ValueError("last cut must close the [0,1000) range")
    b = hash_bucket(F.col(id_col))
    col = None
    for name, upper in cuts[:-1]:
        col = (col.when if col is not None else F.when)(
            b < upper, F.lit(name)
        )
    col = col.otherwise(F.lit(cuts[-1][0])) if col is not None else F.lit(
        cuts[-1][0]
    )
    return df.withColumn("bucket", b).withColumn("split", col)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    permille: dict[str, int],
    default_permille: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep rows whose bucket clears the
    stratum's permille rate. A CASE over a literal map — still pure
    map-side; strata not in ``permille`` fall back to ``default_permille``
    (0 = dropped)."""
    rate = None
    for stratum, p in sorted(permille.items()):
        rate = (rate.when if rate is not None else F.when)(
            F.col(stratum_col) == stratum, F.lit(p)
        )
    rate = (
        rate.otherwise(F.lit(default_permille))
        if rate is not None
        else F.lit(default_permille)
    )
    return df.where(hash_bucket(F.col(id_col)) < rate)


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    weights: dict[str, int],
    target_rows: int,
) -> DataFrame:
    """Per-stratum sampling rates that reshape the corpus toward a target
    mixture: stratum ``s`` gets quota ``weights[s] * target_rows // sum(w)``
    and rate ``min(1000, 1000 * quota // n_s)`` permille. One small
    aggregate over the stratum column; integer arithmetic throughout so any
    engine reproduces the same rates. Returns (stratum, n_rows, rate_pm).
    """
    total_w = sum(weights.values())
    quota = None
    for stratum, w in sorted(weights.items()):
        q = w * target_rows // total_w
        # long literal: 1000 * quota at web-corpus quotas overflows int32
        # (silent negative rate in legacy mode, ArithmeticException in ANSI)
        quota = (quota.when if quota is not None else F.when)(
            F.col(stratum_col) == stratum, F.lit(q).cast("long")
        )
    quota = quota.otherwise(F.lit(0)) if quota is not None else F.lit(0)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_rows"))
    # integer div end-to-end: any engine reproduces the exact same rates
    return counts.withColumn("quota", quota).select(
        F.col(stratum_col),
        F.col("n_rows"),
        F.least(
            F.lit(PERMILLE).cast("long"),
            F.expr(f"(CAST({PERMILLE} AS BIGINT) * quota) div n_rows"),
        ).alias("rate_pm"),
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    weights: dict[str, int],
    target_rows: int,
) -> DataFrame:
    """Resample the corpus toward ``weights`` over ``stratum_col``.

    Rates come from one aggregate (:func:`mixture_rates`, rows = #strata —
    always broadcastable); the fact table is then filtered map-side against
    the broadcast rate row for its stratum. Two narrow passes over the big
    table total, zero wide shuffles of it.
    """
    rates = mixture_rates(df, stratum_col, weights, target_rows)
    return (
        df.join(F.broadcast(rates.select(stratum_col, "rate_pm")), stratum_col)
        .where(hash_bucket(F.col(id_col)) < F.col("rate_pm"))
        .drop("rate_pm")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tok_col: str,
    budget: int,
    shards: int = 8,
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to a
    (shard, chunk) so that concatenating a chunk's documents in id order
    fills a ``budget``-token context window (the GPT-style pretraining
    loader layout — documents are concatenated and the stream is sliced
    every ``budget`` tokens; a document starts in the chunk its exclusive
    prefix-sum lands in).

    One hash shuffle on shard, then a single window cumsum per shard —
    shards bound both the sort size and the final file parallelism, so the
    same plan holds when "documents" is 100 TB (pick shards ≈ cluster
    write parallelism). Deterministic: shard is the id's md5 bucket and
    order within shard is id order.
    """
    shard = hash_bucket(F.col(id_col), shards)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("cum_tok", F.sum(n_tok_col).over(w))
        .withColumn(
            "chunk_id",
            F.expr(f"(cum_tok - {n_tok_col}) div {budget}").cast("long"),
        )
    )


def weighted_priority_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Deterministic weighted sample of k rows without replacement
    (Efraimidis-Spirtsis A-Res): each row gets priority u^(1/w) with u a
    hash-derived uniform, and the k largest priorities win — inclusion
    probability proportional to weight, reproducible across engines and
    row orders because u comes from the same md5 contract as
    :func:`hash_bucket`, not an RNG.

    Ordering uses the monotone-equivalent ln(u)/w (avoids pow underflow
    for large weights). Scale shape: priorities are map-side expressions;
    the top-k is a TakeOrdered — per-partition heaps then one k-row
    merge, never a full sort."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)
    key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("_prio", key)
        .orderBy(F.col("_prio").desc(), F.col(id_col))
        .limit(k)
        .drop("_prio")
    )


def priority_sql(id_expr: str, weight_expr: str) -> str:
    """DuckDB/ANSI twin of the A-Res priority key (for oracles/docs)."""
    return (
        f"LN((('0x' || substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" + 1.0) / 4294967296.0) / ({weight_expr})"
    )


def temperature_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum permille rates for temperature-rebalanced sampling
    (the multilingual-LM recipe: sample stratum ``s`` proportionally to
    ``p_s^alpha``, flattening the size distribution toward uniform as
    ``alpha -> 0``).

    Anchored at the smallest stratum (which keeps rate 1000 — full
    retention): ``rate_pm(s) = floor(1000 * (n_min / n_s)^(1-alpha))``.
    The anchor makes every rate a function of exactly two counts — no
    cross-stratum float sum whose accumulation order an engine could
    reorder — so with IEEE-exact division and correctly-rounded
    sqrt/pow the rates are bit-identical in any engine. One #strata-row
    aggregate; broadcast back.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_rows"))
    n_min = counts.agg(F.min("n_rows").alias("n_min"))
    ratio = F.col("n_min").cast("double") / F.col("n_rows").cast("double")
    if abs((1.0 - alpha) - 0.5) < 1e-15:
        # alpha=0.5 (the standard recipe): sqrt is IEEE correctly rounded
        # on every engine; Java's Math.pow is only within 1 ulp, so a
        # boundary ratio could floor() to a different permille than
        # DuckDB's SQRT and flip the sampled set.
        boost = F.sqrt(ratio)
    else:
        boost = F.pow(ratio, F.lit(1.0 - alpha))
    return counts.join(F.broadcast(n_min)).select(
        F.col(stratum_col),
        F.col("n_rows"),
        F.floor(F.lit(float(PERMILLE)) * boost).cast("long").alias("rate_pm"),
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-rebalanced subsample: big strata are thinned by
    ``(n_min/n_s)^(1-alpha)``, small strata kept whole. The rate table is
    #strata rows (broadcast); the inclusion decision is the md5 bucket
    contract (:func:`hash_bucket`) — map-side, RNG-free, identical at any
    scale or row order."""
    rates = temperature_rates(df, stratum_col, alpha)
    return (
        df.join(F.broadcast(rates.select(stratum_col, "rate_pm")), stratum_col)
        .where(hash_bucket(F.col(id_col)) < F.col("rate_pm"))
        .drop("rate_pm")
    )


def firstfit_pack(
    df: DataFrame,
    id_col: str,
    size_col: str,
    capacity: int,
    n_shards: int = 16,
) -> DataFrame:
    """First-Fit-Decreasing sequence packing: assign each item to the
    lowest-indexed bin with remaining capacity, scanning items largest
    first — the classic packing heuristic (≤ 11/9·OPT + 1 bins) training
    pipelines use to cut padding waste versus naive concat-and-chunk.

    FFD is inherently sequential, so the parallel unit is the md5 SHARD
    (same bucket contract as every sampling op): items hash-partition
    into ``n_shards`` independent packing problems and one
    ``applyInPandas`` kernel packs each shard — at 100 TB, shard count
    scales with the cluster and each shard's item list is a bounded
    in-memory problem by construction. Items larger than ``capacity``
    open their own (over-full) bin, which never fits anything else.
    Deterministic end to end: shard = md5(id), scan order =
    (size DESC, id ASC), so the assignment replays in SQL as a
    per-shard lockstep recursion (see the ``pack_firstfit`` oracle).

    → (id, shard, bin_id, size) with 1-based creation-order bin ids.
    """
    import pandas as pd

    sharded = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), n_shards).alias("shard"),
        F.col(size_col).cast("long").alias("_size"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["_size", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        caps: list[int] = []
        bins: list[int] = []
        for n in pdf["_size"]:
            n = int(n)
            fit = next((i for i, c in enumerate(caps) if c >= n), None)
            if fit is None:
                caps.append(capacity - n)
                bins.append(len(caps))
            else:
                caps[fit] -= n
                bins.append(fit + 1)
        pdf["bin_id"] = bins
        return pdf[[id_col, "shard", "bin_id", "_size"]]

    # The id column passes through untouched, so its field type must come
    # from the input schema — hardcoding long broke string/int doc ids.
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, shard long, bin_id long, _size long"
    )
    return (
        sharded.groupBy("shard")
        .applyInPandas(pack, schema=out_schema)
        .withColumnRenamed("_size", "size")
    )
