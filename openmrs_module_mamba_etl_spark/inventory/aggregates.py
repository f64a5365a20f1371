"""Aggregation inventory: SURVEY.md §2.D (D1-D5).

Double-typed aggregates are rounded to 2 decimals on BOTH sides (Spark and
oracle) so partial-aggregation order (which varies with partitioning) never
surfaces as a value-hash mismatch; inputs are 2-decimal currency values, so
the rounded sums are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


@query(
    "agg_count_star",
    oracle="SELECT COUNT(*) AS total_orders FROM orders",
)
def agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) whole-relation (reference: README.md:313 total_deliveries)."""
    return table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_orders")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
    FROM orders
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) (reference: README.md:321). Exact here; the 100 TB
    variant is approx_count_distinct (HLL, no global distinct shuffle)."""
    return table(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "agg_group_by",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                              AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2)                                   AS avg_qty,
           ROUND(AVG(l_extendedprice), 2)                              AS avg_price,
           ROUND(AVG(l_discount), 2)                                   AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregate (TPC-H Q1 shape): scan → filter → hash agg.

    Map-side partial aggregation shrinks the shuffle to (#groups × #tasks)
    rows; with 6 groups this is effectively a full-scan + tiny exchange —
    the plan that survives 100× scale-up unchanged."""
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias(
                "sum_charge"
            ),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING = post-aggregation filter."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 15)
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_lines, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (MySQL WITH ROLLUP analog)."""
    return (
        table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    return (
        table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "agg_minmax",
    oracle="""
    SELECT o_orderstatus,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


def _profile_branch(col: str, numeric: bool) -> str:
    stats = (
        f"CAST(MIN({col}) AS DOUBLE) AS min_value, "
        f"CAST(MAX({col}) AS DOUBLE) AS max_value, "
        f"ROUND(AVG({col}), 4) AS avg_value"
        if numeric
        else (
            "CAST(NULL AS DOUBLE) AS min_value, "
            "CAST(NULL AS DOUBLE) AS max_value, "
            "CAST(NULL AS DOUBLE) AS avg_value"
        )
    )
    return (
        f"SELECT '{col}' AS \"column\", COUNT(*) AS n_rows, "
        f"COUNT({col}) AS n_non_null, COUNT(*) - COUNT({col}) AS n_null, "
        f"COUNT(DISTINCT {col}) AS n_distinct, {stats}"
        " FROM documents"
    )


@query(
    "profile_documents",
    oracle="\nUNION ALL\n".join(
        [
            _profile_branch("doc_id", True),
            _profile_branch("text", False),
            _profile_branch("lang", False),
            _profile_branch("source", False),
            _profile_branch("n_chars", True),
        ]
    )
    + "\nORDER BY \"column\"",
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile (counts, null rates, NDV, numeric ranges) —
    the data-quality report a training pipeline runs before anything else.
    All statistics are aggregate expressions in a SINGLE hash aggregate;
    exact NDV here for the oracle, HLL by default at scale (SURVEY.md §2.I)."""
    from openmrs_module_mamba_etl_spark.operators.profile import profile_table

    return profile_table(
        table(spark, sf_dir, "documents"), exact_distinct=True
    ).orderBy("column")


#: Per-group distinct-count ceiling under which the lgK=20 HLL_4 coupon
#: path is collision-exact (26-bit coupon hashes; birthday bound ≪ 2^13).
#: DECISION for sf1+: the exact oracle below is scoped to domains under
#: this bound — tests/test_properties.py asserts the bound holds at every
#: tested SF, so a data generation that outgrows it fails CI loudly; at
#: that point the key reverts to rows-only rather than a tolerance oracle
#: (the driver's compare is exact-hash only).
SKETCH_EXACT_DOMAIN_BOUND = 8192


@query(
    "agg_sketch_merge",
    # The sketch *binary* has no DuckDB twin, but the final estimate does
    # at the CHECKED scales: Datasketches HLL_4 coupon mode stores 26-bit
    # hashes, so it is collision-exact only while n ≪ 2^13 (birthday
    # bound) — measured: exact at 150 (sf0.01) and 1,500 (sf0.1)
    # distinct, off by 1 at 15,000, 0.3% at 150,000 even at lgK=20. The
    # oracle therefore holds for the driver's sf0.01 gate and the local
    # sf0.001/sf0.1 suites; SKETCH_EXACT_DOMAIN_BOUND above pins the
    # scope mechanically (tests/test_properties.py). lgK=20 (vs 12) buys
    # the sf0.1 margin; production rollups tune lgK down and accept the
    # published error. Dense-path associativity is pinned by
    # tests/test_properties.py.
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS est_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch pre-aggregation — the 100 TB distinct-count
    pattern: sketch once at the fine grain (event_type × day), answer any
    coarser rollup by UNIONING stored sketches instead of rescanning raw
    events. HLL register-max merge is associative, so
    union-of-day-sketches yields the IDENTICAL estimate to one sketch
    over all rows (pinned exactly by tests/test_properties.py); the
    estimate is exactly COUNT(DISTINCT) at the checked scales (measured
    exact through sf0.1's 1,500-user domain at lgK=20; coupon-hash
    collisions make larger domains approximate — see the oracle note);
    production-tuned lgK trades exactness for a fixed published error."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date(F.timestamp_micros(F.expr("ts div 1000"))).alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(20)).alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
        )
        .orderBy("event_type")
    )


@query(
    "profile_constraints",
    oracle="""
    SELECT 'orderkey_unique' AS constraint, COUNT(*) - COUNT(DISTINCT o_orderkey) AS violations FROM orders
    UNION ALL
    SELECT 'custkey_not_null', COUNT(*) FILTER (o_custkey IS NULL) FROM orders
    UNION ALL
    SELECT 'status_accepted', COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) FROM orders
    UNION ALL
    SELECT 'custkey_references_customer', COUNT(*)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    """,
)
def profile_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraints (the deequ pattern): key
    uniqueness, null rate, accepted values, and referential integrity,
    each reported as a violation count. The three row-local checks share
    ONE scan + ONE aggregate; the referential check is a broadcast
    anti-join (dim key set small by definition). A 100 TB quality gate is
    therefore ~one pass over the fact table, not one job per rule."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    local = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("u"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("s"),
    )
    orphans = (
        o.join(
            F.broadcast(c.select("c_custkey")),
            o.o_custkey == c.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("r"))
    )
    pairs = [
        ("orderkey_unique", "u"),
        ("custkey_not_null", "n"),
        ("status_accepted", "s"),
    ]
    rowlocal = local.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("constraint"),
                        F.col(col).alias("violations"),
                    )
                    for name, col in pairs
                ]
            )
        ).alias("kv")
    ).select("kv.constraint", "kv.violations")
    # union, not a 1x1 cross join: keeps the report plan join-free
    return rowlocal.unionByName(
        orphans.select(
            F.lit("custkey_references_customer").alias("constraint"),
            F.col("r").alias("violations"),
        )
    )


@query(
    "agg_sampled_estimate",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice) * 10, 2) AS est_revenue,
           COUNT(*) AS n_sampled
    FROM orders
    WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
          % 1000 < 100
    GROUP BY o_orderpriority
    """,
)
def agg_sampled_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate query processing on a deterministic sample (the
    BlinkDB recipe): aggregate a 10% md5-bucket sample and scale by the
    inverse rate. The sample predicate is a pure row-local function, so
    it pushes into the scan and an interactive estimate costs 10% of the
    exact query at any scale — and, unlike Bernoulli sampling, the same
    rows are sampled on every run and every engine (the oracle replicates
    the estimate EXACTLY, not statistically)."""
    from openmrs_module_mamba_etl_spark.llm.sampling import hash_bucket

    o = table(spark, sf_dir, "orders")
    return (
        o.where(hash_bucket(F.col("o_orderkey")) < 100)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice") * 10, 2).alias("est_revenue"),
            F.count(F.lit(1)).alias("n_sampled"),
        )
    )


@query(
    "agg_histogram",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT LEAST(CAST(FLOOR((o_totalprice - lo) /
                   (CASE WHEN hi > lo THEN (hi - lo) / 20 ELSE 1 END))
                   AS BIGINT),
                 19) AS bin,
           COUNT(*) AS n,
           ROUND(MIN(o_totalprice), 2) AS bin_min,
           ROUND(MAX(o_totalprice), 2) AS bin_max
    FROM orders CROSS JOIN bounds
    GROUP BY bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive equal-width histogram: 20 bins spanning [min, max] of
    order value, computed in two passes — one min/max aggregate
    broadcast back, one binning aggregate.

    The bin assignment is a codegen-side arithmetic expression (IEEE
    double ops, bit-identical across engines), the top bin closes the
    half-open range via LEAST, and the histogram aggregate is fully
    map-side-combinable: 20 groups survive the shuffle regardless of
    input size."""
    orders = table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    # Degenerate-bounds guard (same as profile_drift's): a constant column
    # makes hi == lo and an unguarded width turns the bin expression into
    # x/0 → NULL bins; width 1 short-circuits every row to bin 0 instead
    # (mirrored in the oracle's CASE).
    width = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / F.lit(20)
    ).otherwise(F.lit(1.0))
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast(
                "long"
            ),
            F.lit(19).cast("long"),
        ).alias("bin"),
        "o_totalprice",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("bin_min"),
        F.round(F.max("o_totalprice"), 2).alias("bin_max"),
    )


@query(
    "agg_regression",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(epoch_us(ts) // 86400000000 AS DOUBLE) AS day,
             SUM(value) AS total
      FROM events GROUP BY event_type, day
    )
    SELECT event_type,
           ROUND(REGR_SLOPE(total, day), 4) AS slope,
           ROUND(REGR_INTERCEPT(total, day) / 1000, 4) AS intercept_k,
           ROUND(REGR_R2(total, day), 4) AS r2,
           COUNT(*) AS n_days
    FROM daily GROUP BY event_type
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in OLS trend per event type: slope/intercept/R^2 of daily
    totals against the day index via the SQL-standard REGR_* aggregate
    family — the pure-JVM sibling of ``grouped_user_trend``'s
    ``applyInPandas`` OLS (same math, no Python worker, no group
    materialization; use this one unless you need scipy).

    The daily pre-aggregate shrinks the stream to |types|x|days| rows
    before the regression touches it, and REGR_* are decomposable
    (sum-of-moments) so both aggregates combine map-side."""
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("CAST((ts div 1000) div 86400000000 AS DOUBLE)").alias(
                "day"
            ),
        )
        .agg(F.sum("value").alias("total"))
    )
    return daily.groupBy("event_type").agg(
        F.round(F.regr_slope("total", "day"), 4).alias("slope"),
        F.round(F.regr_intercept("total", "day") / 1000, 4).alias(
            "intercept_k"
        ),
        F.round(F.regr_r2("total", "day"), 4).alias("r2"),
        F.count(F.lit(1)).alias("n_days"),
    )


@query(
    "agg_count_if_bool",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT_IF(o_totalprice > 200000) AS BIGINT) AS n_big,
           BOOL_AND(o_totalprice > 900) AS all_over_900,
           BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_if_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate aggregates: conditional count plus boolean all/any per
    group — the assertion primitives under data-quality rules
    (``profile_constraints`` builds on exactly these).

    All three are decomposable single-bit/counter states, so the
    map-side combine reduces each partition to |groups| rows before the
    shuffle."""
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 900).alias("all_over_900"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias(
            "any_urgent"
        ),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT o_orderstatus,
           STRING_AGG(DISTINCT o_orderpriority, ','
                      ORDER BY o_orderpriority) AS priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (SQL:2016 LISTAGG, Spark 4 built-in):
    the distinct priorities seen per order status, comma-joined in a
    pinned order — the report-footnote aggregate MySQL spells
    GROUP_CONCAT (reference dialect) and DuckDB spells STRING_AGG.

    WITHIN GROUP ordering makes the result set-deterministic; DISTINCT
    bounds the aggregation state to the value domain, not the row
    count."""
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_listagg_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               LISTAGG(DISTINCT o_orderpriority, ',')
                 WITHIN GROUP (ORDER BY o_orderpriority) AS priorities
        FROM _listagg_orders GROUP BY o_orderstatus
        """
    )


@query(
    "profile_drift",
    oracle="""
    WITH b AS (
      SELECT MIN(value) AS lo, MAX(value) AS hi,
             MIN(epoch_us(ts)) AS tlo, MAX(epoch_us(ts)) AS thi
      FROM events
    ), binned AS (
      SELECT event_type,
             LEAST(CAST(FLOOR((value - lo) /
                     (CASE WHEN hi > lo THEN (hi - lo) / 10 ELSE 1 END))
                   AS BIGINT), 9) AS bin,
             CASE WHEN epoch_us(ts) * 2 < tlo + thi THEN 1 ELSE 0 END
               AS is_ref
      FROM events CROSS JOIN b
    ), counts AS (
      SELECT event_type, bin,
             SUM(is_ref) AS n_ref, SUM(1 - is_ref) AS n_cur
      FROM binned GROUP BY event_type, bin
    ), spine AS (
      SELECT et.event_type, r.range AS bin
      FROM (SELECT DISTINCT event_type FROM events) et
      CROSS JOIN range(10) r
    ), full_counts AS (
      SELECT s.event_type, s.bin,
             COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur
      FROM spine s LEFT JOIN counts c
        ON s.event_type = c.event_type AND s.bin = c.bin
    ), tot AS (
      SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
      FROM full_counts GROUP BY event_type
    )
    SELECT f.event_type,
           ROUND(SUM(
             ((f.n_cur + 1.0) / (t.t_cur + 10.0)
              - (f.n_ref + 1.0) / (t.t_ref + 10.0))
             * ln(((f.n_cur + 1.0) / (t.t_cur + 10.0))
                  / ((f.n_ref + 1.0) / (t.t_ref + 10.0)))
           ), 6) AS psi
    FROM full_counts f JOIN tot t ON f.event_type = t.event_type
    GROUP BY f.event_type
    ORDER BY f.event_type
    """,
)
def profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor — the production gate a
    training pipeline runs between data snapshots: per event type, the
    `value` distribution of the later half of the time range is compared
    to the earlier half over 10 equal-width bins;
    PSI = Σ (q−p)·ln(q/p) with add-one smoothing (so empty bins are
    well-defined). Rule of thumb: <0.1 stable, >0.25 investigate.

    Scale shape: one bounds aggregate broadcast back, one
    map-side-combinable (type, bin, window) count, a literal 10-row bin
    spine joined in so absent bins still contribute, and a per-type
    rollup — #types×10 rows survive every shuffle regardless of input
    size. All arithmetic is IEEE double (ln/÷), replayed exactly by the
    oracle."""
    ev = table(spark, sf_dir, "events")
    tus = F.expr("ts div 1000")
    bounds = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.min(tus).alias("tlo"),
        F.max(tus).alias("thi"),
    )
    # Degenerate-bounds guard: a constant-valued column makes hi == lo, and
    # an unguarded (hi-lo)/10 width turns the bin expression into x/0 →
    # NaN/NULL bins; width 1 short-circuits every row to bin 0 instead
    # (mirrored in the oracle's CASE).
    width = F.when(
        F.col("hi") > F.col("lo"), (F.col("hi") - F.col("lo")) / F.lit(10)
    ).otherwise(F.lit(1.0))
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / width).cast("long"),
            F.lit(9).cast("long"),
        ).alias("bin"),
        F.when(tus * 2 < F.col("tlo") + F.col("thi"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            spark.range(10).select(F.col("id").cast("long").alias("bin"))
        )
    )
    full = (
        spine.join(counts, ["event_type", "bin"], "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    tot = full.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10.0)
    q = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10.0)
    return (
        full.join(F.broadcast(tot), "event_type")
        .groupBy("event_type")
        .agg(F.round(F.sum((q - p) * F.log(q / p)), 6).alias("psi"))
        .orderBy("event_type")
    )


@query(
    "agg_mode",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS modal_status, n AS modal_count
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority
        ORDER BY n DESC, o_orderstatus ASC) AS rn
      FROM (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY 1, 2
      )
    ) WHERE rn = 1 ORDER BY o_orderpriority
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group (most frequent order status per
    priority) as two stacked hash aggregates: count per (group, value),
    then min_by over (-count, value) per group — both fully
    map-side-combinable, so the second aggregate's input is
    |groups|×|domain| rows regardless of fact volume. Ties break to the
    lexicographically smallest FULL value on both sides (struct ordering
    compares the whole string, not just the first byte), keeping the
    oracle deterministic for any value domain."""
    counts = (
        table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.groupBy("o_orderpriority")
        .agg(
            F.expr(
                "min_by(o_orderstatus, struct(-n, o_orderstatus))"
            ).alias("modal_status"),
            F.max("n").alias("modal_count"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_kmv_jaccard",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM du
    ), kmv AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY hv ASC, user_id ASC) AS rn
        FROM h
      ) WHERE rn <= 64
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM (SELECT DISTINCT event_type FROM kmv) a
      JOIN (SELECT DISTINCT event_type FROM kmv) b
        ON a.event_type < b.event_type
    ), u AS (
      SELECT p.ta, p.tb, k.hv,
             MAX(CASE WHEN k.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN k.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p
      JOIN kmv k ON k.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, k.hv
    ), top AS (
      SELECT ta, tb, in_a, in_b FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb
                                     ORDER BY hv ASC) AS rn
        FROM u
      ) WHERE rn <= 64
    )
    SELECT ta, tb, CAST(SUM(in_a * in_b) AS BIGINT) AS n_common,
           ROUND(SUM(in_a * in_b) * 1.0 / COUNT(*), 6) AS jaccard_est
    FROM top GROUP BY ta, tb
    """,
)
def agg_kmv_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values sketch Jaccard between per-event-type user sets —
    the set-INTERSECTION estimator HLL cannot give (Beyer et al. 2007):
    keep each set's 64 smallest md5 hashes; for a pair, the fraction of
    the union-sketch (64 smallest of both) present in BOTH sketches
    estimates J(A,B) with RSE ≈ 1/√k. Engine shape: one distinct
    contraction, one bounded per-type window (64 rows survive per type),
    then all pair arithmetic runs on #types×64 rows — a 100 TB fact
    table contributes only its distinct contraction. Hash ties cannot
    occur within a sketch (hashes of distinct users; ordering carries a
    user_id tiebreak anyway), so the sketch is deterministic and the
    oracle replays it exactly — integers end to end. Accuracy vs the
    exact Jaccard is pinned in tests/test_properties.py."""
    from pyspark.sql import Window

    from openmrs_module_mamba_etl_spark.functions.similarity import (
        portable_hash60,
    )

    du = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn(
            "hv", portable_hash60(F.col("user_id").cast("string"))
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("hv").asc(), F.col("user_id").asc()
    )
    kmv = (
        du.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 64)
        .select("event_type", "hv")
    )
    types = kmv.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
    )
    # Equi-join, not IN(ta, tb): exploding each pair into its two member
    # types gives the sketch join a hash key, so the only nested-loop left
    # is the #types×#types pair triangle above (sketch-domain bounded).
    u = (
        pairs.select(
            "ta", "tb", F.explode(F.array("ta", "tb")).alias("event_type")
        )
        .join(F.broadcast(kmv), "event_type")
        .groupBy("ta", "tb", "hv")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w2 = Window.partitionBy("ta", "tb").orderBy(F.col("hv").asc())
    top = u.withColumn("rn", F.row_number().over(w2)).where(F.col("rn") <= 64)
    # denominator = |union sketch| (≤ k): with fewer than k distinct
    # members the union sketch IS the full union and the estimate is
    # exact; dividing by a fixed k would understate J on small domains
    return top.groupBy("ta", "tb").agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
        F.round(
            F.sum(F.col("in_a") * F.col("in_b")) / F.count(F.lit(1)), 6
        ).alias("jaccard_est"),
    )


@query(
    "agg_kmv_union",
    oracle="""
    WITH du AS (
      SELECT DISTINCT event_type, user_id FROM events
    ), h AS (
      SELECT event_type, user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               AS hv
      FROM du
    ), kmv AS (
      SELECT event_type, hv FROM (
        SELECT event_type, hv,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY hv ASC, user_id ASC) AS rn
        FROM h
      ) WHERE rn <= 64
    ), pairs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM (SELECT DISTINCT event_type FROM kmv) a
      JOIN (SELECT DISTINCT event_type FROM kmv) b
        ON a.event_type < b.event_type
    ), u AS (
      SELECT p.ta, p.tb, k.hv,
             MAX(CASE WHEN k.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
             MAX(CASE WHEN k.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
      FROM pairs p
      JOIN kmv k ON k.event_type IN (p.ta, p.tb)
      GROUP BY p.ta, p.tb, k.hv
    ), top AS (
      SELECT ta, tb, hv, in_a, in_b FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY ta, tb
                                     ORDER BY hv ASC) AS rn
        FROM u
      ) WHERE rn <= 64
    )
    SELECT ta, tb,
           ROUND(CASE WHEN COUNT(*) < 64 THEN COUNT(*) * 1.0
                 ELSE 63.0 * 1152921504606846976 / MAX(hv) END, 2)
             AS est_union,
           ROUND((CASE WHEN COUNT(*) < 64 THEN COUNT(*) * 1.0
                  ELSE 63.0 * 1152921504606846976 / MAX(hv) END)
                 * (SUM(in_a * in_b) * 1.0 / COUNT(*)), 2)
             AS est_intersect
    FROM top GROUP BY ta, tb
    """,
)
def agg_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-ALGEBRA estimates (Beyer et al. 2007): |A∪B| from the
    union sketch's k-th minimum — est = (k−1)·M/h_k over the 60-bit md5
    hash space M = 2^60 — and |A∩B| = Ĵ·|A∪B|̂, the cardinalities HLL
    union alone cannot give. When the union sketch holds fewer than k
    hashes it IS the whole union and the estimate switches to the exact
    count. Same contraction shape as agg_kmv_jaccard: one distinct pass,
    bounded per-type windows, pair arithmetic on #types×64 rows; all
    inputs integers, estimator arithmetic one fixed operand order — the
    oracle replays it exactly. Accuracy vs exact set ops is pinned in
    tests/test_properties.py."""
    from pyspark.sql import Window

    from openmrs_module_mamba_etl_spark.functions.similarity import (
        portable_hash60,
    )

    du = (
        table(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .withColumn("hv", portable_hash60(F.col("user_id").cast("string")))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("hv").asc(), F.col("user_id").asc()
    )
    kmv = (
        du.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 64)
        .select("event_type", "hv")
    )
    types = kmv.select("event_type").distinct()
    pairs = (
        types.alias("a")
        .join(
            types.alias("b"),
            F.col("a.event_type") < F.col("b.event_type"),
        )
        .select(
            F.col("a.event_type").alias("ta"),
            F.col("b.event_type").alias("tb"),
        )
    )
    # Equi-join, not IN(ta, tb): exploding each pair into its two member
    # types gives the sketch join a hash key, so the only nested-loop left
    # is the #types×#types pair triangle above (sketch-domain bounded).
    u = (
        pairs.select(
            "ta", "tb", F.explode(F.array("ta", "tb")).alias("event_type")
        )
        .join(F.broadcast(kmv), "event_type")
        .groupBy("ta", "tb", "hv")
        .agg(
            F.max(
                F.when(F.col("event_type") == F.col("ta"), 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == F.col("tb"), 1).otherwise(0)
            ).alias("in_b"),
        )
    )
    w2 = Window.partitionBy("ta", "tb").orderBy(F.col("hv").asc())
    top = u.withColumn("rn", F.row_number().over(w2)).where(F.col("rn") <= 64)
    agged = top.groupBy("ta", "tb").agg(
        F.count(F.lit(1)).alias("n"),
        F.max("hv").alias("hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("common"),
    )
    est_union = F.when(
        F.col("n") < 64, F.col("n") * 1.0
    ).otherwise(F.lit(63.0 * 1152921504606846976) / F.col("hk"))
    return agged.select(
        "ta",
        "tb",
        F.round(est_union, 2).alias("est_union"),
        F.round(
            est_union * (F.col("common") * 1.0 / F.col("n")), 2
        ).alias("est_intersect"),
    )


@query(
    "agg_quantile_sample",
    oracle="""
    WITH s AS (
      SELECT o_totalprice FROM (
        SELECT o_totalprice, o_orderkey,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT
                 AS hv
        FROM orders
      ) ORDER BY hv ASC, o_orderkey ASC LIMIT 4096
    )
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 2) AS p50_est,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_est,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_est,
           CAST(COUNT(*) AS BIGINT) AS n_sample
    FROM s
    """,
)
def agg_quantile_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable SAMPLED quantiles: the bottom-4096 rows by md5
    hash of the key are a uniform fixed-size sample whose membership is a
    pure function of the data — no RNG, identical on any engine at any
    parallelism (the KMV bottom-k idea applied to sampling; contrast
    percentile_approx, whose GK merge is partition-order-dependent and
    can only be rows-only checked). The bottom-k plans as TakeOrdered
    (per-partition top-k then merge, no global sort); exact interpolated
    percentiles then run on the 4096-row sample. Rank error ~ O(1/√n) is
    pinned against the exact distribution in tests/test_properties.py."""
    from openmrs_module_mamba_etl_spark.functions.similarity import (
        portable_hash60,
    )

    sample = (
        table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",
            portable_hash60(F.col("o_orderkey").cast("string")).alias("hv"),
        )
        .orderBy(F.col("hv").asc(), F.col("o_orderkey").asc())
        .limit(4096)
    )
    return sample.agg(
        F.round(F.percentile("o_totalprice", 0.5), 2).alias("p50_est"),
        F.round(F.percentile("o_totalprice", 0.9), 2).alias("p90_est"),
        F.round(F.percentile("o_totalprice", 0.99), 2).alias("p99_est"),
        F.count(F.lit(1)).alias("n_sample"),
    )
