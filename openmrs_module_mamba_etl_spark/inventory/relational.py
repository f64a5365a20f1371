"""Relational operator inventory: scans, filters, joins, set ops, sorts.

Covers SURVEY.md §2.A (A1), §2.B (B1-B7), §2.C (C1-C4), §2.F (F1-F3).
Each query is the minimal declarative plan for its operator; Catalyst does
pushdown/pruning (verified in tests via explain) and AQE picks join
strategies — small dimensions are additionally hinted with ``broadcast``
because at 100 TB the dim/fact size asymmetry is structural, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


# --- A1: source scan with projection + pushdown-able predicate -----------


@query(
    "scan_source",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def scan_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter reaching the parquet scan (PushedFilters/ReadSchema).

    Reference analog: the JDBC scan of OpenMRS source tables
    (reference: pom.xml:279-280)."""
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 100)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


# --- B: projections / filters -------------------------------------------


@query(
    "project_alias",
    oracle="SELECT o_orderkey AS id, o_totalprice AS amount FROM orders",
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT x AS y (reference: README.md:296 aliased projections)."""
    return table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("id"), F.col("o_totalprice").alias("amount")
    )


@query(
    "filter_eq_literal",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality on a literal (reference: README.md:313 uuid = '...')."""
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@query(
    "filter_eq_param",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
    WHERE o_orderpriority = '1-URGENT'
    """,
)
def filter_eq_param(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality on a *bound named parameter* via Spark parameterized SQL —
    the report-param surface (reference: README.md:297-307)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        "SELECT o_orderkey, o_custkey, o_orderpriority FROM orders "
        "WHERE o_orderpriority = :prio",
        args={"prio": "1-URGENT"},
    )


@query(
    "filter_gt_expr",
    oracle="""
    SELECT o_orderkey, o_orderdate FROM orders
    WHERE CAST(o_orderdate AS DATE) > DATE '1999-06-15'
    """,
)
def filter_gt_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate over an expression (reference: README.md:313
    ``DATE(e.encounter_datetime) > ...``)."""
    return (
        table(spark, sf_dir, "orders")
        .where(F.to_date("o_orderdate") > F.lit("1999-06-15").cast("date"))
        .select("o_orderkey", "o_orderdate")
    )


@query(
    "filter_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1996-12-31 00:00:00'
    """,
)
def filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN over datetimes (reference: README.md:321)."""
    return (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_shipdate").between("1996-01-01", "1996-12-31"))
        .select("l_orderkey", "l_linenumber", "l_shipdate")
    )


@query(
    "filter_in",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey", "c_mktsegment")
    )


@query(
    "filter_like",
    oracle="SELECT p_partkey, p_name FROM part WHERE p_name LIKE '%red%'",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_name")
    )


@query(
    "filter_null",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS amt
    FROM orders
    WHERE (CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END) IS NOT NULL
    """,
)
def filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL over a computed nullable column."""
    amt = F.when(F.col("o_orderstatus") == "O", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", amt.alias("amt"))
        .where(F.col("amt").isNotNull())
    )


@query(
    "filter_or_not",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    WHERE (o_orderstatus = 'F' OR o_orderpriority = '1-URGENT')
      AND NOT o_orderstatus = 'P'
    """,
)
def filter_or_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .where(
            (
                (F.col("o_orderstatus") == "F")
                | (F.col("o_orderpriority") == "1-URGENT")
            )
            & ~(F.col("o_orderstatus") == "P")
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    )


# --- C: joins ------------------------------------------------------------


@query(
    "join_inner_eq",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_inner_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim inner equi-join; dim broadcast (reference: README.md:296).

    At 100 TB customer-scale dims may exceed broadcast size — AQE then falls
    back to sort-merge; the hint is advisory, not load-bearing."""
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name", "o_totalprice")


@query(
    "join_dim_dim",
    oracle="""
    SELECT n.n_nationkey, n.n_name, r.r_name
    FROM nation n INNER JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_dim_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim⋈dim (reference: README.md:313 encounter⋈encounter_type)."""
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    return nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name", "r_name")


@query(
    "join_fact_dim",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, l.l_quantity
    FROM lineitem l INNER JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size > 40
    """,
)
def join_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim with a dim-side filter applied *before* the join (Catalyst
    pushes it below the broadcast anyway; written explicitly for clarity)."""
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_size") > 40)
    return lineitem.join(
        F.broadcast(part), lineitem.l_partkey == part.p_partkey
    ).select("l_orderkey", "l_linenumber", "p_name", "l_quantity")


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, COALESCE(oc.cnt, 0) AS n_orders
    FROM customer c
    LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey) oc
      ON c.c_custkey = oc.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving dimension rows with no facts."""
    customer = table(spark, sf_dir, "customer")
    per_cust = (
        table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey", F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS) — no fact-side row multiplication."""
    customer = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return customer.join(
        big, customer.c_custkey == big.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — also the incremental-diff primitive
    (SURVEY.md §2.A A3)."""
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@query(
    "join_multiway",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY r.r_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake chain region⋈nation⋈customer + aggregate; both small dims
    broadcast so the plan is two broadcast joins + one hash aggregate."""
    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")
    return (
        customer.join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_theta",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p.p_brand
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a non-equi residual (theta) condition."""
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    return (
        lineitem.join(
            F.broadcast(part),
            (lineitem.l_partkey == part.p_partkey)
            & (lineitem.l_quantity > part.p_size),
        )
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# --- F: sorts / limits / set ops ----------------------------------------


@query(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: Spark plans TakeOrderedAndProject (per-partition heap + driver
    merge), never a full sort — the right shape at any scale."""
    return (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "set_union",
    oracle="""
    SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS id FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) via unionByName + distinct."""
    a = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("id"))
    )
    b = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("id"))
    )
    return a.unionByName(b).distinct()


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
    EXCEPT
    SELECT o_custkey AS id FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("id"))
    )
    b = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("id"))
    )
    return a.subtract(b)


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS id FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS id FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = (
        table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("id"))
    )
    b = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("id"))
    )
    return a.intersect(b)


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, s_suppkey, s_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (SURVEY.md §2.C C4): every nation survives even
    with zero suppliers."""
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return sup.join(
        nat, sup.s_nationkey == nat.n_nationkey, "right"
    ).select("n_name", "s_suppkey", "s_name")


@query(
    "join_full_outer",
    oracle="""
    WITH c96 AS (
      SELECT o_custkey, COUNT(*) AS n96 FROM orders
      WHERE YEAR(o_orderdate) = 1996 GROUP BY o_custkey
    ), c97 AS (
      SELECT o_custkey, COUNT(*) AS n97 FROM orders
      WHERE YEAR(o_orderdate) = 1997 GROUP BY o_custkey
    )
    SELECT COALESCE(c96.o_custkey, c97.o_custkey) AS o_custkey,
           c96.n96, c97.n97
    FROM c96 FULL OUTER JOIN c97 ON c96.o_custkey = c97.o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (SURVEY.md §2.C C4): customers active in either
    year, with NULL on the missing side."""
    orders = table(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            orders.where(F.year("o_orderdate") == y)
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    c96 = year_counts(1996, "n96").withColumnRenamed("o_custkey", "k96")
    c97 = year_counts(1997, "n97").withColumnRenamed("o_custkey", "k97")
    return c96.join(c97, c96.k96 == c97.k97, "full").select(
        F.coalesce("k96", "k97").alias("o_custkey"), "n96", "n97"
    )


@query(
    "agg_salted",
    oracle="""
    SELECT o_orderpriority,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted two-phase aggregation over a LOW-cardinality
    (hot) key — the skew idiom (operators/skew.py): phase 1 spreads each
    key over 16 salted reducers, phase 2 merges. The oracle is the plain
    GROUP BY — salting must be invisible in the result."""
    from openmrs_module_mamba_etl_spark.operators.skew import salted_agg

    orders = table(spark, sf_dir, "orders")
    out = salted_agg(
        orders,
        keys=["o_orderpriority"],
        aggs={"revenue": ("o_totalprice", "sum"), "n_orders": ("o_orderkey", "count")},
        n_salts=16,
        salt_cols=["o_orderkey"],
    )
    return out.select(
        "o_orderpriority", F.round("revenue", 2).alias("revenue"), "n_orders"
    )


@query(
    "join_salted_replicate",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def join_salted_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted replicated join (operators/skew.py): the skewed fact side
    spreads over 16 salt buckets, the dimension replicates per bucket, the
    join key becomes (key, salt) — the manual heavy-hitter defense when a
    hot key overwhelms one reducer and the dim is too big to broadcast.
    Salting must be invisible: the oracle is the plain equi-join."""
    from openmrs_module_mamba_etl_spark.operators.skew import replicate_join

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("c_custkey")
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cust = cust.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
    return replicate_join(orders, cust, ["c_custkey"], n_salts=16).select(
        "o_orderkey", "o_totalprice", "c_mktsegment"
    )


@query(
    "join_asof",
    oracle="""
    WITH r AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                ORDER BY event_id DESC) AS rn
      FROM events
    ), rd AS (
      SELECT user_id, make_timestamp(tus) AS rts, value FROM r WHERE rn = 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           rd.value AS asof_value, epoch_us(rd.rts) AS asof_tus
    FROM orders o ASOF LEFT JOIN rd
      ON o.o_custkey = rd.user_id AND rd.rts <= CAST(o.o_orderdate AS TIMESTAMP)
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (C5 analogue — the point-in-time operator the MySQL
    surface can only emulate with a correlated subquery): each order is
    enriched with the customer's most recent event value at or before the
    order date. Union + one window sort + carry-forward — linear, no
    non-equi pair blow-up; the DuckDB oracle uses its native ASOF JOIN."""
    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ets"),
        "value",
    )
    out = asof_join(
        orders,
        events,
        key_col="o_custkey",
        left_ts="o_orderdate",
        right_ts="ets",
        payload_cols=["value"],
        tiebreak_col="event_id",
        right_key_col="user_id",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_value"),
        F.unix_micros("asof_ts").alias("asof_tus"),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH r AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                ORDER BY event_id DESC) AS rn
      FROM events
    ), rd AS (
      SELECT user_id, make_timestamp(tus) AS rts, value FROM r WHERE rn = 1
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           rd.value AS asof_value, epoch_us(rd.rts) AS asof_tus
    FROM orders o ASOF LEFT JOIN rd
      ON o.o_custkey = rd.user_id AND rd.rts >= CAST(o.o_orderdate AS TIMESTAMP)
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each order enriched with the customer's
    EARLIEST event value at or after the order date (the next-reading /
    scheduling variant). Same union + one-window-sort plan as the
    backward join — only the scan direction flips."""
    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ets"),
        "value",
    )
    out = asof_join(
        orders,
        events,
        key_col="o_custkey",
        left_ts="o_orderdate",
        right_ts="ets",
        payload_cols=["value"],
        tiebreak_col="event_id",
        right_key_col="user_id",
        direction="forward",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_value"),
        F.unix_micros("asof_ts").alias("asof_tus"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH r AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                ORDER BY event_id DESC) AS rn
      FROM events
    ), rd AS (
      SELECT user_id, make_timestamp(tus) AS rts, value FROM r WHERE rn = 1
    ), raw AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
             rd.value AS v, epoch_us(rd.rts) AS t
      FROM orders o ASOF LEFT JOIN rd
        ON o.o_custkey = rd.user_id AND rd.rts <= CAST(o.o_orderdate AS TIMESTAMP)
    )
    SELECT o_orderkey, o_custkey, o_orderdate,
           CASE WHEN epoch_us(CAST(o_orderdate AS TIMESTAMP)) - t
                     <= 2592000000000 THEN v END AS asof_value,
           CASE WHEN epoch_us(CAST(o_orderdate AS TIMESTAMP)) - t
                     <= 2592000000000 THEN t END AS asof_tus
    FROM raw
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match-distance bound (pandas merge_asof
    ``tolerance`` semantics): enrich each order with the customer's most
    recent event value at most 30 days old — staler matches revert to
    NULL. The tolerance gates only the emit expressions; the carry plan
    (union + one window sort) is unchanged, which the shared oracle CASE
    confirms."""
    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ets"),
        "value",
    )
    out = asof_join(
        orders,
        events,
        key_col="o_custkey",
        left_ts="o_orderdate",
        right_ts="ets",
        payload_cols=["value"],
        tiebreak_col="event_id",
        right_key_col="user_id",
        tolerance_us=30 * 24 * 3600 * 1_000_000,
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_value"),
        F.unix_micros("asof_ts").alias("asof_tus"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH r AS (
      SELECT user_id, epoch_us(ts) AS tus, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, epoch_us(ts)
                                ORDER BY event_id DESC) AS rn
      FROM events
    ), rd AS (
      SELECT user_id, make_timestamp(tus) AS rts, value FROM r WHERE rn = 1
    ), raw AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
             epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) AS lts,
             b.value AS vb, epoch_us(b.rts) AS tb,
             f.value AS vf, epoch_us(f.rts) AS tf
      FROM orders o
      ASOF LEFT JOIN rd b
        ON o.o_custkey = b.user_id AND b.rts <= CAST(o.o_orderdate AS TIMESTAMP)
      ASOF LEFT JOIN rd f
        ON o.o_custkey = f.user_id AND f.rts >= CAST(o.o_orderdate AS TIMESTAMP)
    )
    SELECT o_orderkey, o_custkey, o_orderdate,
           CASE WHEN tb IS NOT NULL AND (tf IS NULL OR lts - tb <= tf - lts)
                THEN vb ELSE vf END AS asof_value,
           CASE WHEN tb IS NOT NULL AND (tf IS NULL OR lts - tb <= tf - lts)
                THEN tb ELSE tf END AS asof_tus
    FROM raw
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction="nearest")``):
    each order enriched with the customer event value CLOSEST in absolute
    time, earlier or later, ties to the earlier row. One ascending sort
    serves both sides — backward via the prefix carry, forward via the
    suffix first — so the plan still pays a single exchange; the oracle
    is two native DuckDB ASOF joins + the same nearest CASE."""
    from openmrs_module_mamba_etl_spark.operators.asof import asof_join

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.timestamp_micros(F.expr("ts div 1000")).alias("ets"),
        "value",
    )
    out = asof_join(
        orders,
        events,
        key_col="o_custkey",
        left_ts="o_orderdate",
        right_ts="ets",
        payload_cols=["value"],
        tiebreak_col="event_id",
        right_key_col="user_id",
        direction="nearest",
    )
    return out.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.col("asof_value"),
        F.unix_micros("asof_ts").alias("asof_tus"),
    )


@query(
    "join_range",
    oracle="""
    SELECT i.event_id AS purchase_id, p.event_id AS event_id
    FROM events i JOIN events p
      ON p.user_id = i.user_id
     AND i.event_type = 'purchase'
     AND epoch_us(p.ts) >= epoch_us(i.ts)
     AND epoch_us(p.ts) <  epoch_us(i.ts) + 21600000000
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (C5 analogue): every event falling in the 6-hour window
    opened by each purchase of the same user (classic attribution). The
    interval side is bucketized so the range join runs as a (key, bucket)
    equi-join — each true pair meets in exactly one bucket, the exact
    half-open predicate filters survivors — instead of the per-key
    cartesian a raw theta join would execute."""
    from openmrs_module_mamba_etl_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    HOUR_US = 3_600_000_000
    ev = table(spark, sf_dir, "events")
    points = ev.select(
        "event_id", "user_id", F.expr("ts div 1000").alias("tus")
    )
    intervals = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("i_user"),
        F.expr("ts div 1000").alias("w_start"),
        (F.expr("ts div 1000") + F.lit(6 * HOUR_US)).alias("w_end"),
    )
    out = point_in_interval_join(
        points,
        intervals,
        point_key="user_id",
        interval_key="i_user",
        ts_col="tus",
        start_col="w_start",
        end_col="w_end",
        bucket_width=6 * HOUR_US,
    )
    return out.select("purchase_id", "event_id")
