"""TPC-H-adapted suite, part 2 — the remaining 14 canonical shapes.

Together with ``tpch_queries`` (q3/q5/q10/q13/q14/q18/q19/q22) this
completes the 22-query decision-support suite over the driver testdata.
The reference's report surface is arbitrary MySQL SELECT with bound
parameters (reference: README.md:288-328, ``report_sql.sql_query``), so
these shapes are part of the declared capability. The testdata has no
``partsupp`` table and a reduced column set (TESTDATA.md), so predicates
are adapted — the *plan shapes* (correlated scalar subqueries, EXISTS /
NOT EXISTS double correlation, view-over-aggregate, disjunctive
multi-join) are the canonical ones:

- q1  pricing summary: full-scan groupBy with 8 aggregates
- q2  min-cost supplier: correlated MIN subquery over a derived
      supply relation (lineitem-derived, replacing partsupp)
- q4  order-priority check: EXISTS with a cross-table date condition
- q6  forecast revenue: pure scan-filter-aggregate (no join)
- q7  volume shipping: bidirectional nation pair, year rollup
- q8  national market share: conditional share inside one aggregate
- q9  product-type profit: profit expression over a 5-way join
      (cost basis adapted to 0.6 × p_retailprice × quantity)
- q11 important stock: group-by + global scalar threshold subquery
- q12 priority shipping: conditional counts over a late-ship predicate
      (priority classes replace the missing l_shipmode)
- q15 top supplier: aggregate view + scalar MAX equality
- q16 supplier-part relationship: COUNT(DISTINCT) with NOT IN exclusion
- q17 small-quantity revenue: per-part correlated average threshold
- q20 potential promotion: nested aggregate semi-filter chain
- q21 waiting suppliers: EXISTS + NOT EXISTS double correlation,
      realized as one (orderkey, suppkey) aggregate + per-order rollup

Scale notes (100 TB design point): every query keeps the fact-side
filters on the scan (pushed predicates), joins dims via broadcast
(nation/region structurally tiny; part/supplier/customer left to AQE),
and expresses correlation as aggregate-then-join so no per-row subquery
executes. Top-k outputs use unique-key tiebreaks → deterministic
TakeOrdered. Integer-valued double sums (quantities) are exact in IEEE
double, so threshold comparisons are engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report: the canonical full-scan aggregate. Six
    grouping cells, eight aggregates — all decomposable, so the partial
    (map-side) aggregation reduces each scan partition to ≤6 rows before
    the single tiny shuffle. The date filter pushes to the parquet scan."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= "2001-09-01"
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(_revenue()), 2).alias("sum_disc_price"),
            F.round(
                F.sum(_revenue() * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q2",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    asia_supply AS (
        SELECT sp.l_partkey, sp.l_suppkey, sp.unit_cost,
               s.s_acctbal, s.s_name, n.n_name
        FROM supply sp
        JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT ROUND(a.s_acctbal, 2) AS s_acctbal, a.s_name, a.n_name,
           p.p_partkey, p.p_type
    FROM part p
    JOIN asia_supply a ON p.p_partkey = a.l_partkey
    WHERE p.p_size = 15
      AND a.unit_cost = (
          SELECT MIN(a2.unit_cost) FROM asia_supply a2
          WHERE a2.l_partkey = p.p_partkey
      )
    ORDER BY s_acctbal DESC, a.n_name, a.s_name, p.p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier: who supplies size-15 parts at the lowest
    unit cost within ASIA. The partsupp relation is derived from lineitem
    (unit_cost = MIN(extendedprice/quantity) per part-supplier pair); the
    correlated MIN subquery becomes a per-part window minimum over the
    already-region-filtered supply — one aggregate + one window on the
    same partkey hashing, no per-row subquery. MIN is a selection (no
    arithmetic), so the float equality is engine-portable."""
    li = table(spark, sf_dir, "lineitem")
    supply = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice") / F.col("l_quantity")
            ).alias("unit_cost")
        )
    )
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    asia_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    supplier = table(spark, sf_dir, "supplier").join(
        asia_nations, F.col("s_nationkey") == F.col("n_nationkey")
    )
    asia_supply = supply.join(
        F.broadcast(supplier.select("s_suppkey", "s_acctbal", "s_name", "n_name")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    w = Window.partitionBy("l_partkey")
    best = asia_supply.withColumn(
        "min_cost", F.min("unit_cost").over(w)
    ).where(F.col("unit_cost") == F.col("min_cost"))
    part = table(spark, sf_dir, "part").where(F.col("p_size") == 15)
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking: orders in one quarter with at least one
    line shipped >30 days after order date (late-ship stand-in for the
    missing commit/receipt dates). The EXISTS is a left-semi join whose
    condition spans both sides — Spark keeps it in the semi-join's
    non-equi residual, so each order is emitted at most once and no
    distinct is needed."""
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1997-07-01")
        & (F.col("o_orderdate") < "1997-10-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-revenue change: the pure scan-filter-aggregate. All three
    predicates push to the parquet scan (row-group min/max stats prune on
    shipdate); the single global sum is a two-stage partial+final with no
    data shuffle beyond one row per partition."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue")
    )


@query(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           ROUND(SUM(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(YEAR(l.l_shipdate) AS INTEGER) AS l_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping between two nations, both directions, by year.
    Each nation alias is broadcast; the disjunctive pair filter runs
    after both broadcasts attach (Catalyst pushes the single-sided
    n∈{1,2} implications below the joins), and the fact shuffles only on
    the orderkey join."""
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    supp = table(spark, sf_dir, "supplier")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 4) AS mkt_share
    FROM (
        SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS nation
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                AND TIMESTAMP '1997-12-31'
          AND p.p_type = 'ECONOMY'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share: NATION_3's share of ASIA ECONOMY-part
    revenue per order year. The share is one conditional aggregate over a
    single joined pass — numerator and denominator never scan twice. The
    8-way snowflake keeps nation/region broadcast and lets AQE size the
    part/supplier/customer joins."""
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"),
    )
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("nation"),
    )
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = _revenue()
    national = F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0)
    return (
        joined.withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            F.round(F.sum(national) / F.sum(vol), 4).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year,
           SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) / 100.0 AS sum_profit
    FROM (
        SELECT n.n_name AS nation,
               CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
               l.l_extendedprice * (1 - l.l_discount)
                   - 0.6 * p.p_retailprice * l.l_quantity AS amount
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE p.p_name LIKE '%gear%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit: per supplier nation per year, for parts whose
    name contains 'gear'. Cost basis adapted to 0.6 × retailprice ×
    quantity (no partsupp.ps_supplycost in the testdata). The LIKE filter
    prunes part before its join; the profit expression is pure codegen.

    The profit sum accumulates exact integer cents: the per-row amount is
    a deterministic IEEE expression (identical in any engine), but a
    float SUM's partial order is not — at sf0.01 one group lands exactly
    on a half-cent boundary and a 1-ulp difference flips ROUND(x, 2).
    Rounding per row and summing BIGINT cents is associative, so the
    result is bit-identical under any partitioning."""
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    li = table(spark, sf_dir, "lineitem")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    nation = table(spark, sf_dir, "nation")
    amount = _revenue() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(
            (
                F.sum(F.round(F.col("amount") * 100, 0).cast("long")) / 100.0
            ).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11",
    oracle="""
    WITH value_by_part AS (
        SELECT l.l_partkey, SUM(l.l_quantity * p.p_retailprice) AS part_value
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_5'
        GROUP BY l.l_partkey
    )
    SELECT l_partkey, ROUND(part_value, 2) AS part_value
    FROM value_by_part
    WHERE part_value > (SELECT SUM(part_value) * 0.002 FROM value_by_part)
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock: parts whose NATION_5-supplied inventory value
    exceeds 0.2% of the national total. The per-part aggregate is
    computed once and reused for both the rows and the global threshold
    (scalar aggregate broadcast into the filter) — the classic
    view + scalar-subquery shape without a second scan."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    nation = table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_5"
    )
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    value_by_part = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.col("l_quantity") * F.col("p_retailprice")
            ).alias("part_value")
        )
    )
    threshold = value_by_part.agg(
        (F.sum("part_value") * 0.002).alias("threshold")
    )
    return (
        value_by_part.join(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("threshold"))
        .select(
            "l_partkey", F.round("part_value", 2).alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           COUNT(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority audit: among lines shipped >60 days after their
    order date in 1997, how many belong to high- vs low-priority orders,
    per return flag (return flag stands in for the missing l_shipmode).
    Conditional counts — one joined pass, both counters in the same
    partial aggregate; the cross-side date predicate rides the join."""
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           ROUND(r.total_revenue, 2) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier: the supplier(s) with maximum quarterly revenue. The
    revenue view is computed once; the scalar MAX re-aggregates the
    ~|suppliers| rows (not the fact) and broadcasts into the equality
    filter. MAX equality selects an existing value, so the float compare
    is within-engine-consistent on both sides of the oracle check."""
    revenue = (
        table(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_revenue"))
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supplier = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-part relationship: distinct supplier counts per
    (brand, type, size) cell, excluding negative-balance suppliers
    (stand-in for the complaints predicate). The NOT IN is a broadcast
    anti join against the tiny exclusion set; COUNT(DISTINCT) expands to
    the two-phase distinct-then-count aggregate on the same group keys."""
    part = table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue: lines of Brand#3 parts whose
    quantity is below 20% of that part's average. The correlated average
    becomes one per-partkey aggregate joined back to the (brand-filtered)
    lines — aggregate-then-join, no per-row subquery. Quantities are
    integer-valued doubles, so SUM/COUNT (hence AVG) are IEEE-exact and
    the 0.2×avg threshold compares identically across engines."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("avg_key"))
        .agg((0.2 * F.avg("l_quantity")).alias("qty_threshold"))
    )
    return (
        li.join(F.broadcast(part.select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("avg_key"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


@query(
    "tpch_q20",
    oracle="""
    WITH qty_by_supp_part AS (
        SELECT l.l_suppkey, l.l_partkey, SUM(l.l_quantity) AS total_qty
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
          SELECT q.l_suppkey FROM qty_by_supp_part q
          JOIN part p ON p.p_partkey = q.l_partkey
          WHERE p.p_name LIKE 'red%' AND q.total_qty > 50
      )
    ORDER BY s.s_name
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion: NATION_7 suppliers who moved more than
    50 units of any 'red' part in 1997. Nested aggregate semi-filter
    chain: the year-filtered per-(supplier, part) quantity aggregate is
    semi-joined by part name, then the supplier id set semi-filters the
    nation-filtered supplier dim. Quantity sums are integer-exact, so the
    >50 threshold is portable."""
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    red_parts = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    movers = (
        li.join(
            F.broadcast(red_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 50)
        .select("l_suppkey")
    )
    nation = table(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    )
    return (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(movers, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@query(
    "tpch_q21",
    oracle="""
    WITH per_supp AS (
        SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS my_max
        FROM lineitem
        GROUP BY l_orderkey, l_suppkey
    ),
    per_order AS (
        SELECT l_orderkey, MAX(my_max) AS order_max,
               COUNT(*) AS n_suppliers
        FROM per_supp
        GROUP BY l_orderkey
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM per_supp ps
    JOIN per_order po ON ps.l_orderkey = po.l_orderkey
    JOIN orders o ON o.o_orderkey = ps.l_orderkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE po.n_suppliers >= 2
      AND ps.my_max = po.order_max
      AND o.o_orderstatus = 'F'
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting: in multi-supplier 'F' orders,
    the supplier whose shipment was the last (max shipdate stands in for
    the missing receipt/commit dates). The canonical EXISTS + NOT EXISTS
    double correlation collapses into one (orderkey, suppkey) aggregate
    plus a per-order rollup — my_max = order_max ⟺ no other supplier
    shipped strictly later; both aggregates share the orderkey hash
    partitioning so the rollup and the join back are exchange-free after
    the first shuffle. MAX equality is a selection, engine-portable."""
    li = table(spark, sf_dir, "lineitem")
    per_supp = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("my_max"))
    )
    per_order = (
        per_supp.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(
            F.max("my_max").alias("order_max"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supplier = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        per_supp.join(per_order, F.col("l_orderkey") == F.col("ok"))
        .where(
            (F.col("n_suppliers") >= 2)
            & (F.col("my_max") == F.col("order_max"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
