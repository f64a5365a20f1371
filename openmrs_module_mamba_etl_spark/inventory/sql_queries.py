"""SQL-surface inventory: the free-form SELECT capability of the report
path (reference: README.md:296 — ``sql_query`` is arbitrary MySQL), expressed
through ``spark.sql`` over registered views: CTEs, subqueries (scalar /
EXISTS / IN), GROUPING SETS, DISTINCT, UNION ALL, LIMIT/OFFSET, regex and
string families, percentile/statistics aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


@query(
    "sql_cte",
    oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey
    )
    SELECT c.c_mktsegment, COUNT(*) AS n_customers,
           ROUND(SUM(co.total), 2) AS segment_total
    FROM cust_orders co JOIN customer c ON co.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common table expression feeding a join + reaggregation."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
          FROM orders GROUP BY o_custkey
        )
        SELECT c.c_mktsegment, COUNT(*) AS n_customers,
               ROUND(SUM(co.total), 2) AS segment_total
        FROM cust_orders co JOIN customer c ON co.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        """
    )


@query(
    "sql_scalar_subquery",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2)
             AS delta_from_avg
    FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in projection and predicate."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 2)
                 AS delta_from_avg
        FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "sql_exists_subquery",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
    """,
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (planned as a left-semi join by Catalyst)."""
    _views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
        )
        """
    )


@query(
    "sql_in_subquery",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (
      SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
    )
    """,
)
def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (
          SELECT l_partkey FROM lineitem WHERE l_discount >= 0.09
        )
        """
    )


@query(
    "sql_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "sql_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def sql_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders"
    )


@query(
    "sql_union_all",
    oracle="""
    SELECT o_custkey AS id, 'order' AS src FROM orders WHERE o_totalprice > 450000
    UNION ALL
    SELECT c_custkey AS id, 'customer' AS src FROM customer WHERE c_acctbal < -900
    """,
)
def sql_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_custkey AS id, 'order' AS src FROM orders WHERE o_totalprice > 450000
        UNION ALL
        SELECT c_custkey AS id, 'customer' AS src FROM customer WHERE c_acctbal < -900
        """
    )


@query(
    "sql_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5 OFFSET 10
    """,
)
def sql_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: deterministic total order + LIMIT/OFFSET."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5 OFFSET 10
        """
    )


@query(
    "sql_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^(red|blue)') AS is_primary_color
    FROM part
    """,
)
def sql_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract group, replace-all, match test.

    Spark regexp_replace replaces all occurrences by default; the DuckDB
    oracle needs the explicit 'g' flag for the same semantics.
    """
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey,
               regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS noun,
               regexp_replace(p_name, '[aeiou]', '_') AS devoweled,
               p_name RLIKE '^(red|blue)' AS is_primary_color
        FROM part
        """
    )


@query(
    "sql_string_family",
    oracle="""
    SELECT c_custkey,
           TRIM(UPPER(c_name)) AS up,
           REPLACE(c_name, 'Customer', 'Cust') AS replaced,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           SPLIT_PART(c_name, '#', 2) AS name_num,
           LEFT(c_mktsegment, 3) AS seg3,
           REVERSE(c_mktsegment) AS seg_rev
    FROM customer
    """,
)
def sql_string_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               TRIM(UPPER(c_name)) AS up,
               REPLACE(c_name, 'Customer', 'Cust') AS replaced,
               LPAD(CAST(c_custkey AS STRING), 8, '0') AS padded,
               SPLIT_PART(c_name, '#', 2) AS name_num,
               LEFT(c_mktsegment, 3) AS seg3,
               REVERSE(c_mktsegment) AS seg_rev
        FROM customer
        """
    )


@query(
    "sql_conditional_fns",
    oracle="""
    SELECT o_orderkey,
           GREATEST(o_totalprice, 100000.0) AS floor_price,
           LEAST(o_totalprice, 400000.0) AS cap_price,
           IFNULL(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
    FROM orders
    """,
)
def sql_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               GREATEST(o_totalprice, 100000.0D) AS floor_price,
               LEAST(o_totalprice, 400000.0D) AS cap_price,
               IFNULL(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label
        FROM orders
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``). The 100 TB variant is ``percentile_approx``
    (t-digest sketch, mergeable map-side)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               ROUND(percentile(o_totalprice, 0.5), 2) AS median_price,
               ROUND(percentile(o_totalprice, 0.9), 2) AS p90_price
        FROM orders GROUP BY o_orderstatus
        """
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
           ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev / variance / correlation."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
               ROUND(VAR_SAMP(l_quantity), 2) AS var_qty,
               ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price
        FROM lineitem GROUP BY l_returnflag
        """
    )


@query("agg_approx_distinct")  # HLL sketch values are engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct — the 100 TB replacement for exact COUNT
    (DISTINCT): mergeable HLL, no global distinct shuffle. Sketch estimates
    are engine-specific ⇒ rows-only check; the unit test bounds its error
    against the exact count."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT approx_count_distinct(o_custkey) AS approx_customers
        FROM orders
        """
    )


@query(
    "sql_lateral_join",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2
    ) t ON TRUE
    """,
)
def sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per customer) — part of
    the reference's free-form MySQL 8 surface (LATERAL since 8.0.14).
    Catalyst DECORRELATES it: the plan is a window/limit per key + join,
    not a per-row subquery execution, so it scales like the window form
    rather than O(customers) round trips."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2
        ) t
        """
    )


@query(
    "sql_pivot",
    oracle="""
    SELECT o_custkey,
           ROUND(COALESCE("O", 0), 2) AS status_o,
           ROUND(COALESCE("F", 0), 2) AS status_f,
           ROUND(COALESCE("P", 0), 2) AS status_p
    FROM (
      PIVOT (SELECT o_custkey, o_orderstatus, o_totalprice FROM orders)
      ON o_orderstatus IN ('O', 'F', 'P')
      USING SUM(o_totalprice)
    )
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-dialect PIVOT syntax (the declarative spelling of the flatten's
    groupBy().pivot() — same single-shuffle plan): per-customer order
    value by status. Values list is explicit, so no discovery pass."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey,
               ROUND(COALESCE(O, 0), 2) AS status_o,
               ROUND(COALESCE(F, 0), 2) AS status_f,
               ROUND(COALESCE(P, 0), 2) AS status_p
        FROM (SELECT o_custkey, o_orderstatus, o_totalprice FROM orders)
        PIVOT (SUM(o_totalprice) FOR o_orderstatus IN ('O', 'F', 'P'))
        """
    )


@query(
    "sql_unpivot",
    oracle="""
    SELECT p_partkey, metric, ROUND(val, 2) AS val
    FROM (UNPIVOT part ON p_size, p_retailprice INTO NAME metric VALUE val)
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide numeric columns to (key, metric, value) long
    form — the inverse of the flatten family's pivot, used to feed
    generic per-metric pipelines (profiling, drift checks) without one
    job per column.

    Map-only: each input row fans out to one row per measure inside the
    scan's stage, no shuffle, no Python. Mixed int/double measures
    coerce to a common double ``val`` identically in both engines."""
    _views(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_partkey, metric, ROUND(val, 2) AS val
        FROM part UNPIVOT (val FOR metric IN (p_size, p_retailprice))
        """
    )


@query(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE mo(month_idx) AS (
      SELECT 0
      UNION ALL
      SELECT month_idx + 1 FROM mo
      WHERE month_idx < (
        SELECT MAX((YEAR(CAST(o_orderdate AS DATE)) - 1992) * 12
                   + MONTH(CAST(o_orderdate AS DATE)) - 1) FROM orders)
    )
    SELECT mo.month_idx, COUNT(o.o_orderkey) AS n_orders
    FROM mo LEFT JOIN (
      SELECT o_orderkey,
             (YEAR(CAST(o_orderdate AS DATE)) - 1992) * 12
             + MONTH(CAST(o_orderdate AS DATE)) - 1 AS month_idx
      FROM orders
    ) o ON o.month_idx = mo.month_idx
    GROUP BY mo.month_idx
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (SQL:1999 WITH RECURSIVE, Spark 4's UnionLoop):
    a dense month spine unrolled by recursion from month 0 to the data's
    max month, LEFT-joined to per-month order counts so empty months
    surface as 0 — the fully declarative sibling of ``rollup_gapfill``.

    The recursion materializes only the spine (bounded by the scalar
    max-month subquery, ~84 rows at any SF); the fact side stays a
    single hash aggregate. Depth — not data volume — drives loop
    iterations (each UnionLoop level is a plan execution), which is why
    the spine is monthly: spine grain is the knob that keeps recursive
    wall-time flat as the fact side scales."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH RECURSIVE mo(month_idx) MAX RECURSION LEVEL 200 AS (
          SELECT 0
          UNION ALL
          SELECT month_idx + 1 FROM mo
          WHERE month_idx < (
            SELECT MAX((YEAR(CAST(o_orderdate AS DATE)) - 1992) * 12
                       + MONTH(CAST(o_orderdate AS DATE)) - 1) FROM orders)
        )
        SELECT mo.month_idx, COUNT(o.o_orderkey) AS n_orders
        FROM mo LEFT JOIN (
          SELECT o_orderkey,
                 (YEAR(CAST(o_orderdate AS DATE)) - 1992) * 12
                 + MONTH(CAST(o_orderdate AS DATE)) - 1 AS month_idx
          FROM orders
        ) o ON o.month_idx = mo.month_idx
        GROUP BY mo.month_idx
        """
    )


@query(
    "sql_window_named",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COUNT(*) OVER w AS n_so_far,
           ROUND(SUM(o_totalprice) OVER w, 2) AS spend_so_far,
           RANK() OVER w AS rk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
)
def sql_window_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named WINDOW clause: three analytic functions share one window
    definition — and therefore ONE sort+exchange in the physical plan,
    the declarative spelling of 'reuse a partitioning across stages'.

    All three run in a single Window physical operator; defining them
    inline would still dedupe, but the named form makes the sharing a
    contract rather than an optimizer courtesy."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER w AS n_so_far,
               ROUND(SUM(o_totalprice) OVER w, 2) AS spend_so_far,
               RANK() OVER w AS rk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
        """
    )


@query(
    "sql_values_inline",
    oracle="""
    SELECT t.tier, COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS total
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'),
                 ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
                 ('5-LOW', 'defer')) AS t(priority, tier)
      ON o.o_orderpriority = t.priority
    GROUP BY t.tier
    """,
)
def sql_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES table constructor as a literal dimension (the
    hand-maintained mapping table every report has), joined and
    reaggregated.

    The VALUES relation is a LocalRelation — Catalyst broadcasts it (or
    constant-folds it into the join) with zero scan cost, the exact
    pattern to prefer over a driver-side dict lookup UDF."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT t.tier, COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total
        FROM orders o
        JOIN (VALUES ('1-URGENT', 'expedite'), ('2-HIGH', 'expedite'),
                     ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'standard'),
                     ('5-LOW', 'defer')) AS t(priority, tier)
          ON o.o_orderpriority = t.priority
        GROUP BY t.tier
        """
    )


@query(
    "report_week_rollup",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%U') AS wk_sun,
           strftime(o_orderdate, '%V') AS wk_iso,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY wk_sun, wk_iso
    """,
)
def report_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-of-year indicator rollup THROUGH THE DIALECT SHIM — the
    weekly-report shape EMR surveillance reports use (reference report
    surface: README.md:296 free-form MySQL). The MySQL source uses %U
    (Sunday week) and %v (ISO week) DATE_FORMAT tokens; Spark bans
    week-based pattern letters, so functions/dialect.py compiles the
    calls to concat(date_format(...), lpad(weekofyear-family arithmetic))
    expressions. The oracle pins the cross-engine week semantics: DuckDB
    strftime's C-standard %U == MySQL %U, %V (ISO) == MySQL %v."""
    from openmrs_module_mamba_etl_spark.functions.dialect import (
        translate_mysql,
    )

    _views(spark, sf_dir, "orders")
    return spark.sql(
        translate_mysql(
            """
            SELECT DATE_FORMAT(o_orderdate, '%Y-%U') AS wk_sun,
                   DATE_FORMAT(o_orderdate, '%v') AS wk_iso,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY wk_sun, wk_iso
            """
        )
    )

@query(
    "report_week_year_rollup",
    oracle="""
    WITH lab AS (
      SELECT o_totalprice,
             strftime(o_orderdate, '%G-w%V') AS wk_iso,
             CAST(strftime(o_orderdate, '%U') AS INT) AS w0,
             CAST(strftime(o_orderdate, '%Y') AS INT) AS yy,
             CAST(strftime(make_date(
               CAST(strftime(o_orderdate, '%Y') AS INT) - 1, 12, 31
             ), '%U') AS INT) AS wprev
      FROM orders
    )
    SELECT wk_iso,
           lpad(CAST(CASE WHEN w0 = 0 THEN yy - 1 ELSE yy END AS VARCHAR),
                4, '0')
           || '/'
           || lpad(CAST(CASE WHEN w0 = 0 THEN wprev ELSE w0 END AS VARCHAR),
                   2, '0') AS wk_sun,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM lab
    GROUP BY wk_iso, wk_sun
    """,
)
def report_week_year_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-of-year rollup with PAIRED WEEK-YEARS through the dialect shim
    — the year-boundary-safe form of report_week_rollup (a bare week
    number conflates the Dec/Jan wrap; pairing it with its week-year is
    how MySQL surveillance reports label epidemiological weeks). The
    MySQL source uses '%x-w%v' (ISO week-year + ISO week) and '%X/%V'
    (Sunday week-year + WEEK(d,2)); functions/dialect.py compiles both to
    exact integer arithmetic. The oracle pins cross-engine semantics:
    DuckDB strftime's C-standard %G-%V pair == MySQL %x-%v, and MySQL
    WEEK mode 2 folds out of strftime %U by carrying the previous year's
    last week onto the January week-00 days."""
    from openmrs_module_mamba_etl_spark.functions.dialect import (
        translate_mysql,
    )

    _views(spark, sf_dir, "orders")
    return spark.sql(
        translate_mysql(
            """
            SELECT DATE_FORMAT(o_orderdate, '%x-w%v') AS wk_iso,
                   DATE_FORMAT(o_orderdate, '%X/%V') AS wk_sun,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o_totalprice), 2) AS revenue
            FROM orders GROUP BY wk_iso, wk_sun
            """
        )
    )
