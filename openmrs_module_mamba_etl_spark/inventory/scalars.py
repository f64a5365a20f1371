"""Scalar-function inventory: SURVEY.md §2.G (the MySQL dialect the report
surface uses, re-expressed with Spark built-ins).

``fn_date_format`` runs through the dialect shim (functions/dialect.py) to
prove the MySQL ``%``-token translation end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.functions.dialect import translate_mysql
from openmrs_module_mamba_etl_spark.registry import query
from openmrs_module_mamba_etl_spark.sources.parquet import table


@query(
    "fn_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_day,
           YEAR(o_orderdate) AS order_year,
           MONTH(o_orderdate) AS order_month,
           DAY(o_orderdate) AS order_dom
    FROM orders
    """,
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE()/YEAR()/... extraction (reference: README.md:313)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_day"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_dom"),
    )


@query(
    "fn_date_format",
    oracle="""
    SELECT o_orderkey, STRFTIME(o_orderdate, '%Y-%m-01') AS month_start
    FROM orders
    """,
)
def fn_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL DATE_FORMAT with %-tokens through the dialect shim
    (reference: README.md:321 ``DATE_FORMAT(NOW(), '%Y-01-01')``)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    sql = translate_mysql(
        "SELECT o_orderkey, DATE_FORMAT(o_orderdate, '%Y-%m-01') AS month_start "
        "FROM orders"
    )
    return spark.sql(sql)


@query(
    "fn_concat",
    oracle="""
    SELECT c_custkey, CONCAT(c_name, ':', c_mktsegment) AS label
    FROM customer
    """,
)
def fn_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONCAT (reference: README.md:313)."""
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias(
            "label"
        ),
    )


@query(
    "fn_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                WHEN o_totalprice < 300000 THEN 'medium'
                ELSE 'large' END AS bucket,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def fn_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate."""
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        table(spark, sf_dir, "orders")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "fn_string_math",
    oracle="""
    SELECT p_partkey,
           LOWER(p_type) AS type_lower,
           SUBSTRING(p_name, 1, 5) AS name_prefix,
           ROUND(p_retailprice * 1.1, 2) AS price_with_tax,
           ABS(p_size - 25) AS size_dev,
           COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
    FROM part
    """,
)
def fn_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math/null-handling family: LOWER/SUBSTRING/ROUND/ABS/COALESCE
    (SURVEY.md §2.G G7)."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("price_with_tax"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.coalesce(
            F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("OTHER")
        ).alias("brand_or_other"),
    )


@query(
    "fn_date_trunc",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS order_month,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY 1
    """,
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATE()-style truncation rolled up to month grain (SURVEY.md §2.G G1;
    reference: README.md:313 ``DATE(e.encounter_datetime)``). The truncation
    is a scalar expression on the grouping key, so the plan stays one
    partial+final hash aggregate."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.trunc("o_orderdate", "month").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding,
                                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                 4) AS norm_sq,
           ROUND(list_sum(list_transform(embedding[1:8],
                                         x -> CAST(x AS DOUBLE))), 4) AS head_sum
    FROM embeddings
    """,
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (size / transform / aggregate / slice)
    — the JVM-side vector-math substrate the similarity operators build on
    (SURVEY.md §2.I). Left-fold accumulation matches DuckDB's list_sum."""
    e = table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(sq, 4).alias("norm_sq"),
        F.round(head, 4).alias("head_sum"),
    )


@query(
    "fn_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAY AS due_date,
           DATE_DIFF('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_cutoff
    FROM orders
    """,
)
def fn_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + date difference."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate")
        ).alias("days_to_cutoff"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    """,
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction (MySQL JSON_EXTRACT analog, SURVEY.md §2.G G7)."""
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "fn_null_handling",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
           GREATEST(o_totalprice, 100000.0) AS floored_price,
           CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL
                THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar family (SURVEY.md §2.G G7: COALESCE/NULLIF/
    GREATEST/IS NULL — the MySQL IFNULL/NVL dialect surface)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")
        ).alias("status_label"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("floored_price"),
        F.when(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).isNull(), 1
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@query(
    "fn_sql_udf",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE '2026-01-01' - CAST(o_orderdate AS DATE) AS INT)
             AS age_days,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'mid'
                ELSE 'small' END AS size_band
    FROM orders
    """,
)
def fn_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implementer-defined SQL scalar functions — the Spark analog of the
    reference's CREATE FUNCTION extension point (reference: README.md:45,
    85-98, the `_etl` routine privileges discussion; SURVEY §2.H H3).

    Declared with `CREATE TEMPORARY FUNCTION ... RETURN <expr>` (Spark ≥4
    SQL UDFs): unlike Python UDFs these are INLINED into the plan by
    Catalyst — codegen, pushdown, and constant folding all still apply, so
    the extension mechanism costs nothing at 100 TB. Anchored to a fixed
    date so results are deterministic."""
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION order_age_days(d TIMESTAMP)
           RETURNS INT
           RETURN CAST(datediff(DATE'2026-01-01', to_date(d)) AS INT)"""
    )
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
           RETURNS STRING
           RETURN CASE WHEN p >= 200000 THEN 'large'
                       WHEN p >= 50000 THEN 'mid'
                       ELSE 'small' END"""
    )
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """SELECT o_orderkey,
                  order_age_days(o_orderdate) AS age_days,
                  price_band(o_totalprice) AS size_band
           FROM orders_v"""
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE ROUND(l_extendedprice / l_discount, 2)
           END AS price_per_discount,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic/casts (the ANSI-mode survival kit):
    ``try_divide`` turns division by zero into NULL instead of a job
    abort, ``try_cast`` does the same for unparseable values — at 100 TB
    a single malformed row must never kill the stage (the row-level
    sibling of ``source_malformed``'s file-level quarantine).

    ``l_discount`` is 0 on a large fraction of rows, so the zero-divide
    path is exercised constantly. The oracle spells the same semantics
    with explicit CASE/TRY_CAST, pinning that TRY_* is sugar, not
    different math."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide(F.col("l_extendedprice"), F.col("l_discount")), 2
        ).alias("price_per_discount"),
        F.expr("TRY_CAST(l_returnflag AS INT)").alias("flag_as_int"),
        F.expr("TRY_CAST(l_shipdate AS DATE)").alias("ship_date"),
    )


@query(
    "fn_pseudonymize",
    oracle="""
    SELECT sha256('mamba-export-v1:' || CAST(c_custkey AS VARCHAR))
             AS person_token,
           c_mktsegment AS segment,
           CAST(SUBSTR(CAST(c_custkey AS VARCHAR), 1, 1) || REPEAT('*',
                LENGTH(CAST(c_custkey AS VARCHAR)) - 1) AS VARCHAR)
             AS masked_id
    FROM customer ORDER BY person_token
    """,
)
def fn_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pseudonymization for de-identified export — the
    healthcare-ETL requirement the reference's person data implies
    (OpenMRS person rows leave the clinical boundary only de-identified):
    a salted-hash token replaces the identifier (same input → same token,
    so joins and longitudinal linkage still work across exported tables)
    plus a display-masking variant. Pure codegen (sha2/concat), map-only;
    the salt would come from a secret store in production — a fixed
    literal here so the oracle can replay it."""
    c = table(spark, sf_dir, "customer")
    ids = F.col("c_custkey").cast("string")
    return c.select(
        F.sha2(F.concat(F.lit("mamba-export-v1:"), ids), 256).alias(
            "person_token"
        ),
        F.col("c_mktsegment").alias("segment"),
        F.concat(
            F.substring(ids, 1, 1),
            F.repeat(F.lit("*"), F.length(ids) - 1),
        ).alias("masked_id"),
    ).orderBy("person_token")
