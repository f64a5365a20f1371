"""The reference's clinical star schema, re-expressed over the test data.

Role mapping (FIXTURES.md §B): the ``events`` table plays the EAV ``obs``
long table (entity=user, attribute=event_type, value, ts), ``customer`` /
``nation`` / ``region`` play person/encounter-type dimensions, and ``orders``
/ ``lineitem`` play facts. The pipeline below builds the same three table
families the reference materializes (reference: README.md:252-256 —
``mamba_flat_encounter_*``, ``mamba_dim_*``, ``mamba_fact_*``), Spark-first:

- dims are projections (column-pruned scans, no shuffle);
- the flat table is the one-shuffle dynamic pivot (operators/flatten.py);
- facts are joins+aggregates with small dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from openmrs_module_mamba_etl_spark.operators.flatten import (
    EVENTS_AS_OBS_SPEC,
    flatten,
)
from openmrs_module_mamba_etl_spark.plans.pipeline import (
    MambaPipeline,
    PipelineContext,
)
from openmrs_module_mamba_etl_spark.sources.parquet import table

PIPELINE = MambaPipeline()

#: FlattenSpec for events-as-obs: one wide row per user, one column per
#: event_type, latest value wins (reference flat-table semantics,
#: README.md:8-12).
EVENTS_AS_OBS = EVENTS_AS_OBS_SPEC


@PIPELINE.register("mamba_dim_person")
def dim_person(spark: SparkSession, ctx: PipelineContext) -> DataFrame:
    """customer → person dim (reference: mamba_dim_person, README.md:296)."""
    return table(spark, ctx.sf_dir, "customer").select(
        F.col("c_custkey").alias("person_id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_id"),
    )


@PIPELINE.register("mamba_dim_encounter_type")
def dim_encounter_type(spark: SparkSession, ctx: PipelineContext) -> DataFrame:
    """nation⋈region → encounter-type dim (reference: README.md:313)."""
    nation = table(spark, ctx.sf_dir, "nation")
    region = table(spark, ctx.sf_dir, "region")
    return nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        F.col("n_nationkey").alias("encounter_type_id"),
        F.col("n_name").alias("name"),
        F.col("r_name").alias("category"),
    )


@PIPELINE.register("mamba_dim_encounter")
def dim_encounter(spark: SparkSession, ctx: PipelineContext) -> DataFrame:
    """orders → encounter dim (reference: mamba_dim_encounter, README.md:313)."""
    return table(spark, ctx.sf_dir, "orders").select(
        F.col("o_orderkey").alias("encounter_id"),
        F.col("o_custkey").alias("person_id"),
        F.col("o_orderdate").alias("encounter_datetime"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total"),
    )


#: Columns the registered reports reference by name (the reference's JSON
#: column-config contract): they must exist in the flat table even on a day
#: with zero events, or report SQL fails UNRESOLVED_COLUMN on an empty
#: increment instead of returning an empty result.
REPORT_CONTRACT_ATTRS = ("purchase",)


@PIPELINE.register("mamba_flat_user_activity")
def flat_user_activity(spark: SparkSession, ctx: PipelineContext) -> DataFrame:
    """events (EAV long) → wide per-user table via the dynamic pivot (the
    ``mamba_flat_encounter_<type>`` analog — reference: README.md:252-253).
    Discovered attributes are unioned with the report-contract columns so
    the schema is stable under empty/partial input."""
    from openmrs_module_mamba_etl_spark.operators.flatten import discover_attrs

    ev = table(spark, ctx.sf_dir, "events")
    attrs = sorted(set(discover_attrs(ev, EVENTS_AS_OBS)) | set(REPORT_CONTRACT_ATTRS))
    return flatten(ev, EVENTS_AS_OBS, attrs=attrs)


@PIPELINE.register("mamba_fact_order_totals")
def fact_order_totals(spark: SparkSession, ctx: PipelineContext) -> DataFrame:
    """Derived fact: per-person order rollup (the ``mamba_fact_*`` analog —
    reference: README.md:321,255-256). Dim side broadcast, single shuffle."""
    enc = ctx.tables["mamba_dim_encounter"]
    person = ctx.tables["mamba_dim_person"]
    return (
        enc.groupBy("person_id")
        .agg(
            F.count(F.lit(1)).alias("n_encounters"),
            F.round(F.sum("total"), 2).alias("total_amount"),
            F.max("encounter_datetime").alias("last_encounter"),
        )
        .join(F.broadcast(person.select("person_id", "segment")), "person_id")
    )


def run_clinical_pipeline(
    spark: SparkSession, sf_dir: str, incremental: bool = False
) -> PipelineContext:
    return PIPELINE.run(spark, sf_dir, incremental=incremental)
