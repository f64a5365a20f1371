"""SparkSession factory with scale-aware defaults.

The reference delegates all execution to a single MySQL server
(reference: README.md:31, api/src/main/resources/mamba/mamba_main.sql:1-14).
Here the execution engine is Spark: AQE handles runtime re-planning
(partition coalescing, skew joins), Arrow accelerates any Python exchange,
and the session timezone is pinned to UTC so timestamp semantics are stable
across drivers, executors, and the DuckDB correctness oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for correctness + 100 TB-mindset scale behavior.
#: - AQE on: runtime shuffle-partition coalescing, skew-join splitting,
#:   dynamic join-strategy switching (broadcast small sides discovered late).
#: - Arrow on: every toPandas()/pandas_udf exchange is columnar-batched.
#: - UTC session tz: deterministic timestamp arithmetic everywhere.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.mergeSchema": "false",
    # testdata events.parquet carries TIMESTAMP(NANOS); int64-ns read keeps
    # full ordering precision (sources.parquet.table() also sets this at
    # runtime for externally created sessions).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # At 100 TB this is sized per-cluster; locally keep partitions ≈ cores so
    # small-SF shuffles don't fragment into thousands of empty tasks.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # Shuffle/broadcast cleanup is GC-DRIVEN (ContextCleaner holds weak
    # refs; dead shuffles stay registered until the owning JVM objects are
    # collected). A long-lived session running many heavies accumulates
    # block-manager debris that inflates later big-shuffle queries —
    # measured by tools/poison_probe.py at 8×: token-jaccard 17.8 s clean
    # → 20.4 s after the full stress loop + invariant sweep, restored to
    # 17.9 s by two driver-triggered System.gc() calls (memstore 534→147
    # MB, block files 864→216). Lowering the periodic-GC interval from
    # the 30 min default makes long sessions self-heal; short sessions
    # (tests, bench ≈ 4 min) never reach the timer, so it costs nothing.
    "spark.cleaner.periodicGC.interval": "5min",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    # Joins: let the planner pick shuffled-hash over sort-merge when the
    # per-partition build side fits (guide-recommended baseline; strategy
    # choice never changes values). The AQE threshold additionally
    # rewrites an already-planned sort-merge to shuffled-hash at runtime
    # when every post-shuffle partition is under it — r13 same-session
    # A/B: no query slower, shuffle-join paths (dedup_semantic, tpch_q9,
    # join_asof) equal-or-faster. Parameterized: at cluster scale size it
    # to executor memory / cores (a build partition must fit in memory).
    # The static preference is env-gated like its AQE threshold sibling
    # (r14, ADVICE): a deployment whose stats misestimate build sides can
    # restore sort-merge (which spills; a static-planned SHJ build map
    # cannot) with SPARK_GRAFT_PREFER_SMJ=true and keep the runtime AQE
    # rewrite, which decides from true sizes.
    "spark.sql.join.preferSortMergeJoin": os.environ.get(
        "SPARK_GRAFT_PREFER_SMJ", "false"
    ),
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": os.environ.get(
        "SPARK_GRAFT_SHJ_LOCAL_MAP_THRESHOLD", "64MB"
    ),
    # Scan split size: at 100 TB bigger sequential splits cut task count
    # and the M in the M×R shuffle-block product (guide §2.2/§6); locally
    # every table is one small file so the default changes nothing —
    # parameterized rather than hard-coded so the bench stays comparable.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"
    ),
}


def get_spark(
    app_name: str = "mamba-etl-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test/bench
    environment; on a real cluster callers pass ``yarn``/``k8s://...`` or let
    spark-submit inject it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
