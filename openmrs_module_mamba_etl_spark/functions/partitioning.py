"""Scan-parallelism guard for expression-heavy per-row operators.

Several operators (signature hashing, shingling, cosine scoring) follow a
scan with CPU-bound per-row work. Small test corpora arrive as ONE parquet
file ⇒ one input partition ⇒ single-threaded execution no matter how many
cores exist, so those operators historically repartitioned to
``defaultParallelism`` unconditionally. But at 100 TB the scan already
yields thousands of splits (``spark.sql.files.maxPartitionBytes``) and an
unconditional repartition becomes a FULL-CORPUS SHUFFLE that buys nothing —
the one scale-killer class this module exists to remove (r13 optimization
round; guide §2.4 "remove shuffles outright").
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_to_cores(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition to ``defaultParallelism`` ONLY when the plan would
    otherwise run on fewer partitions than cores.

    The partition probe plans the RDD lineage without executing a job, so
    the check is driver-side and cheap relative to any query that needs
    it. When the scan already provides ≥ cores partitions the input is
    returned untouched — no exchange. Results are partitioning-invariant
    for every caller (pinned by tools/determinism_sweep.py, which runs
    each key under opposing physical layouts).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
