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

import re

from pyspark.sql import DataFrame

#: Analyzed-plan node heads that imply an exchange (or an explicit
#: repartition) somewhere below: any of these already spreads rows across
#: ``spark.sql.shuffle.partitions``, so no repartition is needed — and,
#: decisive for the probe below, converting such a plan to an RDD under
#: AQE materializes its upstream query stages (runs real jobs) just to
#: count partitions.
_WIDE_NODE = re.compile(
    r"^[\s:+\-']*(Join|Aggregate|Window|Sort|Distinct|Deduplicate|"
    r"Repartition|RepartitionByExpression|RebalancePartitions|"
    r"GlobalLimit|Intersect|Except)\b"
)


def _has_wide_node(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return any(_WIDE_NODE.match(ln) for ln in plan.splitlines())


def spread_to_cores(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition to ``defaultParallelism`` ONLY when the plan would
    otherwise run on fewer partitions than cores.

    Intended input: a scan/projection/filter frame (every in-tree caller
    passes one) — for those, planning the RDD lineage to read its
    partition count is driver-side and runs no job. A frame that already
    contains a wide node (join/aggregate/window/sort/repartition/...) is
    returned untouched instead of probed: its shuffle already spreads
    rows across ``spark.sql.shuffle.partitions``, and under AQE the
    ``df.rdd`` probe itself would materialize the upstream query stages —
    eagerly running jobs at expression-build time (r14, ADVICE item).
    """
    if _has_wide_node(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    if key_cols:
        return df.repartition(target, *key_cols)
    return df.repartition(target)
