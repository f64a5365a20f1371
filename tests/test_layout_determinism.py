"""In-suite guard for the partial-agg-order determinism class.

`tools/determinism_sweep.py` checks all registered keys under two opposing
physical layouts per round; this test keeps the CLASS guarded between
tool runs by sweeping the most rounding-sensitive keys (double
aggregates published through ROUND — the `.xx5`-boundary flap class,
seen live on etl_pretok_shards shard 7) on every `pytest` run.

Cache is cleared between layouts: a `.persist()` materialized under
layout A would otherwise be substituted into layout B's plan and make
the compare vacuous (runtime layout confs aren't part of the analyzed
plan the CacheManager matches on).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.test_oracle_parity import _canon_rows

QUERIES = entrymod.queries()

#: float-aggregate-heavy keys: ROUND over SUM/AVG of doubles, score
#: means, correlation/AUC/calibration math — where fold order bites.
SENSITIVE = [
    "agg_gini",
    "eval_auc",
    "eval_calibration",
    "etl_dataset_card",
    "etl_pretok_shards",
    "profile_correlation",
    "text_quality",
    "train_ols",
]

LAYOUT_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}
LAYOUT_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
}


def _run(spark, name, sf_dir, conf):
    spark.catalog.clearCache()
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        df = QUERIES[name](spark, sf_dir)
        return [c.lower() for c in df.columns], [tuple(r) for r in df.collect()]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.mark.parametrize("name", SENSITIVE)
def test_values_stable_across_layouts(spark, sf_dir, name):
    cols_a, rows_a = _run(spark, name, sf_dir, LAYOUT_A)
    cols_b, rows_b = _run(spark, name, sf_dir, LAYOUT_B)
    assert cols_a == cols_b
    assert len(rows_a) == len(rows_b), (
        f"{name}: row count {len(rows_a)} vs {len(rows_b)} across layouts"
    )
    ca, cb = _canon_rows(cols_a, rows_a), _canon_rows(cols_b, rows_b)
    assert ca == cb, (
        f"{name}: layout-dependent values; only_in_a="
        f"{sorted(set(ca) - set(cb))[:3]} only_in_b="
        f"{sorted(set(cb) - set(ca))[:3]}"
    )
