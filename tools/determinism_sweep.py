#!/usr/bin/env python
"""Partition-order determinism sweep over the whole registry.

The one driver-red class no static linter or single-run gate can catch:
a published value that depends on FLOAT AGGREGATION ORDER. ``ROUND(x, 2)``
over a double aggregate flaps at a .xx5 boundary when partial-agg fold
order changes (seen round-3: etl_pretok_shards shard 7, 0.98 vs 0.99 —
fixed by integer deci-point sums). The oracle gates run each query once,
so an order-dependent value that HAPPENS to match DuckDB today still
red-flags on the driver's next run with different task scheduling.

This sweep executes every registered query TWICE in one process under
deliberately different physical layouts —

  config A: spark.sql.shuffle.partitions=32, default 128 MB input splits
  config B: spark.sql.shuffle.partitions=7, 64 KB input splits (every
            parquet row group its own task → different partial-agg trees)

— and compares order-insensitive canonicalized values. Any mismatch is an
order-dependent value that WILL eventually flap on the driver.

Run: ``python tools/determinism_sweep.py [sf_dir]`` (default sf0.001 for
speed; the hazard is per-expression, not per-scale). Exit 1 on any diff.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONF_A = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.files.openCostInBytes": str(4 * 1024 * 1024),
}
CONF_B = {
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    "spark.sql.files.openCostInBytes": "0",
}


def _canon_val(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.12g}"
    if isinstance(v, datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_val(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    # The repo session, not a bare one: the claim must hold under the
    # engine config every other gate and bench actually run (AQE
    # coalesce/skew, Arrow exchange, 8g heap) — layout knobs are then
    # overridden per run below.
    from openmrs_module_mamba_etl_spark.session import get_spark

    spark = get_spark(app_name="determinism-sweep")

    import __spark_entry__ as entry

    queries = entry.queries()

    def run(name, conf):
        # clear BEFORE each run: a .persist() materialized under config A
        # would otherwise be silently substituted into config B's plan
        # (runtime layout confs aren't part of the analyzed plan the
        # CacheManager matches on), making the A/B compare vacuous for
        # everything upstream of the persist.
        spark.catalog.clearCache()
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            df = queries[name](spark, sf_dir)
            return [c.lower() for c in df.columns], [tuple(r) for r in df.collect()]
        finally:
            for k in conf:
                spark.conf.unset(k)

    fails: list[str] = []
    for name in queries:
        t0 = time.monotonic()
        rec: dict = {"key": name}
        try:
            cols_a, rows_a = run(name, CONF_A)
            cols_b, rows_b = run(name, CONF_B)
            if cols_a != cols_b:
                rec["status"] = f"column_drift {cols_a} vs {cols_b}"
            elif _canon_rows(cols_a, rows_a) != _canon_rows(cols_b, rows_b):
                # set differences, not a zip: the likeliest drift mode is a
                # threshold-boundary row present in ONE layout, where a zip
                # of the sorted lists truncates or cascades misalignment
                ca, cb = set(_canon_rows(cols_a, rows_a)), set(
                    _canon_rows(cols_b, rows_b)
                )
                rec["status"] = (
                    f"value_drift rows {len(rows_a)} vs {len(rows_b)}; "
                    f"only_in_a={sorted(ca - cb)[:3]} "
                    f"only_in_b={sorted(cb - ca)[:3]}"
                )
            else:
                rec["status"] = "ok"
                rec["rows"] = len(rows_a)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            rec["status"] = f"error {type(exc).__name__}: {exc}"[:200]
        if rec["status"] != "ok":
            fails.append(name)
        rec["sec"] = round(time.monotonic() - t0, 2)
        print(json.dumps(rec), flush=True)
        spark.catalog.clearCache()

    print(
        json.dumps(
            {"summary": {"checked": len(queries), "fails": fails, "sf_dir": sf_dir}}
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
