#!/usr/bin/env python
"""Time individual registry queries (min-of-N, noop sink) in one session.

Usage: python tools/time_queries.py [-n REPS] query [query ...]

Same methodology as bench.py (clearCache between queries, noop sink,
min-of-N) but scoped to the queries under investigation so an A/B of a
single operator doesn't pay for the whole suite. Prints one JSON line:
{"reps": N, "queries": {...}, "canary_start": s, "canary_end": s}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openmrs_module_mamba_etl_spark import registry  # noqa: E402
from openmrs_module_mamba_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=6, help="reps per query (min-of-N)")
    ap.add_argument("--all-reps", action="store_true", help="print every rep")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry.load_all()
    spark = get_spark(app_name="mamba-time-queries")
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up + canary, as in bench.py
    registry.QUERIES["agg_count_star"](spark, sf_dir).collect()

    def canary() -> float:
        start = time.perf_counter()
        registry.QUERIES["agg_count_star"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - start, 3)

    c0 = canary()
    out: dict[str, float] = {}
    reps_out: dict[str, list[float]] = {}
    for name in args.queries:
        fn = registry.QUERIES[name]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"time: {name}")
        reps = []
        for _ in range(args.n):
            start = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.perf_counter() - start, 3))
        out[name] = min(reps)
        reps_out[name] = reps
    c1 = canary()
    res = {"reps": args.n, "queries": out, "canary_start": c0, "canary_end": c1}
    if args.all_reps:
        res["all_reps"] = reps_out
    print(json.dumps(res))


if __name__ == "__main__":
    main()
