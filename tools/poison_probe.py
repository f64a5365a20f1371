#!/usr/bin/env python
"""Bounded root-cause probe for the same-session "JVM poisoning" effect
(round-9 verdict task 3; docs/SCALE_STRESS.md round-9 section).

Measured r9 symptom: after a ~128M-pair brute-force cosine sweep, a
big-shuffle query (dedup_token_jaccard at 8×) in the SAME local-mode
session reads ~3× slower — 17 s clean vs 44–47 s post-sweep — and
``spark.catalog.clearCache()`` does not undo it.

Protocol (one session, one JSON line per step):

1. build the 8× stress corpus (same builder as tools/scale_stress.py);
2. measure token-jaccard 8× clean (min-of-2, clearCache between reps —
   the harness protocol);
3. run the poisoner: the brute-force cosine invariant sweep;
4. re-measure (the poisoned number);
5. apply mitigations cumulatively, re-measuring after each:
   a. clearCache + unpersist every persistent RDD (blocking) — the
      localCheckpoint-debris hypothesis;
   b. driver-triggered ``System.gc()`` ×2 — the ContextCleaner
      hypothesis: Spark cleans shuffle files/broadcast state only when
      the owning JVM objects are garbage-collected (weak-ref queue), so
      a heap that never GCs old-gen keeps every dead shuffle registered;
      ``spark.cleaner.periodicGC.interval`` (default 30min) exists
      precisely to force this on long-lived sessions.

Diagnostics captured at every step: JVM heap used, persistent-RDD
count, block-manager memory used, and on-disk shuffle/block file
count+bytes under this session's blockmgr dirs.

Run: ``python tools/poison_probe.py [K]`` (default 8). ~10 min at K=8.

``--timer-only [interval_sec]`` (round-10 verdict task 3) verifies the
SHIPPED mitigation end-to-end instead of the forced-GC proof: the session
starts with ``spark.cleaner.periodicGC.interval`` lowered to
``interval_sec`` (default 60 s; production ships 5 min — the lowered
interval only compresses the wait, the mechanism under test is identical),
and after the poisoned measurement the probe applies NO explicit
mitigation — no clearCache, no unpersist, no ``System.gc()`` — it just
waits past one timer period, polling the block-manager diagnostics, then
re-measures. A restored number here is the timer ALONE doing the work.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import argparse

_parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
_parser.add_argument("k", nargs="?", type=int, default=8)
_parser.add_argument(
    "--timer-only",
    nargs="?",
    const=60,
    type=int,
    default=None,
    metavar="INTERVAL_SEC",
    help="verify the shipped periodic-GC mitigation with no explicit "
    "mitigation: lower the timer to INTERVAL_SEC (default 60) and wait",
)
_cli = _parser.parse_args()
K = _cli.k
TIMER_ONLY = _cli.timer_only is not None
TIMER_SEC = _cli.timer_only if TIMER_ONLY else 60


def _block_dirs(spark) -> list[Path]:
    """This session's block-manager local dirs (shuffle + block files)."""
    try:
        dbm = (
            spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
            .blockManager()
            .diskBlockManager()
        )
        dirs = dbm.localDirs()
        return [Path(str(dirs[i])) for i in range(len(dirs))]
    except Exception:
        return []


def diag(spark) -> dict:
    out: dict = {}
    jvm = spark.sparkContext._jvm
    try:
        rt = jvm.java.lang.Runtime.getRuntime()
        out["heap_used_mb"] = round(
            (rt.totalMemory() - rt.freeMemory()) / 1e6
        )
    except Exception:
        out["heap_used_mb"] = None
    try:
        out["persistent_rdds"] = (
            spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        )
    except Exception:
        out["persistent_rdds"] = None
    try:
        mem = jvm.org.apache.spark.SparkEnv.get().blockManager().memoryStore()
        out["memstore_mb"] = round(mem.memoryUsed() / 1e6)
    except Exception:
        out["memstore_mb"] = None
    files = 0
    size = 0
    for d in _block_dirs(spark):
        for f in d.rglob("*"):
            if f.is_file():
                files += 1
                try:
                    size += f.stat().st_size
                except OSError:
                    pass
    out["block_files"] = files
    out["block_mb"] = round(size / 1e6)
    return out


def measure(spark, fn, stress_dir: str, reps: int = 2) -> float:
    """The scale_stress measurement protocol: min-of-N, clearCache first."""
    best = float("inf")
    for _ in range(reps):
        spark.catalog.clearCache()
        t0 = time.monotonic()
        fn(spark, stress_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def unpersist_all(spark) -> int:
    """Blocking-unpersist every persistent RDD (incl. localCheckpoints).

    Goes through the JavaSparkContext's ``getPersistentRDDs`` (a
    ``java.util.Map``) — the scala ``Map.iterator()`` path used first
    returned an empty iterator through py4j and silently unpersisted
    nothing."""
    n = 0
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        print(
            json.dumps({"persistent_rdd_map_size": jmap.size()}), flush=True
        )
        for jrdd in list(jmap.values()):
            jrdd.unpersist(True)
            n += 1
    except Exception as exc:
        print(json.dumps({"unpersist_error": str(exc)[:120]}), flush=True)
    return n


def main() -> int:
    from openmrs_module_mamba_etl_spark import registry
    from openmrs_module_mamba_etl_spark.llm.dedup import embedding_cosine_pairs
    from openmrs_module_mamba_etl_spark.session import get_spark
    from openmrs_module_mamba_etl_spark.sources.parquet import table
    from tools.scale_stress import build_stress_dir

    registry.load_all()
    extra = (
        {"spark.cleaner.periodicGC.interval": f"{TIMER_SEC}s"}
        if TIMER_ONLY
        else None
    )
    spark = get_spark(app_name="poison-probe", extra_conf=extra)
    step = lambda name, **kw: print(  # noqa: E731 — one-liner logger
        json.dumps({"step": name, **kw, **diag(spark)}), flush=True
    )

    t0 = time.monotonic()
    stress_dir = build_stress_dir(spark, K)
    step("built", k=K, sec=round(time.monotonic() - t0, 1))

    jac = registry.QUERIES["dedup_token_jaccard"]
    clean = measure(spark, jac, stress_dir)
    step("clean_measure", token_jaccard_sec=clean)

    # ---- the poisoner: replicate the r9 conditions faithfully ----------
    # The r9 symptom arose in the PRE-fix scale_stress order: the full
    # 11-query measurement loop, THEN check_invariants (the PPJoin
    # token-jaccard pair count + the brute-force cosine sweep), THEN a
    # re-measure. A cosine-only sweep (first probe revision) measured
    # ratio 0.94 — no poisoning — so the heavy-loop + invariant
    # combination is the poisoner under test here.
    from tools.scale_stress import STRESSED

    t0 = time.monotonic()
    for entry in STRESSED:
        qname, fn = (
            (entry, registry.QUERIES[entry])
            if isinstance(entry, str)
            else entry
        )
        try:
            spark.catalog.clearCache()
            fn(spark, stress_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:
            print(
                json.dumps({"loop_error": qname, "err": str(exc)[:100]}),
                flush=True,
            )
    step("heavy_loop", sec=round(time.monotonic() - t0, 1))

    t0 = time.monotonic()
    from pyspark.sql import functions as F
    from tools.scale_stress import OFFSET

    pairs = jac(spark, stress_dir)
    n_cross = pairs.where(
        F.expr(f"id_a div {OFFSET}") != F.expr(f"id_b div {OFFSET}")
    ).count()
    n = (
        embedding_cosine_pairs(
            table(spark, stress_dir, "embeddings"),
            "vec_id",
            "embedding",
            threshold=0.9,
            brute_force=True,
        )
        .where(F.expr(f"id_a div {OFFSET}") != F.expr(f"id_b div {OFFSET}"))
        .count()
    )
    step(
        "poison_sweep",
        cross_pairs=n_cross,
        neardup_vecs=n,
        sec=round(time.monotonic() - t0, 1),
    )

    poisoned = measure(spark, jac, stress_dir)
    step("poisoned_measure", token_jaccard_sec=poisoned)

    if TIMER_ONLY:
        # ---- no explicit mitigation: wait out the periodic-GC timer -----
        # ContextCleaner's periodicGCService fires System.gc() every
        # TIMER_SEC from session start; waiting 1 period + slack after the
        # poisoned measure guarantees at least one tick lands in between.
        wait_start = time.monotonic()
        deadline = wait_start + TIMER_SEC + 30
        while time.monotonic() < deadline:
            time.sleep(15)
            step("timer_wait", waited_sec=round(time.monotonic() - wait_start))
        after_timer = measure(spark, jac, stress_dir)
        step("after_timer_only", token_jaccard_sec=after_timer)
        print(
            json.dumps(
                {
                    "summary": {
                        "k": K,
                        "mode": "timer-only",
                        "timer_interval_sec": TIMER_SEC,
                        "clean": clean,
                        "poisoned": poisoned,
                        "after_timer_only": after_timer,
                        "poison_ratio": round(poisoned / clean, 2),
                        "timer_restores": after_timer < clean * 1.3,
                    }
                }
            ),
            flush=True,
        )
        import shutil

        shutil.rmtree(stress_dir, ignore_errors=True)
        return 0

    # ---- mitigation a: clearCache + unpersist-all --------------------------
    spark.catalog.clearCache()
    n_unp = unpersist_all(spark)
    after_unpersist = measure(spark, jac, stress_dir)
    step(
        "after_clearcache_unpersist",
        unpersisted=n_unp,
        token_jaccard_sec=after_unpersist,
    )

    # ---- mitigation b: driver-triggered full GC (the periodicGC path) -----
    jvm = spark.sparkContext._jvm
    for _ in range(2):
        jvm.System.gc()
        time.sleep(2)  # let ContextCleaner drain its weak-ref queue
    after_gc = measure(spark, jac, stress_dir)
    step("after_system_gc", token_jaccard_sec=after_gc)

    print(
        json.dumps(
            {
                "summary": {
                    "k": K,
                    "clean": clean,
                    "poisoned": poisoned,
                    "after_clearcache_unpersist": after_unpersist,
                    "after_system_gc": after_gc,
                    "poison_ratio": round(poisoned / clean, 2),
                    "gc_restores": after_gc < clean * 1.3,
                }
            }
        ),
        flush=True,
    )
    import shutil

    shutil.rmtree(stress_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
