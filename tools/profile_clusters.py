"""Stage-level profile of dedup_clusters at sf0.1 (round-6 verdict task 4).

Splits the query's wall into: pair generation (token-Jaccard posting-list
join), edge symmetrization + checkpoint, and the min-label propagation loop
(per-round wall). Prints one JSON line per repetition.

Usage: python tools/profile_clusters.py [n_reps] [sf_dir]
(sf_dir defaults to sf0.1; pass a scale_stress-built directory to
profile the 8× corpus — the same positional-arg convention as
determinism_sweep.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    global SF_DIR
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if len(sys.argv) > 2:
        SF_DIR = sys.argv[2]
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from openmrs_module_mamba_etl_spark.llm import dedup as dd
    from openmrs_module_mamba_etl_spark.llm.dedup import token_jaccard_pairs
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    # warm the session (JVM + codegen + parquet footer caches)
    table(spark, SF_DIR, "documents").count()

    for rep in range(reps):
        spark.catalog.clearCache()
        out: dict = {"rep": rep}

        t0 = time.perf_counter()
        pairs = token_jaccard_pairs(
            table(spark, SF_DIR, "documents"), "doc_id", "text", threshold=0.9
        ).localCheckpoint()
        n_pairs = pairs.count()
        out["pairs_sec"] = round(time.perf_counter() - t0, 3)
        out["n_pairs"] = n_pairs

        t0 = time.perf_counter()
        # the production bootstrap itself, so the profile can't drift from
        # what duplicate_clusters actually runs
        edges, labels = dd._cc_bootstrap(pairs, "id_a", "id_b")
        n_nodes = labels.count()
        out["edges_sec"] = round(time.perf_counter() - t0, 3)
        out["n_nodes"] = n_nodes

        # mirror duplicate_clusters' size-based branch (same default
        # threshold, read off the signature so they can't drift): a
        # profile that hard-coded F.broadcast would silently mismeasure
        # any corpus whose dup-node set exceeds broadcast range, where
        # production runs the shuffle path over dst-partitioned edges
        import inspect

        broadcast_max_nodes = inspect.signature(
            dd.duplicate_clusters
        ).parameters["broadcast_max_nodes"].default
        if n_nodes <= broadcast_max_nodes:
            maybe_broadcast = F.broadcast
            out["propagation_path"] = "broadcast"
        else:
            def maybe_broadcast(df):
                return df
            edges = edges.repartition("dst").localCheckpoint()
            out["propagation_path"] = "shuffle"

        rounds = []
        t_loop = time.perf_counter()
        for it in range(20):
            t0 = time.perf_counter()
            new_labels = dd._propagation_round(
                edges, labels, maybe_broadcast
            ).localCheckpoint()
            changed = (
                new_labels.where(F.col("label") != F.col("old_label"))
                .limit(1)
                .count()
            )
            rounds.append(round(time.perf_counter() - t0, 3))
            labels = new_labels.select("node", "label")
            if changed == 0:
                break
        out["loop_sec"] = round(time.perf_counter() - t_loop, 3)
        out["rounds"] = rounds

        t0 = time.perf_counter()
        labels.count()
        out["final_collect_sec"] = round(time.perf_counter() - t0, 3)
        out["total_sec"] = round(
            out["pairs_sec"] + out["edges_sec"] + out["loop_sec"], 3
        )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
