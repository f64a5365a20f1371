#!/usr/bin/env python
"""Scale-stress harness: run heavy operators on K× multiplied data.

sf0.1 is the largest driver-provided scale. This harness manufactures a
K× corpus from it (replicas with shifted ids; document text perturbed with
a replica tag so near-duplicate DENSITY stays constant instead of
exploding quadratically across replicas), materializes it as a synthetic
sf directory of parquet files, and times the registered heavy queries at
1× and K×. The wall-clock ratio vs K is the scaling evidence: contracted-
intermediate shapes should stay well under linear (fixed costs amortize);
anything super-linear flags a pair-space or partition-strategy problem
before a real cluster finds it.

Run: ``python tools/scale_stress.py [K]`` (default 8). Prints one JSON
line per query and a summary table. Multiplied tables: documents,
embeddings, lineitem, orders, events; dimension tables are copied 1×
(dims don't grow with corpus size at 100 TB either).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: tables that grow with the corpus; everything else is dimension-like.
FACTS = ["documents", "embeddings", "lineitem", "orders", "events"]
DIMS = ["region", "nation", "customer", "supplier", "part"]

#: sf0.1 demo occupancy: 2000 embeddings / 16 IVF cells. The production
#: arm below holds this PER-CELL occupancy constant as the corpus grows.
TARGET_CELL_ROWS = 125


def _dedup_semantic_prod(spark, d: str):
    """dedup_semantic at its PRODUCTION operating point (round-8 verdict
    task 7): τ=0.95 (the documented production default — above the 0.9
    decorrelation gate, so replicas contribute no cross pairs) and the
    cell-count knob scaled to hold per-cell occupancy constant
    (``n_cells = N / TARGET_CELL_ROWS``), which makes the in-cell pair
    space Σ|cell|² grow LINEARLY with the corpus instead of the demo
    row's fixed-16-cells K² growth. The registry's `dedup_semantic` demo
    row is retained unchanged; this arm exists so the stress table shows
    the scale-safe knob setting alongside the demo artifact."""
    from openmrs_module_mamba_etl_spark.llm.dedup import semantic_dedup
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    emb = table(spark, d, "embeddings")
    n_cells = max(16, emb.count() // TARGET_CELL_ROWS)
    # FAISS-style sample bound: quantizer training cost follows CELLS,
    # not corpus rows (50 points per centroid is ample for a coarse
    # quantizer); without it the full-corpus sort+collect inside
    # ivf_train dominated the prod arm's 8x wall.
    return semantic_dedup(
        emb, "vec_id", "embedding", n_cells=n_cells, threshold=0.95,
        max_sample=50 * n_cells,
    )


#: heavy/shuffle-bound queries worth stressing, with the facts they read.
#: Entries are registry key names, or (label, fn) for parameterized arms.
STRESSED = [
    "dedup_token_jaccard",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_semantic",
    ("dedup_semantic_prod", _dedup_semantic_prod),
    "etl_llm_corpus",
    "agg_group_by",
    "tpch_q9",
    "window_sessionize",
    "eval_auc",
    "agg_hdr_histogram",
]

#: id-shift must clear every real id domain (max doc_id/orderkey ≪ 1e12).
OFFSET = 10**12


def build_stress_dir(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.inventory.sink_queries import (
        _scratch_root,
    )
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    out = str(_scratch_root() / f"sfstress_x{k}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    id_cols = {
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id"],
    }
    for t in FACTS:
        df = table(spark, BASE, t)
        reps = []
        for i in range(k):
            r = df
            for c in id_cols[t]:
                r = r.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            if t == "events" and i > 0:
                # shift the session key so replicas are new users, keeping
                # per-user event volume (and session pair space) constant
                r = r.withColumn("user_id", F.col("user_id") + F.lit(i * OFFSET))
            if t == "documents" and i > 0:
                # Keep near-dup density CONSTANT across replicas. A mere
                # document-level suffix is NOT enough: token/shingle Jaccard
                # between a text and text+" tag" is ≈1, so replicas of one
                # doc stay genuine near-duplicates and the TRUE pair space
                # grows K² — the first run measured exactly that (ratio
                # 14.5 at K=8 for dedup_token_jaccard). Suffixing EVERY
                # whitespace token makes cross-replica token sets disjoint
                # (Jaccard 0) UNDER THE DEDUP FAMILY'S TOKENIZER — the
                # lowercased whitespace split of functions/similarity.py
                # tokens(), which every stressed pair generator (token/
                # shingle Jaccard, MinHash bands, clusters) builds on —
                # while each replica's internal similarity structure is
                # preserved verbatim. Char-level analyzers (langid
                # n-grams, the BPE-ish counter) do still see shared
                # substrings, but none of them generate pairs, so the
                # pair-space invariant is unaffected; main() MEASURES the
                # invariant below (cross_replica_pairs) instead of
                # trusting this comment.
                r = r.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", "$1" + f"zq{i}"),
                )
            if t == "embeddings" and i > 0:
                # Same constant-density rule for vectors: identical copies
                # would make cross-replica cosine 1.0 and blow up in-cell
                # pair spaces quadratically. Rolling every replica-i vector
                # by i positions preserves norms and all WITHIN-replica
                # pairwise dot products exactly, while cross-replica pairs
                # see relatively-rotated (decorrelated) vectors.
                dim = 64
                r = r.withColumn(
                    "embedding",
                    F.concat(
                        F.slice("embedding", i + 1, dim - i),
                        F.slice("embedding", 1, i),
                    ),
                )
            reps.append(r)
        u = reps[0]
        for r in reps[1:]:
            u = u.unionByName(r)
        u.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in DIMS:
        # dims stay 1× — point the synthetic dir at the originals
        src = f"{BASE}/{t}.parquet"
        dst = f"{out}/{t}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return out


def check_invariants(spark, registry, stress_dir: str) -> bool:
    """Measured constant-density invariants; True = corpus is sound.

    1. The 0.9-Jaccard pair set must not contain a single cross-replica
       pair (ids land in different OFFSET blocks): a nonzero count means
       the perturbation leaked similarity across replicas and every dedup
       ratio is measuring K² pair-space inflation, not engine scaling.
    2. The per-replica vector roll must not leave cross-replica NEAR-DUP
       pairs (cosine ≥ 0.9; base corpus max pairwise cosine ≈ 0.48, so
       any hit means replicas leaked genuine duplicates). This is
       deliberately NOT checked at dedup_semantic's demo τ=0.35: that
       threshold sits inside the random-cosine band of these vectors, so
       a correctly-decorrelated K× corpus still has ~K² pairs above it at
       the BASE pair rate (measured at K=8: cross-replica 0.35-pairs ≈
       0.21% of the 112M cross candidate pairs — the same rate as
       within-replica pairs). The 0.9 gate is what excludes the artifact.

    Runs AFTER the measurement loop (round 9): the brute-force cosine
    sweep (~128M pairs at K=8) leaves the shared local-mode JVM with
    enough heap/GC debris that a big-shuffle query measured afterwards
    in the same session reads ~3× slower (measured: dedup_token_jaccard
    at 8× = 17 s on a clean session, 44-47 s after this pre-pass —
    clearCache does not undo it). Ordering measurements first keeps them
    clean; a failed invariant still voids the run loudly (error JSON +
    exit 1) before the summary is trusted.
    """
    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.llm.dedup import embedding_cosine_pairs
    from openmrs_module_mamba_etl_spark.sources.parquet import table as _table

    pairs = registry.QUERIES["dedup_token_jaccard"](spark, stress_dir)
    n_cross = pairs.where(
        F.expr(f"id_a div {OFFSET}") != F.expr(f"id_b div {OFFSET}")
    ).count()
    print(json.dumps({"cross_replica_pairs": n_cross}), flush=True)
    if n_cross:
        print(json.dumps({"error": "replica perturbation leaked pairs"}))
        return False
    epairs = embedding_cosine_pairs(
        _table(spark, stress_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=0.9,
        brute_force=True,
    )
    n_cross_emb = epairs.where(
        F.expr(f"id_a div {OFFSET}") != F.expr(f"id_b div {OFFSET}")
    ).count()
    print(json.dumps({"cross_replica_neardup_vecs": n_cross_emb}), flush=True)
    if n_cross_emb:
        print(json.dumps({"error": "vector roll leaked near-dup pairs"}))
        return False
    spark.catalog.clearCache()
    return True


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    from openmrs_module_mamba_etl_spark import registry
    from openmrs_module_mamba_etl_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="scale-stress")

    print(json.dumps({"building": f"{k}x stress dir from {BASE}"}), flush=True)
    t0 = time.monotonic()
    stress_dir = build_stress_dir(spark, k)
    print(
        json.dumps({"built": stress_dir, "sec": round(time.monotonic() - t0, 1)}),
        flush=True,
    )

    rows = []
    for entry in STRESSED:
        if isinstance(entry, str):
            name, fn = entry, registry.QUERIES[entry]
        else:
            name, fn = entry
        rec = {"key": name}
        try:
            # min-of-2 on BOTH arms: the stress arm was single-rep, which
            # folded Python-worker / PPJoin warm-up into the 8× number
            # only (measured on dedup_semantic_prod: cold 1.95 s vs warm
            # 1.33 s at 8×) — ratios must compare matched-warmth walls,
            # not a warm base against a cold stress
            for label, d, nrep in (("base", BASE, 2), ("stress", stress_dir, 2)):
                # also isolate base from stress WITHIN a query: the base
                # pass's persisted 1x frames must not squeeze memory during
                # the 8x measurement (same mechanism as the pre-pass note)
                spark.catalog.clearCache()
                best = float("inf")
                for _ in range(nrep):
                    t0 = time.monotonic()
                    fn(spark, d).write.format("noop").mode("overwrite").save()
                    best = min(best, time.monotonic() - t0)
                rec[label] = round(best, 3)
            rec["ratio"] = round(rec["stress"] / rec["base"], 2)
            rec["k"] = k
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
        spark.catalog.clearCache()  # isolate measurements (see above)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    invariants_ok = check_invariants(spark, registry, stress_dir)

    ok = [r for r in rows if "ratio" in r]
    print(
        json.dumps(
            {
                "summary": {
                    "k": k,
                    "queries": len(rows),
                    "errors": [r["key"] for r in rows if "error" in r],
                    "superlinear": [
                        r["key"] for r in ok if r["ratio"] > k
                    ],
                    "max_ratio": max((r["ratio"] for r in ok), default=None),
                }
            }
        )
    )
    shutil.rmtree(stress_dir, ignore_errors=True)
    return 0 if invariants_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
