#!/usr/bin/env python
"""End-to-end training-data curation walkthrough.

The 100 TB pipeline story, composed from the engine's operators at demo
scale: quality-filter → near-dup dedup (MinHash-LSH + transitive
clusters) → benchmark decontamination → deterministic split → leakage
audit → pack → shard export. Every stage is one of the registered,
oracle-checked operators; this script shows they compose.

Run: ``python examples/run_curation.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.llm.curation import decontaminate
from openmrs_module_mamba_etl_spark.llm.dedup import (
    duplicate_clusters,
    minhash_lsh_pairs,
)
from openmrs_module_mamba_etl_spark.llm.sampling import hash_bucket, hash_split
from openmrs_module_mamba_etl_spark.functions.text import quality_score
from openmrs_module_mamba_etl_spark.session import get_spark
from openmrs_module_mamba_etl_spark.sources.parquet import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="mamba-curation-example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    n0 = docs.count()

    # 1. quality gate (codegen-side score, no Python)
    scored = docs.withColumn("q", quality_score(F.col("text")))
    kept = scored.where(F.col("q") >= 0.8)  # synthetic docs are clean; 0.8 exercises the gate
    n1 = kept.count()

    # 2. near-dup dedup: LSH pairs → transitive clusters → keep min id
    pairs = minhash_lsh_pairs(
        kept, "doc_id", "text", num_hashes=16, bands=4, shingle_len=3,
        verify_threshold=0.5, portable=True,
    )
    clusters = duplicate_clusters(pairs)
    dropped = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    deduped = kept.join(dropped, "doc_id", "left_anti")
    n2 = deduped.count()

    # 3. decontamination vs a benchmark slice (here: every 50th doc
    #    stands in for the eval suite)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    tainted = decontaminate(deduped, bench, "doc_id", "text", n=5)
    clean = deduped.join(tainted.select("doc_id"), "doc_id", "left_anti")
    n3 = clean.count()

    # 4. deterministic split + shard assignment
    split = hash_split(
        clean, "doc_id", [("train", 900), ("valid", 950), ("test", 1000)]
    ).withColumn("shard", hash_bucket(F.col("doc_id"), 16))
    per_split = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()
    }

    print(f"documents:        {n0}")
    print(f"after quality:    {n1}  (-{n0 - n1})")
    print(f"after dedup:      {n2}  (-{n1 - n2})")
    print(f"after decontam:   {n3}  (-{n2 - n3})")
    print(f"splits:           {per_split}")

    # 5. shard export (training layout) — written partitioned by split/shard
    out = os.path.join("_scratch", "curation_export")
    (
        split.select("doc_id", "text", "split", "shard")
        .write.mode("overwrite")
        .partitionBy("split", "shard")
        .parquet(out)
    )
    n_files = sum(len(fs) for _, _, fs in os.walk(out))
    print(f"exported to {out} ({n_files} files)")
    spark.stop()


if __name__ == "__main__":
    main()
