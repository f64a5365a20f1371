#!/usr/bin/env python
"""Training-data pipeline demo: profile → curate → cluster → search.

The §2.I story end-to-end on testdata: health-check the corpus, filter to
quality dedup survivors, close near-dup pairs into transitive clusters,
then run IVF ANN over the embedding table.

    python examples/run_llm_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark import get_spark
from openmrs_module_mamba_etl_spark.functions import text as T
from openmrs_module_mamba_etl_spark.llm.ann import ivf_topk
from openmrs_module_mamba_etl_spark.llm.dedup import (
    duplicate_clusters,
    exact_dedup,
    token_jaccard_pairs,
)
from openmrs_module_mamba_etl_spark.operators.profile import profile_table
from openmrs_module_mamba_etl_spark.sources.parquet import table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="mamba-llm-demo")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")

    # 1. health check
    print("-- corpus profile --")
    profile_table(docs).show(truncate=False)

    # 2. curate: exact-dedup survivors that clear the quality gate
    survivors = exact_dedup(docs, "doc_id", "text").select(
        F.col("kept_id").alias("doc_id")
    )
    curated = (
        docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))
        .where(F.col("quality") >= 0.7)
        .join(F.broadcast(survivors), "doc_id", "left_semi")
    )
    print(f"curated: {curated.count()} of {docs.count()} docs survive")

    # 3. transitive near-dup clusters over 0.9-Jaccard pairs
    pairs = token_jaccard_pairs(docs, "doc_id", "text", threshold=0.9)
    clusters = duplicate_clusters(pairs)
    n_members = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(f"near-dup graph: {n_members} docs collapse into {n_clusters} clusters")

    # 4. IVF ANN over the embeddings table
    emb = table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    print("-- IVF top-5 neighbors of vec 0 --")
    ivf_topk(emb, "vec_id", "embedding", qv, k=5, n_cells=8, nprobe=3).show()


if __name__ == "__main__":
    main()
