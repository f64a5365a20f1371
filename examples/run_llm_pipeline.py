#!/usr/bin/env python
"""Training-data pipeline demo: profile → curate → cluster → decontaminate
→ repetition-filter → mixture → split → pack → search → semantic dedup
→ incremental ingest.

The §2.I story end-to-end on testdata: health-check the corpus, filter to
quality dedup survivors, close near-dup pairs into transitive clusters,
scrub benchmark overlap, drop repetitive docs, rebalance sources, cut the
deterministic train/valid/test split, pack into 2048-token chunks, then
run IVF ANN over the embedding table.

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

    # 4. decontaminate: drop anything sharing a 5-gram with the "eval
    #    suite" (src9 stands in); benchmark shingles broadcast
    from openmrs_module_mamba_etl_spark.llm.curation import (
        decontaminate,
        repetition_stats,
    )

    corpus = docs.where(F.col("source") != "src9")
    tainted = decontaminate(
        corpus, docs.where(F.col("source") == "src9"), "doc_id", "text", n=5
    )
    clean = corpus.join(F.broadcast(tainted.select("doc_id")), "doc_id", "left_anti")
    print(f"decontamination: {tainted.count()} tainted docs removed")

    # 5. repetition filter (Gopher rules)
    reps = repetition_stats(clean, "doc_id", "text")
    clean = clean.join(
        F.broadcast(reps.where(F.col("flagged")).select("doc_id")),
        "doc_id",
        "left_anti",
    )
    print(f"after repetition filter: {clean.count()} docs")

    # 6. mixture → split → pack: all md5-bucket deterministic, map-side
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens
    from openmrs_module_mamba_etl_spark.llm.sampling import (
        hash_split,
        mixture_sample,
        pack_sequences,
    )

    mixed = mixture_sample(
        clean, "doc_id", "source", {"src0": 3, "src1": 2, "src2": 1}, 60
    )
    split = hash_split(
        mixed, "doc_id", [("train", 900), ("valid", 950), ("test", 1000)]
    )
    print("-- split sizes --")
    split.groupBy("split").count().orderBy("split").show()
    packed = pack_sequences(
        split.select(
            "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tok")
        ),
        "doc_id",
        "n_tok",
        budget=2048,
        shards=8,
    )
    print(
        f"packed into {packed.select('shard', 'chunk_id').distinct().count()}"
        " (shard, chunk) context windows"
    )

    # 7. IVF ANN over the embeddings table
    emb = table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    print("-- IVF top-5 neighbors of vec 0 --")
    ivf_topk(emb, "vec_id", "embedding", qv, k=5, n_cells=8, nprobe=3).show()

    # 8. SemDeDup over the embedding space (cluster-then-dedup) and the
    #    daily-ingest shape: dedup a new batch against the standing corpus
    #    without ever shuffling the corpus
    from openmrs_module_mamba_etl_spark.llm.dedup import (
        incremental_exact_dedup,
        semantic_dedup,
    )

    kept = semantic_dedup(emb, "vec_id", "embedding", n_cells=8, threshold=0.35)
    print(f"SemDeDup keeps {kept.count()} of {emb.count()} embeddings")
    fresh = incremental_exact_dedup(
        docs.where(F.col("doc_id") % 2 == 0),   # standing corpus
        docs.where(F.col("doc_id") % 2 == 1),   # today's increment
        "doc_id",
        "text",
    )
    print(f"incremental ingest admits {fresh.count()} genuinely-new docs")

    # 9. round-4 curation additions: corpus-trained bigram-LM quality
    #    scores, PII audit counts, and First-Fit-Decreasing packing
    from openmrs_module_mamba_etl_spark.llm.curation import (
        ngram_lm_score,
        pii_redact,
    )
    from openmrs_module_mamba_etl_spark.llm.sampling import firstfit_pack

    lm = ngram_lm_score(docs, "doc_id", "text")
    print("-- lowest-perplexity docs (bigram LM) --")
    lm.orderBy(F.col("avg_logp").desc()).limit(3).show()
    audit = pii_redact(docs, "doc_id", "text")
    n_flagged = audit.where(
        (F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")) > 0
    ).count()
    print(f"PII audit flags {n_flagged} docs (synthetic corpus: expect 0)")
    bins = firstfit_pack(
        docs.select(
            "doc_id", F.size(tokens(F.col("text"))).alias("n_tok")
        ),
        "doc_id",
        "n_tok",
        capacity=256,
        n_shards=8,
    )
    n_bins = bins.select("shard", "bin_id").distinct().count()
    print(f"FFD packs {bins.count()} docs into {n_bins} 256-token bins")


if __name__ == "__main__":
    main()
