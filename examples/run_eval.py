#!/usr/bin/env python
"""Corpus release-evaluation walkthrough.

The observability pass a curation team runs BEFORE publishing a corpus,
composed from the engine's registered, oracle-checked operators:

1. per-source dataset card (docs / tokens / quality / language / dup rate)
2. language-gate evaluation (confusion matrix + exact ROC AUC)
3. classifier calibration (reliability deciles)
4. retrieval-index quality (LSH dedup precision/recall, ANN NDCG@10,
   embedding-truncation recall sweep)
5. budget-constrained selection preview (what a 800-token/source mix keeps)

Run: ``python examples/run_eval.py [sf_dir]``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from openmrs_module_mamba_etl_spark.registry import QUERIES, load_all
    from openmrs_module_mamba_etl_spark.session import get_spark

    load_all()
    spark = get_spark()

    def run(name: str, limit: int = 25) -> None:
        print(f"\n=== {name} ===")
        QUERIES[name](spark, sf_dir).show(limit, truncate=False)

    # 1. release card
    run("etl_dataset_card", 8)

    # 2. language gate: where does the heuristic disagree with labels,
    #    and does the quality score separate English at all?
    run("eval_langid_confusion")
    run("eval_auc")

    # 3. is the learned quality classifier calibrated against the gate?
    run("eval_calibration")

    # 4. index quality: dedup candidates vs truth, ANN ranking quality,
    #    and how far the embedding column can be truncated
    run("dedup_lsh_eval")
    run("eval_ndcg")
    run("emb_truncation_eval")

    # 5. what would the per-source token budget actually keep?
    run("sample_quality_budget", 10)

    spark.stop()


if __name__ == "__main__":
    main()
