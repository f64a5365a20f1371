"""Meta plan audit: no registered query may plan a scale-hostile join.

CartesianProduct is always a bug. BroadcastNestedLoopJoin is allowed only
for the two intentional brute-force baselines (theta self-joins whose
scalable variants exist alongside them). A new query that trips this test
needs an equi-join key, a broadcast hint, or an LSH/bucketing pre-pass —
not a whitelist entry.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

#: intentional brute-force baselines (explicit broadcast, small side by contract)
BNLJ_ALLOWED = {
    "ann_knn_join",
    "dedup_embedding_cosine",
    "join_theta",
    # recall evaluation NEEDS exact brute-force ground truth over the
    # handful of eval queries — the deliberate baseline the LSH/IVF side
    # is being measured against, bounded by the eval-query count.
    "ann_recall_eval",
    "ann_recall_eval_ivf",
    # Scalar-subquery shape: the broadcast side is a single aggregate row
    # (histogram bounds / corpus token total / q22 avg balance), so the
    # "nested loop" degenerates to one comparison per probe row — O(N),
    # the canonical physical plan for a scalar join in Spark.
    "agg_histogram",
    "text_ngram_score",
    "tpch_q22",
    # value/time bounds = one aggregate row broadcast against the event
    # scan — the histogram-bounds scalar-subquery shape again.
    "profile_drift",
    # counts(#strata rows) × broadcast(1-row n_min anchor) — the same
    # scalar-subquery degenerate join, sized by the stratum domain.
    "sample_temperature",
    # Q11's HAVING threshold is one global SUM — a 1-row broadcast against
    # the |part|-sized group aggregate; the canonical scalar-subquery plan.
    "tpch_q11",
    # bigram-LM smoothing denominator: the 1-row vocabulary-size aggregate
    # broadcasts against the scored bigram stream — the scalar-subquery
    # shape again (pinned as such in tests/test_plan_shapes.py).
    "text_lm_score",
    # naive-Bayes smoothing denominator: the 1-row vocabulary-size scalar
    # broadcasts against the (#langs×#vocab) count table.
    "train_naive_bayes",
    # smooth-idf numerator: the 1-row corpus-count scalar broadcasts
    # against the vocab-sized document-frequency table.
    "text_tfidf_topk",
    # KMV pair enumeration: a theta self-join of the DISTINCT event-type
    # list (#types rows, contracted before the join); the sketch join
    # itself is a broadcast equi-join — only the #types×#types pair
    # triangle nests, bounded by the sketch domain, never by fact volume.
    "agg_kmv_jaccard",
    # Same pair-triangle shape as agg_kmv_jaccard (union/intersection
    # estimates over the identical sketch table).
    "agg_kmv_union",
}

#: executing the callable runs a streaming drain / writes — not a pure plan
SKIP = {
    "stream_sessionize",
    "stream_windowed_counts",
    "sink_overwrite",
    "sink_incremental",
    "sink_partitioned",
    "sink_compacted",
}


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_no_scale_hostile_joins(spark, sf_dir, name):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in p, (
            f"{name} plans a nested-loop join; give it an equi key or "
            "add it to BNLJ_ALLOWED with justification"
        )
