"""Meta plan audit: no registered query may plan a scale-hostile shape.

CartesianProduct is always a bug. BroadcastNestedLoopJoin is allowed only
for the intentional brute-force baselines (theta self-joins whose scalable
variants exist alongside them). A new query that trips this test needs an
equi-join key, a broadcast hint, or an LSH/bucketing pre-pass — not a
whitelist entry.

The second audit (round-5 verdict task 3) machine-checks the global-window
class: any ``Exchange SinglePartition`` — the physical shape behind an
unpartitioned Window.orderBy, a global sort-to-one-task, or a final global
aggregate — must sit above a CONTRACTION (aggregate / limit / top-k) on
every path down to a parquet scan. A single partition of contracted rows
is the canonical scalar/histogram plan; a single partition of RAW corpus
rows is the 100 TB killer that eval_auc/window_rank_dense shipped with
until round 6.
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


#: physical nodes that bound the row count flowing upward: once one of
#: these sits between a scan and a SinglePartition exchange, the exchange
#: moves a contracted relation (groups / top-k / limit), not corpus rows.
_CONTRACTIONS = (
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def _unwrap(jnode):
    if jnode.nodeName() == "AdaptiveSparkPlan":
        return _unwrap(jnode.initialPlan())
    return jnode


def _children(jnode):
    return [jnode.children().apply(i) for i in range(jnode.children().size())]


def _uncontracted_scans(jnode) -> list[str]:
    """Parquet-scan leaves reachable from ``jnode`` with NO contraction on
    the path — the rows a parent SinglePartition exchange would move in
    full into one task."""
    name = jnode.nodeName()
    if any(c in name for c in _CONTRACTIONS):
        return []
    kids = _children(jnode)
    if not kids:
        return [name] if name.startswith("Scan parquet") else []
    return [leaf for k in kids for leaf in _uncontracted_scans(k)]


def _single_partition_offenses(jplan) -> list[str]:
    out = []
    stack = [jplan]
    while stack:
        n = stack.pop()
        kids = _children(n)
        stack.extend(kids)
        if n.nodeName() == "Exchange" and "SinglePartition" in str(
            n.outputPartitioning().toString()
        ):
            for k in kids:
                out.extend(_uncontracted_scans(k))
    return out


@pytest.mark.parametrize("name", sorted(set(QUERIES) - SKIP))
def test_no_scale_hostile_plans(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
    if name not in BNLJ_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in p, (
            f"{name} plans a nested-loop join; give it an equi key or "
            "add it to BNLJ_ALLOWED with justification"
        )
    if not df.isStreaming:
        jplan = _unwrap(df._jdf.queryExecution().executedPlan())
        offenses = _single_partition_offenses(jplan)
        assert not offenses, (
            f"{name} funnels uncontracted scans {offenses} through an "
            "Exchange SinglePartition — a one-task sort/window of corpus "
            "rows at scale; contract first (histogram/limit/aggregate)"
        )


def test_single_partition_audit_catches_global_window(spark, sf_dir):
    """Negative control: the audit must FLAG the retired global-window
    shape (rank over the whole table, no partitionBy) — the exact plan
    eval_auc/window_rank_dense shipped with before round 6."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    bad = table(spark, sf_dir, "customer").select(
        "c_custkey", F.rank().over(Window.orderBy("c_acctbal")).alias("r")
    )
    offenses = _single_partition_offenses(
        _unwrap(bad._jdf.queryExecution().executedPlan())
    )
    assert offenses, "audit failed to flag a global rank window over a scan"
