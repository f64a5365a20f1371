"""Physical-plan shape assertions — the 100 TB design contracts.

These tests pin the properties that matter at scale: filters and projections
reach the parquet scan, small dimensions broadcast, aggregates partial-agg
map-side, top-k avoids a global sort. A refactor that silently loses one of
these still passes value checks at sf0.01 but dies at 100 TB; this suite is
the guard.
"""

from __future__ import annotations

import contextlib
import io

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()


def plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES[name](spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_scan_pushdown_and_pruning(spark, sf_dir):
    p = plan(spark, sf_dir, "scan_source")
    assert "PushedFilters" in p and "l_orderkey" in p.split("PushedFilters")[1][:200]
    # column pruning: ReadSchema carries only the 3 projected columns
    read_schema = p.split("ReadSchema")[1].splitlines()[0]
    assert "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_dim_join_broadcasts(spark, sf_dir):
    p = plan(spark, sf_dir, "join_inner_eq")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_multiway_all_broadcast(spark, sf_dir):
    p = plan(spark, sf_dir, "join_multiway")
    # formatted explain lists each node in tree + details ⇒ 2 joins appear 4×
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_agg_partial_final(spark, sf_dir):
    p = plan(spark, sf_dir, "agg_group_by")
    # two HashAggregate nodes: map-side partial + reduce-side final
    assert p.count("HashAggregate") >= 2


def test_topk_no_global_sort(spark, sf_dir):
    p = plan(spark, sf_dir, "sort_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_pivot_single_shuffle(spark, sf_dir):
    p = plan(spark, sf_dir, "pivot_eav_flatten")
    # exactly one exchange node (tree + details each mention it once);
    # no window pass, no join, no second aggregate-exchange from pivotfirst
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1
    assert "Window" not in p
    assert "Join" not in p


def test_anti_join_broadcast_in_incremental(spark, sf_dir):
    # sink_incremental returns the read-back scan, so assert on the merge
    # plan itself: base ANTI JOIN changed-keys must broadcast the key set.
    import contextlib
    import io

    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.operators.incremental import merge_upsert
    from openmrs_module_mamba_etl_spark.sources.parquet import table

    orders = table(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 97 == 0)
    merged = merge_upsert(orders, updates, ["o_orderkey"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        merged.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_sessionize_single_shuffle(spark, sf_dir):
    # lag window, running-sum window, and the final (user_id, session_id)
    # aggregate must all reuse ONE user_id hash partitioning: the grouping
    # keys are a superset of the partition key, so no second exchange.
    p = plan(spark, sf_dir, "window_sessionize")
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1
    assert tree.count("Window") == 2
    assert tree.count("HashAggregate") == 2  # partial + final, no re-shuffle


def test_profile_single_pass(spark, sf_dir):
    # every per-column statistic must ride ONE scan + ONE aggregate —
    # a per-column job loop or a union re-executing the agg is the failure
    p = plan(spark, sf_dir, "profile_documents")
    tree = p.split("(1) Scan")[0]
    assert tree.count("Scan parquet") == 1
    assert tree.count("Exchange") <= 2  # partial→final agg + final sort
    assert "Union" not in tree


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    # the 100 TB fact⋈dim contract: a selective dim filter must prune the
    # partitioned fact scan AT RUNTIME (dynamicpruning subquery in the
    # partition filters), so the join reads only matching partitions.
    import contextlib
    import io

    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    orders = table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("order_year"), "o_orderkey", "o_totalprice"
    )
    orders.write.mode("overwrite").partitionBy("order_year").parquet(
        str(tmp_path / "fact")
    )
    spark.createDataFrame(
        [(y, "keep" if y in (1996, 1997) else "drop") for y in range(1992, 1999)],
        "order_year int, tag string",
    ).write.parquet(str(tmp_path / "dim"))

    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = spark.read.parquet(str(tmp_path / "dim")).where(F.col("tag") == "keep")
    joined = fact.join(dim, "order_year")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("formatted")
    assert "dynamicpruning" in buf.getvalue()
    # and the result only contains the kept years
    years = {r["order_year"] for r in joined.select("order_year").distinct().collect()}
    assert years <= {1996, 1997}


def test_whole_stage_codegen_on_flagship(spark, sf_dir):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        QUERIES["agg_group_by"](spark, sf_dir).explain("codegen")
    p = buf.getvalue()
    # the scan→filter→project→partial-agg pipeline must be codegen'd
    assert "WholeStageCodegen" in p


def test_hash_split_zero_shuffle(spark, sf_dir):
    # the split is a pure map-side function of the id: no Exchange at all
    p = plan(spark, sf_dir, "sample_hash_split")
    assert "Exchange" not in p


def test_stratified_sample_zero_shuffle(spark, sf_dir):
    p = plan(spark, sf_dir, "sample_stratified")
    assert "Exchange" not in p


def test_mixture_broadcasts_rates(spark, sf_dir):
    # per-stratum rates (#strata rows) broadcast back; the corpus side is
    # never hash-partitioned on the join key
    p = plan(spark, sf_dir, "sample_mixture")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_pack_chunks_single_shuffle(spark, sf_dir):
    # one hashpartitioning exchange on shard feeding the window cumsum
    p = plan(spark, sf_dir, "pack_chunks")
    # formatted explain shows each node twice (tree + detail): one node
    assert p.count("Exchange") == 2
    assert "hashpartitioning(shard" in p
    assert "rangepartitioning" not in p  # no global sort


def test_decontaminate_broadcasts_benchmark(spark, sf_dir):
    # the eval-suite shingle set broadcasts; the corpus posting list is
    # never shuffled on shingle
    p = plan(spark, sf_dir, "text_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_runtime_bloom_filter_prunes_fact_shuffle(spark, sf_dir):
    """Spark's runtime Bloom-filter injection (on by default) pre-filters
    the fact side of a shuffle join with might_contain built from the
    selective dim side — at 100 TB this cuts shuffle volume by the dim's
    selectivity before a single row moves. The application-side threshold
    defaults to 10 GB scans, i.e. it self-activates exactly at scale;
    lower it here to observe the plan on test data."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from openmrs_module_mamba_etl_spark.sources.parquet import table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        assert "might_contain" in buf.getvalue()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_pattern_match_single_user_shuffle(spark, sf_dir):
    # window (user_id) and final groupBy (user_id) must share ONE exchange:
    # the RANGE-frame scan and the purchase aggregate reuse the partitioning
    import re

    p = plan(spark, sf_dir, "window_pattern_match")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1


def test_transition_matrix_map_side_combine(spark, sf_dir):
    # lag window = one user_id exchange; the 25-cell transition count must
    # partial-agg map-side before its (tiny) shuffle
    p = plan(spark, sf_dir, "window_transition_matrix")
    assert p.count("HashAggregate") >= 2


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    # A-Res top-k must be per-partition heaps + k-row merge, not a full sort
    p = plan(spark, sf_dir, "sample_weighted")
    assert "TakeOrderedAndProject" in p
    assert "Exchange rangepartitioning" not in p


def test_ngram_score_vocab_broadcasts(spark, sf_dir):
    # the scoring pass must be a broadcast join on tok (map-side at scale),
    # never a token-keyed shuffle join
    p = plan(spark, sf_dir, "text_ngram_score")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_named_window_single_window_operator(spark, sf_dir):
    # three OVER w functions share one Window node and one sort+exchange
    import re

    p = plan(spark, sf_dir, "sql_window_named")
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) Window", p)) == 1
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1


def test_values_inline_is_local_relation(spark, sf_dir):
    # the VALUES dim must be a LocalTableScan broadcast, zero file scan cost
    p = plan(spark, sf_dir, "sql_values_inline")
    assert "LocalTableScan" in p
    assert "BroadcastHashJoin" in p


def test_market_basket_prunes_before_pairing(spark, sf_dir):
    # apriori: the frequent-item semi-join must sit under the pair self-join
    p = plan(spark, sf_dir, "agg_market_basket")
    assert "LeftSemi" in p


def test_shuffle_order_no_global_sort(spark, sf_dir):
    # training-order positions come from a SHARD-partitioned window — a
    # global ROW_NUMBER (empty partition spec) would serialize the corpus
    p = plan(spark, sf_dir, "sample_shuffle_order")
    assert "Window" in p
    assert "Exchange SinglePartition" not in p
    assert "Exchange rangepartitioning" not in p


def test_incremental_dedup_corpus_never_shuffles(spark, sf_dir):
    # the corpus scan must be filtered map-side by a broadcast LeftSemi on
    # the increment's hashes, and the final exclusion must be a broadcast
    # LeftAnti — no plan may shuffle the corpus on the hash key
    p = plan(spark, sf_dir, "dedup_incremental")
    assert "BroadcastHashJoin LeftSemi" in p.replace("\n", " ") or (
        "LeftSemi" in p and "BroadcastHashJoin" in p
    )
    assert "LeftAnti" in p
    assert "SortMergeJoin" not in p


def test_multimodal_dedup_hashes_before_shuffle(spark, sf_dir):
    # the groupBy key is the sha256 digest computed map-side and the
    # aggregate partial-combines below the exchange: the shuffle carries
    # (digest, min-id, count) partials, never the binary payload
    p = plan(spark, sf_dir, "multimodal_dedup")
    assert "sha2" in p
    assert "partial_min" in p
    # the exchange's input is the partial-agg output, digest-keyed
    exchange_detail = p.split(") Exchange")[1]
    assert "content_sha" in exchange_detail[:400]
    assert "content#" not in exchange_detail[:400]


def test_tpch_q21_no_nested_loop_regression(spark, sf_dir):
    """The double EXISTS / NOT-EXISTS correlation over lineitem must plan
    as hash joins + aggregates — a regression to a correlated nested-loop
    or cartesian re-execution of the fact table is the classic Q21 scale
    killer. Top-k must avoid a global sort."""
    p = plan(spark, sf_dir, "tpch_q21")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "TakeOrderedAndProject" in p
    # lineitem-derived aggregates shuffle on suppkey/orderkey only —
    # bounded exchange count (tree lists each exchange once)
    tree = p.split("(1) ")[0]
    import re as _re

    shuffles = len(_re.findall(r"\+- Exchange |:- Exchange ", tree))
    assert shuffles <= 4, f"tpch_q21 grew to {shuffles} shuffles"


def test_recursive_cte_native_union_loop(spark, sf_dir):
    """The recursive CTE must run as Spark's native UnionLoop operator —
    not a driver-side unrolled union — and its join against orders must
    stay a hash join (no cartesian / nested-loop blow-up per iteration)."""
    p = plan(spark, sf_dir, "sql_recursive_cte")
    assert "UnionLoop" in p
    assert "UnionLoopRef" in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_knn_join_lsh_no_cross_product(spark, sf_dir):
    """The bucketed k-NN join must be an equi-join on the bucket id — the
    whole point of the LSH sibling is eliminating the knn_join cross
    product, so any nested-loop/cartesian here is a regression."""
    p = plan(spark, sf_dir, "ann_knn_join_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Join" in p  # candidates still meet in a real join


def test_ivf_portable_pruned_scan_no_join(spark, sf_dir):
    """The portable IVF top-k must stay a pruned scan: quantizer literals
    embed in the expression (no join anywhere) and the final top-k is a
    TakeOrdered, never a global sort."""
    p = plan(spark, sf_dir, "ann_topk_ivf_portable")
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_lm_score_no_cartesian_vocab_broadcasts(spark, sf_dir):
    """Bigram-LM scoring: the 1-row vocabulary aggregate must enter as a
    broadcast (nested-loop on a 1-row build side), never a cartesian
    product, and the count-table joins must be hash joins."""
    p = plan(spark, sf_dir, "text_lm_score")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # the 1-row vocab scalar


def test_firstfit_pack_single_shard_shuffle(spark, sf_dir):
    """FFD packing must shuffle exactly once — on the shard key feeding
    the applyInPandas kernel; no joins, no extra exchanges."""
    p = plan(spark, sf_dir, "pack_firstfit")
    assert p.count("Exchange") <= 2  # shard hash (+ AQE read)
    assert "Join" not in p
    assert "FlatMapGroupsInPandas" in p  # the per-shard packing kernel


def test_covariance_broadcasts_means(spark, sf_dir):
    """emb_covariance: the dim-row mean tables must broadcast into the
    final select (hash joins on i/j), and the moment aggregate must be
    partial+final (map-side combine) so only accumulator cells shuffle."""
    p = plan(spark, sf_dir, "emb_covariance")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 2


def test_kmv_sketch_contracts_before_pairing(spark, sf_dir):
    """agg_kmv_jaccard: the fact table contracts (distinct + bounded
    window) BEFORE any pair work — no sort-merge join of fact-sized
    inputs anywhere."""
    p = plan(spark, sf_dir, "agg_kmv_jaccard")
    assert "SortMergeJoin" not in p
    assert "WindowExec" in p or "Window" in p  # the per-type top-64


def test_text_curate_zero_joins_single_shuffle(spark, sf_dir):
    """text_curate must be the one-pass window form: content hash +
    quality computed map-side, kept-ness decided by a window min over the
    content-hash partitioning — NO join anywhere (the round-4 version
    broadcast the ~corpus-sized survivor set, an OOM at 100 TB)."""
    p = plan(spark, sf_dir, "text_curate")
    assert "Join" not in p
    assert "Window" in p


def test_etl_composites_join_loser_complement(spark, sf_dir):
    """etl_llm_corpus / etl_corpus_funnel dedup joins must build on the
    duplicate-LOSER complement (the `size(ids) > 1` churn set from
    dedup_losers), never the ~corpus-sized survivor set, and the join must
    stay unhinted so the broadcast decision is statistics/AQE-driven.
    `size(ids` in the plan is the loser-derivation fingerprint: it only
    appears when the build side filters duplicate groups before explode."""
    for name in ("etl_llm_corpus", "etl_corpus_funnel"):
        p = plan(spark, sf_dir, name)
        assert "size(ids" in p, f"{name}: dedup join no longer builds on the loser complement"
        assert "CartesianProduct" not in p


def test_apply_bpe_is_map_only(spark, sf_dir):
    """Tokenizer application must be a pure map pass: the learned merges
    embed as literals, so the returned plan has no joins and no exchanges
    — re-tokenizing 100 TB costs one corpus scan."""
    p = plan(spark, sf_dir, "text_apply_bpe")
    assert "Join" not in p
    assert "Exchange" not in p


def test_containment_prefix_filter_on_probe_side(spark, sf_dir):
    """The containment join must be driven by the contained side's rare
    PREFIX shingles (row_number window capped at prefix_len), never an
    unfiltered posting×posting self-join, and no cartesian anywhere."""
    p = plan(spark, sf_dir, "dedup_containment")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "row_number" in p
    assert "prefix_len" in p


def test_pq_topk_no_joins_takeordered(spark, sf_dir):
    """PQ ADC scoring embeds codebooks and the LUT as literals: the plan
    must contain no join anywhere and finish in a TakeOrdered, never a
    global sort — the scan reads vectors once, scores via lookups."""
    p = plan(spark, sf_dir, "ann_topk_pq_portable")
    assert "Join" not in p
    assert "TakeOrderedAndProject" in p


def test_pretok_shards_loser_complement_no_cartesian(spark, sf_dir):
    """The shard-prep composite's dedup decision must build on the
    churn-sized loser complement (size(ids) fingerprint), with BPE
    application map-only after the keep decision."""
    p = plan(spark, sf_dir, "etl_pretok_shards")
    assert "size(ids" in p
    assert "CartesianProduct" not in p


def test_dataset_card_no_joins_two_exchanges(spark, sf_dir):
    """etl_dataset_card is one scan → one groupBy(source): quality and
    the content hash are map-side codegen; nothing joins, nothing
    broadcasts. The distinct-hash count adds its expand/exchange pass but
    no join may appear — the round-4 scale-killer class (corpus-sized
    broadcast) stays dead."""
    p = plan(spark, sf_dir, "etl_dataset_card")
    assert "Join" not in p
    assert "Scan parquet" in p and p.count("Scan parquet ") <= 2


def test_quality_budget_single_shuffle_window(spark, sf_dir):
    """sample_quality_budget: one exchange on the source key feeding a
    sorted window running sum — no join, no second scan, no global
    sort."""
    p = plan(spark, sf_dir, "sample_quality_budget")
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 1
    assert "Join" not in p
    assert "Window" in p


def test_segment_dedup_no_join_two_shuffles(spark, sf_dir):
    """text_segment_dedup: winner election is a window over the segment
    content hash, reassembly a groupBy(doc_id) — exactly the two dedup
    exchanges, never a join of corpus-sized relations."""
    p = plan(spark, sf_dir, "text_segment_dedup")
    assert "Join" not in p
    tree = p.split("(1) Scan")[0]
    assert tree.count("Exchange") == 2


def test_bitmap_distinct_word_contraction(spark, sf_dir):
    """agg_bitmap_distinct: the bitmap arm aggregates words at
    (group, block) granularity with a map-side partial — duplicate hits
    contract BEFORE the shuffle; no sort-merge join (the two tiny
    per-group result tables meet in a broadcast)."""
    p = plan(spark, sf_dir, "agg_bitmap_distinct")
    assert "SortMergeJoin" not in p
    assert p.count("HashAggregate") >= 4  # partial+final × (words, popcount)


def test_ols_single_pass_no_exchange_after_agg(spark, sf_dir):
    """train_ols: ONE aggregation pass to a single moment row; the Cramer
    solve is scalar projection — no join, no window, no second scan."""
    p = plan(spark, sf_dir, "train_ols")
    assert "Join" not in p
    assert "Window" not in p
    # one scan node = tree line + details header
    assert p.count("Scan parquet ") <= 2


def test_hybrid_rrf_arms_contract_before_fusion(spark, sf_dir):
    """ann_hybrid_rrf: both retrieval arms reduce to top-k
    (TakeOrdered / Limit) BEFORE the fusion join — the join must never
    see a corpus-sized input."""
    p = plan(spark, sf_dir, "ann_hybrid_rrf")
    assert "TakeOrderedAndProject" in p
    # fusion of two ≤20-row arms: any join strategy is fine, but no
    # broadcast of a raw scan (arms contract first)
    assert "CartesianProduct" not in p


def test_eval_auc_contracts_before_rank_window(spark, sf_dir):
    """eval_auc (round-6 histogram rewrite): the midrank window must see
    the ≤#distinct-scores histogram, never corpus rows — between the
    Window and the parquet scan there must be a contracting aggregate,
    and the corpus is scanned exactly once."""
    p = plan(spark, sf_dir, "eval_auc")
    tree = p.split("\n\n")[0]
    assert tree.count("Scan parquet ") == 1
    w, s = tree.index("Window"), tree.index("Scan parquet")
    assert w < s and "HashAggregate" in tree[w:s]


def test_rank_dense_two_pass_histogram_broadcast(spark, sf_dir):
    """window_rank_dense (round-6 rewrite): global RANK/DENSE_RANK is
    computed on the rounded-value histogram and broadcast back — the fact
    rows never enter a global window."""
    p = plan(spark, sf_dir, "window_rank_dense")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    w, s = tree.index("Window"), tree.rindex("Scan parquet")
    assert w < s and "HashAggregate" in tree[w:s]


def test_ntile_pctrank_partitioned_window_only(spark, sf_dir):
    """window_ntile_pctrank (round-6 rewrite): the only window over fact
    rows is PARTITIONED by the rounded balance (row_number within k);
    the global component lives on the broadcast histogram."""
    p = plan(spark, sf_dir, "window_ntile_pctrank")
    tree = p.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    # deepest Window (the histogram prefix-sum) is fed by an aggregate
    w, s = tree.rindex("Window"), tree.rindex("Scan parquet")
    assert w < s and "HashAggregate" in tree[w:s]
    # the fact-row window is hash-partitioned, not global: its exchange
    # must not be SinglePartition (details section spells partitioning)
    assert "windowspecdefinition(k" in p


def test_hdr_truth_arm_two_level_prefix_sum(spark, sf_dir):
    """agg_hdr_histogram's exact-rank truth arm must stay TWO-LEVEL: the
    distinct-value running sum partitioned BY BUCKET (hashpartitioning on
    a window over cents), with only bucket-grain tables crossing a
    SinglePartition exchange — no single task may materialize the whole
    distinct-value set (round-6 verdict task 3)."""
    jdf = QUERIES["agg_hdr_histogram"](spark, sf_dir)._jdf
    jplan = jdf.queryExecution().executedPlan()

    def unwrap(n):
        return unwrap(n.initialPlan()) if n.nodeName() == "AdaptiveSparkPlan" else n

    def walk(n):
        yield n
        for i in range(n.children().size()):
            yield from walk(n.children().apply(i))

    heads = [
        str(n).splitlines()[0].strip()
        for n in walk(unwrap(jplan))
        if str(n).splitlines()[0].strip().startswith("Window")
    ]
    assert heads, "no Window nodes found — plan capture broken"
    # Window heads print as 'Window [agg windowspecdefinition(part..., order
    # ASC, frame)...], [partSpec], [orderSpec]'; the distinct-value running
    # sum must reference BOTH the cents order key and the bucket partition
    # key in one node (empirically: a global Window.orderBy('cents') head
    # mentions cents# with no bucket#).
    assert any(
        "cents#" in h and "bucket#" in h for h in heads
    ), f"within-bucket running sum over cents missing: {heads}"
    # no unpartitioned window runs directly over the cents histogram
    for h in heads:
        if "cents#" in h:
            assert "bucket#" in h, (
                "global window over distinct cents reintroduced: " + h
            )
