"""Semantic pins for decontamination and repetition curation ops."""

from __future__ import annotations

from openmrs_module_mamba_etl_spark.llm.curation import (
    decontaminate,
    repetition_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = _df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains bench 5-gram
            (2, "one two three four five six"),  # disjoint
        ],
    )
    bench = _df(spark, [(100, "alpha beta gamma delta epsilon")])
    hits = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    }
    assert hits == {1: 1}


def test_decontaminate_short_doc_whole_text_fallback(spark):
    # both sides < n tokens: shingle is the whole text, exact match taints
    corpus = _df(spark, [(1, "tiny doc"), (2, "other doc")])
    bench = _df(spark, [(100, "tiny doc")])
    hits = {
        r["doc_id"]: r["n_hit_shingles"]
        for r in decontaminate(corpus, bench, "doc_id", "text", n=5).collect()
    }
    assert hits == {1: 1}


def test_repetition_stats_exact_fractions(spark):
    docs = _df(
        spark,
        [
            # 2-grams: ab ba ab ba ac → top2 = 2/5; 3-grams: aba bab aba
            # bac → 4 total, 3 distinct → dup3 = 0.25
            (1, "a b a b a c"),
            (2, "w x y z"),  # all grams unique
            (3, "q"),  # too short for any gram
        ],
    )
    out = {
        r["doc_id"]: (
            r["dup_3gram_frac"],
            r["top_2gram_frac"],
            r["flagged"],
        )
        for r in repetition_stats(docs, "doc_id", "text").collect()
    }
    assert out[1] == (0.25, 0.4, True)
    assert out[2] == (0.0, 0.333333, True)  # 3 unique 2-grams → top2 = 1/3
    assert out[3] == (0.0, 0.0, False)


def test_repetition_unique_grams_not_flagged_at_default(spark):
    # 10 distinct tokens → every 2-gram unique → top2 = 1/9 < 0.12
    docs = _df(spark, [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")])
    r = repetition_stats(docs, "doc_id", "text").collect()[0]
    assert r["dup_3gram_frac"] == 0.0
    assert not r["flagged"]


def test_duplicate_span_stats_counts_cross_doc_spans(spark):
    from openmrs_module_mamba_etl_spark.llm.curation import (
        duplicate_span_stats,
    )

    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = _df(
        spark,
        [
            (1, ten + " tailA"),          # 2 spans; first shared with doc 2
            (2, ten),                      # 1 span, shared
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11"),  # 2 unique spans
            (4, "short doc"),              # <10 tokens → absent
        ],
    )
    out = {
        r["doc_id"]: (r["n_spans"], r["dup_spans"], r["dup_frac"])
        for r in duplicate_span_stats(docs, "doc_id", "text").collect()
    }
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (1, 1, 1.0)
    assert out[3] == (2, 0, 0.0)
    assert 4 not in out


def test_duplicate_span_stats_flags_within_doc_repeats(spark):
    from openmrs_module_mamba_etl_spark.llm.curation import (
        duplicate_span_stats,
    )

    # 20 tokens = the same 10 twice → the span at pos 1 recurs at pos 11
    # (interior spans are rotations, each occurring once)
    rep = " ".join(["a%d" % (i % 10) for i in range(20)])
    docs = _df(spark, [(7, rep)])
    r = duplicate_span_stats(docs, "doc_id", "text").collect()[0]
    assert r["n_spans"] == 11
    assert r["dup_spans"] == 2
    assert r["dup_frac"] == 0.1818


def test_bpe_greedy_merge_overlap(spark):
    """Greedy left-to-right application on overlapping candidates: merging
    ('a','a') in 'aaaa' must give 'aa aa' (pairs consumed left to right,
    no overlap), and 'aaa' must give 'aa a'."""
    from openmrs_module_mamba_etl_spark.llm.bpe import _apply_merge

    rep = spark.createDataFrame(
        [("a a a a", 1), ("a a a", 1)], "rep string, freq long"
    )
    out = {r["rep"] for r in _apply_merge(rep, "a a").collect()}
    assert out == {"aa aa", "aa a"}


def test_bpe_train_learns_frequent_pair(spark):
    from openmrs_module_mamba_etl_spark.llm.bpe import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "low lower")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, "text", n_merges=2)
    assert merges[0][0] == 1
    # 'l o' and 'o w' both occur in every token (6 words); tie broken
    # alphabetically -> 'l o' first, then the merged 'lo w'
    assert merges[0][1] == "l o"
    assert merges[1][1] == "lo w"


def test_pii_redact_scrubs_constructed_pii(spark):
    from openmrs_module_mamba_etl_spark.llm.curation import pii_redact

    df = _df(
        spark,
        [
            (1, "contact bob.smith+x@example.co.uk or admin@host.io now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (3, "call +1 555-123 4567 tomorrow"),
            (4, "clean text with no identifiers at all"),
            (5, None),
        ],
    )
    rows = {r["doc_id"]: r for r in pii_redact(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3, 4}  # null text filtered
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 0, 0)
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 2, 0)
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) == (0, 0, 1)
    assert rows[4]["n_email"] == rows[4]["n_ipv4"] == rows[4]["n_phone"] == 0
    # redaction replaces the match, so equal inputs differing only in the
    # PII value redact to the same digest
    df2 = _df(
        spark,
        [
            (10, "contact alice@foo.org please"),
            (11, "contact carol@bar.net please"),
        ],
    )
    r2 = {r["doc_id"]: r["redacted_md5"] for r in pii_redact(df2, "doc_id", "text").collect()}
    assert r2[10] == r2[11]


def test_ngram_lm_score_prefers_predictable_text(spark):
    from openmrs_module_mamba_etl_spark.llm.curation import ngram_lm_score

    # "a b" dominates the corpus; doc 3 is the sole unpredictable one
    df = _df(
        spark,
        [
            (1, "a b a b a b a b"),
            (2, "a b a b a b"),
            (3, "q z p m"),
            (4, "solo"),  # < 2 tokens: no bigrams, drops out
        ],
    )
    rows = {r["doc_id"]: r for r in ngram_lm_score(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_bigrams"] == 7
    assert rows[3]["n_bigrams"] == 3
    # frequent bigrams score strictly higher than one-off ones
    assert rows[1]["avg_logp"] > rows[3]["avg_logp"]
    assert rows[2]["avg_logp"] > rows[3]["avg_logp"]


def test_ngram_lm_score_exact_hand_computation(spark):
    import math

    from openmrs_module_mamba_etl_spark.llm.curation import ngram_lm_score

    # corpus: doc1 "x y x", doc2 "y x"  → bigrams: (x,y) (y,x) (y,x)
    # contexts: x:1, y:2 ; vocab V=2
    df = _df(spark, [(1, "x y x"), (2, "y x")])
    rows = {r["doc_id"]: r for r in ngram_lm_score(df, "doc_id", "text").collect()}
    p_xy = (1 + 1.0) / (1 + 2)  # c(x,y)=1, ctx x=1, V=2
    p_yx = (2 + 1.0) / (2 + 2)  # c(y,x)=2, ctx y=2
    exp1 = round((math.log(p_xy) + math.log(p_yx)) / 2, 4)
    exp2 = round(math.log(p_yx), 4)
    assert rows[1]["n_bigrams"] == 2 and rows[1]["avg_logp"] == exp1
    assert rows[2]["n_bigrams"] == 1 and rows[2]["avg_logp"] == exp2
