"""Round-13 optimization invariants: the let-binding (`bind`) rewrites and
the driver-folded query norm must be VALUE-IDENTICAL to the expressions
they replaced — these are performance rewrites, not semantics changes.

Each case evaluates the optimized helper against an inline re-statement
of the pre-r13 formula on awkward inputs (empty strings, null text, zero
vectors, ties) and requires exact equality (floats bit-compared via
repr, like the oracle hash).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.functions import text as T
from openmrs_module_mamba_etl_spark.functions.similarity import (
    bind,
    cosine,
    quantize_int8,
    tokens,
    word_shingles,
)
from openmrs_module_mamba_etl_spark.llm.ann import _cosine_to_query


def _col(rows):
    return [r[0] for r in rows]


def test_bind_evaluates_body_on_value(spark):
    df = spark.range(1).select(
        bind(F.lit(21), lambda x: x + x).alias("v"),
        bind(F.lit(None).cast("int"), lambda x: x + 1).alias("n"),
    )
    row = df.first()
    assert row["v"] == 42
    assert row["n"] is None  # null value flows into the body unchanged


def test_quality_score_matches_unbound_formula(spark):
    texts = [
        ("the quick brown fox and the lazy dog of it for a to in is that",),
        ("",),
        ("   ",),
        (None,),
        ("x" * 50,),
        ("a b c d e f g h i j k l m n o p q r s t u v w x y z . , ; : !",),
    ]
    df = spark.createDataFrame(texts, "text string")

    # the pre-r13 formula, restated inline (each term re-tokenizes)
    n_tok = F.size(tokens(F.col("text")))
    hits = F.size(
        F.filter(
            tokens(F.col("text")),
            lambda t: t.isin(*T.STOPWORDS["en"]),
        )
    )
    stop_ratio = F.when(
        F.size(tokens(F.col("text"))) > 0, hits / F.size(tokens(F.col("text")))
    ).otherwise(F.lit(0.0))
    total = F.aggregate(
        tokens(F.col("text")), F.lit(0), lambda acc, t: acc + F.length(t)
    )
    mwl = F.when(
        F.size(tokens(F.col("text"))) > 0,
        total / F.size(tokens(F.col("text"))),
    ).otherwise(F.lit(0.0))
    legacy = F.round(
        F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((mwl >= 2.0) & (mwl <= 12.0), F.lit(0.2)).otherwise(F.lit(0.0))
        + F.when(
            T.punct_count(F.col("text")) <= F.length(F.col("text")) * 0.1,
            F.lit(0.1),
        ).otherwise(F.lit(0.0)),
        2,
    )
    rows = df.select(
        T.quality_score(F.col("text")).alias("new"), legacy.alias("old")
    ).collect()
    assert [repr(r["new"]) for r in rows] == [repr(r["old"]) for r in rows]


def test_lang_id_and_shingles_match_on_edge_texts(spark):
    texts = [
        ("the of and to in is that it for a",),
        ("le la les de et un une est que pour",),
        ("der die das und la le of the",),  # mixed evidence → tie rules
        ("zz yy xx",),
        ("",),
        (None,),
        ("one two",),  # shorter than shingle width → fallback branch
    ]
    df = spark.createDataFrame(texts, "text string")
    rows = df.select(
        T.lang_id(F.col("text")).alias("lang"),
        word_shingles(F.col("text"), 3).alias("sh"),
    ).collect()
    # pinned expected values (computed with the pre-r13 formula; null
    # text → null toks → every ratio 0.0 → 'und', same as before)
    assert [r["lang"] for r in rows] == [
        "en", "fr", "de", "und", "und", "und", "und",
    ]
    assert rows[6]["sh"] == ["one two"]  # short-doc fallback joins all toks
    assert rows[4]["sh"] == [""]


def test_cosine_to_query_matches_cosine_fold(spark):
    q = [0.3, -1.7, 2.5, 0.0]
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0, 4.0],), ([0.0, 0.0, 0.0, 0.0],), ([-0.3, 1.7, -2.5, 0.1],)],
        "v array<double>",
    )
    qc = F.array(*[F.lit(float(x)) for x in q])
    rows = df.select(
        _cosine_to_query(F.col("v"), q).alias("new"),
        cosine(F.col("v"), qc).alias("old"),
    ).collect()
    for r in rows:
        assert repr(r["new"]) == repr(r["old"])  # bit-identical doubles


def test_quantize_int8_matches_and_zero_vector(spark):
    df = spark.createDataFrame(
        [([0.5, -1.0, 0.25],), ([0.0, 0.0, 0.0],), ([3.0],)],
        "v array<double>",
    )
    rows = df.select(quantize_int8(F.col("v")).alias("q")).collect()
    assert rows[0]["q"] == [64, -127, 32]
    assert rows[1]["q"] == [0, 0, 0]
    assert rows[2]["q"] == [127]


def test_query_norm_fold_is_bit_exact():
    # the driver-side replay of the JVM fold: same accumulation order
    q = [0.1, 0.2, 0.3, 1e-17, 4.0]
    acc = 0.0
    for x in q:
        acc += float(x) * float(x)
    assert repr(math.sqrt(acc)) == repr(
        math.sqrt(((((0.0 + 0.1 * 0.1) + 0.2 * 0.2) + 0.3 * 0.3) + 1e-17 * 1e-17) + 4.0 * 4.0)
    )


# --- r14: plan-shape pins — the bind() single evaluation must SURVIVE the
# optimizer (ADVICE r13: a future Spark rule re-inlining lambda variables
# or collapsing single-element transforms would silently restore the
# k-fold re-evaluation with values unchanged; value tests alone cannot
# catch that). The optimized-plan TEXT carries each expression occurrence,
# so "tokenizer appears once" is the regression tripwire.


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_quality_score_plan_tokenizes_once(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    plan = _optimized(df.select(T.quality_score(F.col("text")).alias("q")))
    assert plan.count("split(") == 1, plan


def test_lang_id_plan_tokenizes_once(spark):
    df = spark.createDataFrame([("le la les",)], "text string")
    plan = _optimized(df.select(T.lang_id(F.col("text")).alias("lang")))
    assert plan.count("split(") == 1, plan


def test_struct_bind_two_step_select_single_eval(spark):
    """The r14 single-scan composites derive several output columns from
    ONE bound struct via a two-step select; CollapseProject must not
    inline the non-cheap struct into its (multiple) field references."""
    df = spark.createDataFrame([("a b c",)], "text string")
    derived = bind(
        tokens(F.col("text")),
        lambda t: F.struct(
            F.size(t).alias("n"), F.md5(F.array_join(t, " ")).alias("h")
        ),
    )
    out = df.select(derived.alias("_d")).select(
        F.col("_d.n").alias("n"), F.col("_d.h").alias("h")
    )
    assert _optimized(out).count("split(") == 1, _optimized(out)


def test_etl_llm_corpus_single_scan_single_tokenize(spark):
    """The headline composite: exactly ONE documents FileScan and ONE
    tokenizer occurrence in the formatted physical plan (r13: four scans,
    nine tokenizer occurrences). The formatted form is used because the
    logical toString reprints each InMemoryRelation's child scan per
    occurrence."""
    import contextlib
    import io

    from openmrs_module_mamba_etl_spark import registry

    registry.load_all()
    spark.catalog.clearCache()
    df = registry.QUERIES["etl_llm_corpus"](spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert plan.count("documents.parquet") == 1, plan
    assert plan.count("split(") == 1, plan


def test_emb_normalize_norm_fold_once(spark):
    """emb_normalize's norm fold: one occurrence in the optimized plan
    (pre-r14 it sat inside the per-element division lambda — O(dim²) per
    row — plus the guard and the output, three occurrences)."""
    from openmrs_module_mamba_etl_spark import registry

    registry.load_all()
    plan = _optimized(
        registry.QUERIES["emb_normalize"](spark, "/root/testdata/sf0.001")
    )
    assert plan.count("aggregate(") == 1, plan


def test_decontaminate_shingles_once_per_side(spark):
    """Generate-inferred filters must not re-evaluate the shingle
    pipeline: exploding a PROJECTED shingle column lets
    InferFiltersFromGenerate add a size()>0 filter on the attribute that
    predicate pushdown then inlines below the projection — tokenizer ran
    3x per row per side (r14 measured +25%). Pinned: one tokenizer
    occurrence per side in the physical plan."""
    import contextlib
    import io

    from openmrs_module_mamba_etl_spark.llm.curation import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    out = decontaminate(docs, docs.limit(1), "doc_id", "text", n=3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    assert buf.getvalue().count("split(") == 2, buf.getvalue()
