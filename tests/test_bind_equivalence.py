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
