"""Semantic pins for the deterministic sampling/packing family: stable
under row-order/partitioning changes, disjoint+exhaustive splits, packing
chunk invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.llm.sampling import (
    hash_split,
    mixture_rates,
    pack_sequences,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7 + 1).alias("n_tok"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("src"),
    )


def test_split_disjoint_exhaustive_and_order_invariant(spark):
    docs = _docs(spark)
    cuts = [("train", 900), ("valid", 950), ("test", 1000)]
    a = hash_split(docs, "doc_id", cuts).select("doc_id", "split")
    # same rows, different physical order/partitioning → same assignment
    b = hash_split(
        docs.orderBy(F.col("doc_id").desc()).repartition(7), "doc_id", cuts
    ).select("doc_id", "split")
    ra, rb = set(map(tuple, a.collect())), set(map(tuple, b.collect()))
    assert ra == rb
    assert len(ra) == 400  # every doc got exactly one split
    frac_train = sum(1 for _, s in ra if s == "train") / 400
    assert 0.8 < frac_train < 0.98  # ~0.9 up to hash noise on 400 ids


def test_mixture_rates_integer_exact(spark):
    docs = _docs(spark, 300)  # 100 docs per src
    rates = {
        r["src"]: (r["n_rows"], r["rate_pm"])
        for r in mixture_rates(docs, "src", {"s0": 3, "s1": 2, "s2": 1}, 60)
        .collect()
    }
    # quotas 30/20/10 over 100-doc strata → 300/200/100 permille exactly
    assert rates == {"s0": (100, 300), "s1": (100, 200), "s2": (100, 100)}


def test_pack_sequences_chunk_invariants(spark):
    out = pack_sequences(
        _docs(spark), "doc_id", "n_tok", budget=16, shards=4
    ).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            # a doc starts in the chunk its exclusive prefix-sum lands in
            assert r["chunk_id"] == cum // 16
            cum += r["n_tok"]
        # chunk ids are nondecreasing and gap-free up to the last chunk
        ids = [r["chunk_id"] for r in rows]
        assert ids == sorted(ids)
        assert set(ids) == set(range(ids[-1] + 1))


def test_hash_bucket_matches_md5_reference(spark):
    """The engine-portability contract of the whole sampling family:
    Spark's conv(substr(md5(id),1,8),16,10) % 1000 must equal the
    plain-Python (and hence any engine's) md5 bucket for the same id."""
    import hashlib

    ids = list(range(200)) + [10**6, 10**12, 9_999_999_999_999]
    from openmrs_module_mamba_etl_spark.llm.sampling import hash_bucket

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["bucket"]
        for r in df.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("bucket")
        ).collect()
    }
    for i in ids:
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000
        assert got[i] == want, i


def test_temperature_rates_anchor_and_monotone(spark):
    from openmrs_module_mamba_etl_spark.llm.sampling import temperature_rates

    rows = (
        [(i, "big") for i in range(400)]
        + [(i + 1000, "mid") for i in range(100)]
        + [(i + 2000, "small") for i in range(25)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {
        r["lang"]: r["rate_pm"]
        for r in temperature_rates(df, "lang", alpha=0.5).collect()
    }
    # smallest stratum keeps everything; rates fall as strata grow
    assert rates["small"] == 1000
    assert rates["mid"] == 500   # sqrt(25/100)=0.5 exactly
    assert rates["big"] == 250   # sqrt(25/400)=0.25 exactly
    assert rates["big"] < rates["mid"] < rates["small"]


def test_quantize_int8_range_and_extremes(spark):
    from openmrs_module_mamba_etl_spark.functions.similarity import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["q8"]
        for r in df.select(
            "vec_id", quantize_int8(F.col("embedding")).alias("q8")
        ).collect()
    }
    assert out[1] == [64, -127, 32, 0]  # max|x| maps to ±127, rest scale
    assert out[2] == [0, 0]  # zero vector → zeros, no div-by-zero
    assert all(-127 <= v <= 127 for v in out[1])


def test_mixture_rates_survive_large_quotas(spark):
    """1000 * quota must be 64-bit: web-corpus-scale target_rows used to
    overflow int32 and silently zero out large strata (legacy mode) or
    throw (ANSI)."""
    from openmrs_module_mamba_etl_spark.llm.sampling import mixture_rates

    df = spark.createDataFrame([("a",), ("b",)], "src string")
    rates = {
        r["src"]: r["rate_pm"]
        for r in mixture_rates(
            df, "src", {"a": 1, "b": 1}, target_rows=6_000_000
        ).collect()
    }
    assert rates == {"a": 1000, "b": 1000}


def test_firstfit_pack_invariants(spark):
    """FFD packing: capacity never exceeded (except single oversized
    items alone in their bin), every item assigned exactly once, and bin
    count beats naive one-item-per-chunk."""
    from collections import defaultdict

    from openmrs_module_mamba_etl_spark.llm.sampling import firstfit_pack

    rows = [(i, 10 + (i * 37) % 200) for i in range(300)] + [(999, 500)]
    df = spark.createDataFrame(rows, "doc_id long, n long")
    out = firstfit_pack(df, "doc_id", "n", capacity=256, n_shards=8).collect()
    assert len(out) == len(rows)  # every item exactly once
    fill = defaultdict(list)
    for r in out:
        fill[(r["shard"], r["bin_id"])].append(r["size"])
    for sizes in fill.values():
        assert sum(sizes) <= 256 or len(sizes) == 1  # oversized sits alone
    assert len(fill) < len(rows)  # actually packs
    # determinism across runs
    again = firstfit_pack(df, "doc_id", "n", capacity=256, n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_firstfit_pack_string_ids(spark):
    """The applyInPandas output schema must inherit the id column's type
    from the input — string doc ids packed fine in pandas but died on the
    hardcoded `long` schema."""
    from openmrs_module_mamba_etl_spark.llm.sampling import firstfit_pack

    df = spark.createDataFrame(
        [(f"doc-{i}", (i * 37) % 100 + 1) for i in range(40)],
        "doc_id string, n int",
    )
    out = firstfit_pack(df, "doc_id", "n", capacity=128, n_shards=4).collect()
    assert len(out) == 40
    assert {type(r["doc_id"]) for r in out} == {str}
    # per-(shard, bin) capacity respected
    used = {}
    for r in out:
        used[(r["shard"], r["bin_id"])] = used.get(
            (r["shard"], r["bin_id"]), 0
        ) + r["size"]
    assert all(v <= 128 for v in used.values())
