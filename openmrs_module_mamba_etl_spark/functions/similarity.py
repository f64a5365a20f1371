"""Vector / set similarity primitives as JVM-side Column expressions.

Everything here is built from higher-order functions (``zip_with`` /
``aggregate`` / ``transform``) so the hot path stays inside whole-stage
codegen — no Python UDFs. These primitives back dedup (llm/dedup.py) and
ANN search (llm/ann.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, functions as F


def bind(value: Column, body: Callable[[Column], Column]) -> Column:
    """Single-evaluation let-binding for Column expressions.

    Higher-order functions (``filter``/``transform``/``aggregate``) are
    CodegenFallback expressions: a subexpression that appears k times in
    one projection is re-evaluated at every occurrence — codegen
    subexpression elimination never sees it. For an O(n) pipeline like
    ``tokens(text)`` referenced from several score terms that multiplies
    the per-row cost by k (measured 2-3× on text_quality at sf0.1).

    ``transform`` over a one-element array evaluates ``value`` exactly
    once and hands it to ``body`` as a lambda VARIABLE (an O(1) slot
    lookup per reference); ``[0]`` unwraps the result. The optimizer has
    no rule that re-inlines a lambda variable, so the single evaluation
    survives planning (r13 plan audit: one ``split(...)`` occurrence in
    the optimized projection, vs ~10 before). Values are unchanged —
    ``body`` receives exactly the Column it previously recomputed.
    """
    return F.transform(F.array(value), body)[0]


def portable_hash60(s: Column) -> Column:
    """60-bit deterministic hash of a string column, engine-portable.

    First 15 hex chars of md5 → bigint. The DuckDB twin is one line:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT`` — the same md5 contract the
    sampling family uses (llm/sampling.py:hash_bucket), extended to 60 bits
    so MinHash minima have negligible collision mass. Codegen-side (md5 +
    conv are JVM built-ins); ~3-4× slower than xxhash64, so the xxhash64
    family stays the default for production signatures and this one backs
    the oracle-checked ``*_portable`` query variants.
    """
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def portable_hash32(s: Column) -> Column:
    """32-bit sibling of :func:`portable_hash60` (first 8 hex chars):
    DuckDB ``('0x' || substr(md5(s), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm vectors instead of NaN/null."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens (empty-string safe)."""
    t = F.split(F.lower(F.trim(text)), r"\s+")
    return F.filter(t, lambda x: x != "")


def word_shingles_of(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles over an already-bound token array
    (see ``bind``) — single-scan composites tokenize once and derive
    shingles, hashes and scores from the same bound array."""
    count = F.size(toks) - F.lit(n - 1)
    return F.array_distinct(
        F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column.

    Built as transform over token-start offsets + slice/join — stays in
    codegen, no explode needed until the caller wants posting lists.
    """
    # bind(): tokens(text) is referenced three times (count, slices,
    # short-doc fallback) — evaluate the tokenizer once per row.
    return bind(tokens(text), lambda toks: word_shingles_of(toks, n))


def word_ngrams(text: Column, n: int) -> Column:
    """ALL word n-grams in order (duplicates kept, empty if < n tokens) —
    the multiset form repetition statistics need; :func:`word_shingles`
    is the distinct-set form posting lists need."""
    def from_toks(toks: Column) -> Column:
        count = F.size(toks) - F.lit(n - 1)
        return F.when(
            count > 0,
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return bind(tokens(text), from_toks)  # tokenize once, not 3× (see bind)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed, min over shingle xxhash64(shingle, seed).

    xxhash64 is Spark's stable 64-bit hash (same value on every executor,
    every run) so signatures are reproducible cluster-wide.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: F.xxhash64(s, F.lit(seed)))
            ).alias(f"mh_{seed}")
            for seed in range(num_hashes)
        ]
    )


def band_hashes(
    signature: Column,
    bands: int,
    rows_per_band: int,
    portable: bool = False,
) -> Column:
    """LSH banding: hash each band of the signature to one bucket key.

    Returns array<struct<band:int, bucket:bigint>> — explode + group on
    (band, bucket) turns near-duplicate detection into an equi-join, which
    Spark shuffles/hash-joins like any other key: the O(n²) pair space never
    materializes.

    ``portable=True`` swaps xxhash64 for the md5 contract
    (:func:`portable_hash60` over ``"<band>|<v1,v2,...>"``) so a DuckDB
    oracle can reproduce the buckets bit-for-bit.
    """

    def bucket(b: Column) -> Column:
        joined = F.array_join(
            F.transform(
                F.slice(signature, b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
            ",",
        )
        if portable:
            return portable_hash60(
                F.concat(b.cast("string"), F.lit("|"), joined)
            )
        return F.xxhash64(joined, b)

    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"), bucket(b).alias("bucket")
        ),
    )


def simhash_bits(
    text: Column, n_bits: int = 64, portable: bool = False
) -> Column:
    """SimHash: per-bit signed token-hash votes → array<int> of 0/1 bits.

    One fold over tokens accumulating 64 counters, all in codegen. The bit
    array form (instead of a packed long) keeps hamming distance expressible
    as a zip_with/aggregate, avoiding 64-bit sign pitfalls.

    ``portable=True`` hashes tokens with the 32-bit md5 contract
    (:func:`portable_hash32`; pass ``n_bits=32``) so DuckDB can replay the
    votes — integer arithmetic only, so the replay is exact.

    Measured note: an Arrow/numpy kernel for this fold (token hashes
    JVM-side, vote matrix in numpy) is SLOWER — 4.3s vs 3.3s warm on 50k
    docs × 200 tokens — because shipping every token hash over Arrow costs
    more than the fold saves. Keep this expression form.
    """
    # Hash each token ONCE up front — folding over raw tokens would
    # re-evaluate the hash inside every one of the n_bits bit lambdas.
    if portable:
        hashes = F.transform(tokens(text), lambda t: portable_hash32(t))
    else:
        hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))
    bit_votes = lambda h: F.transform(  # noqa: E731 — per-hash ±1 votes
        F.sequence(F.lit(0), F.lit(n_bits - 1)),
        lambda j: F.when(F.bit_get(h, j) == 1, F.lit(1)).otherwise(F.lit(-1)),
    )
    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), n_bits),
        lambda acc, h: F.zip_with(acc, bit_votes(h), lambda a, b: a + b),
    )
    return F.transform(counts, lambda c: F.when(c > 0, 1).otherwise(0))


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bit arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def pack_bit_bands(bits: Column, bands: int, n_bits: int = 64) -> Column:
    """Pack a bit array into ``bands`` integer band-keys for hamming LSH.

    Two signatures within hamming distance < bands share ≥1 identical band
    (pigeonhole), so an equi-join on (band, value) finds all candidates.
    """
    per = n_bits // bands
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.aggregate(
                F.slice(bits, b * per + 1, per),
                F.lit(0),
                lambda acc, x: acc * 2 + x,
            ).alias("value"),
        ),
    )


def quantize_int8(vec: Column) -> Column:
    """Symmetric int8 scalar quantization of an array<float> column:
    ``q_i = round(x_i * 127 / max|x|)``, zero vectors map to zeros.

    4x storage compression for embedding retention at corpus scale; the
    dequantized dot product differs from exact by O(1/127) per term,
    fine for candidate generation (re-rank exact on the short list).
    Pure JVM expression (transform + fold), codegen-side; deterministic,
    so the quantized table is reproducible across engines — the SQL twin
    is list_transform with the same round(x * 127 / list_max(|x|)).
    """
    max_abs = F.aggregate(
        vec,
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )

    def from_max(m: Column) -> Column:
        return F.when(
            m > 0,
            F.transform(
                vec,
                lambda x: F.round(x.cast("double") * 127.0 / m).cast("int"),
            ),
        ).otherwise(F.transform(vec, lambda x: F.lit(0)))

    # bind(): the max|x| fold previously sat INSIDE the per-element
    # lambda — an O(dim) scan re-run for every element, O(dim²) per row.
    # One evaluation per row restores the intended O(dim).
    return bind(max_abs, from_max)
