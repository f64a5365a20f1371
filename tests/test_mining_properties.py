"""Property-based tests for round-5 kernel math (pure Python, no Spark).

These pin the INVARIANTS the registered queries rely on, over randomized
inputs — the specific-value tests live next to each query; here
hypothesis sweeps the input space.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from openmrs_module_mamba_etl_spark.llm.multimodal import _dhash64
from openmrs_module_mamba_etl_spark.llm.png import encode_png


# --- dHash: re-encoding invariance + range --------------------------------


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=4, max_value=24),
    h=st.integers(min_value=3, max_value=20),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    f1=st.integers(min_value=0, max_value=4),
    f2=st.integers(min_value=0, max_value=4),
)
def test_dhash_invariant_under_png_filter_choice(w, h, seed, f1, f2):
    """The perceptual hash is a pure function of the PIXELS: any PNG
    scanline-filter encoding of the same raster hashes identically, and
    the result is a valid signed 64-bit value."""
    import random

    rgb = bytes(random.Random(seed).randrange(256) for _ in range(w * h * 3))
    h1 = _dhash64(encode_png(w, h, rgb, f1))
    h2 = _dhash64(encode_png(w, h, rgb, f2))
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


# --- HDR log-bucket math: one-sided bound + monotonicity ------------------


def _hdr_bucket(cents: int) -> tuple[int, int]:
    """Reference reimplementation of the agg_hdr_histogram bucket math
    (msb via bit_length, 8 sub-buckets per octave, values below 8 clamped
    into the first full octave — mirrors the production GREATEST(cents, 8))
    → (bucket, lb)."""
    c = max(cents, 8)
    msb = c.bit_length() - 1
    sub = c >> (msb - 3)
    return msb * 8 + sub - 8, sub << (msb - 3)


@settings(max_examples=200, deadline=None)
@given(cents=st.integers(min_value=8, max_value=10**15))
def test_hdr_bucket_bound_and_membership(cents):
    """Every value lands in a bucket whose lower bound is within 12.5%
    below it: lb ≤ v < lb·(1+1/8) — the relative-error contract the
    percentile estimates inherit."""
    _, lb = _hdr_bucket(cents)
    assert lb <= cents
    assert cents < lb + (lb >> 3) + 1  # lb * 9/8, integer-safe


@settings(max_examples=50, deadline=None)
@given(cents=st.integers(min_value=0, max_value=7))
def test_hdr_bucket_clamps_small_values(cents):
    """cents < 8 (where a raw ``>> (msb-3)`` would be a negative shift —
    engine-divergent) route to the first full octave's floor bucket."""
    assert _hdr_bucket(cents) == _hdr_bucket(8)
    assert _hdr_bucket(cents)[1] == 8


@settings(max_examples=100, deadline=None)
@given(
    a=st.integers(min_value=0, max_value=10**12),
    b=st.integers(min_value=0, max_value=10**12),
)
def test_hdr_bucket_monotone(a, b):
    """Bucket index (and its lower bound) is monotone in the value — the
    property that makes cumulative-count quantile reads correct."""
    if a > b:
        a, b = b, a
    ba, la = _hdr_bucket(a)
    bb, lb = _hdr_bucket(b)
    assert ba <= bb
    assert la <= lb


# --- bitmap block math: popcount ≡ distinct -------------------------------


@settings(max_examples=100, deadline=None)
@given(ids=st.sets(st.integers(min_value=0, max_value=10_000), max_size=300))
def test_bitmap_words_popcount_equals_distinct(ids):
    """OR-ing per-block words over any multiset of ids (order/duplication
    free) yields popcount sum == |distinct ids| — the agg_bitmap_distinct
    / stream_bitmap_distinct core, with the portable 63-bit block
    width."""
    words: dict[int, int] = {}
    for i in list(ids) * 2:  # duplicates must be absorbed
        words[i // 63] = words.get(i // 63, 0) | (1 << (i % 63))
    assert sum(bin(w).count("1") for w in words.values()) == len(ids)
