"""Perceptual-hash (dHash) contract tests.

Pins the bit-level kernel (llm/multimodal.py:_dhash64) and the invariant
the rows-only multimodal_phash_dedup query publishes: PNG re-encodings of
the same pixels share a phash while their byte digests differ.
"""

from __future__ import annotations

import hashlib

from openmrs_module_mamba_etl_spark.llm.multimodal import _dhash64
from openmrs_module_mamba_etl_spark.llm.png import encode_png


def _gradient_rgb(w: int, h: int) -> bytes:
    # Strictly increasing luminance left-to-right: every dHash bit is 1.
    return bytes(
        min(255, x * 255 // max(1, w - 1))
        for y in range(h)
        for x in range(w)
        for _ in range(3)
    )


def test_dhash_all_ones_on_increasing_gradient():
    png = encode_png(18, 16, _gradient_rgb(18, 16))
    # 64 comparison bits all "left < right" → unsigned 2^64-1 → signed -1.
    assert _dhash64(png) == -1


def test_dhash_all_zeros_on_constant_image():
    png = encode_png(18, 16, bytes([128]) * (18 * 16 * 3))
    assert _dhash64(png) == 0


def test_filter_variants_same_phash_different_sha():
    rgb = bytes((x * 7 + y * 13) % 256 for y in range(8) for x in range(12) for _ in range(3))
    variants = [encode_png(12, 8, rgb, ftype) for ftype in (0, 1, 2, 3, 4)]
    shas = {hashlib.sha256(v).hexdigest() for v in variants}
    hashes = {_dhash64(v) for v in variants}
    assert len(shas) >= 2, "filter variants should produce distinct bytes"
    assert len(hashes) == 1, "same pixels must share one phash"


def test_different_images_different_phash():
    up = encode_png(18, 16, _gradient_rgb(18, 16))
    down = encode_png(
        18,
        16,
        bytes(
            min(255, (17 - x) * 255 // 17)
            for y in range(16)
            for x in range(18)
            for _ in range(3)
        ),
    )
    assert _dhash64(up) != _dhash64(down)


def test_phash_dedup_groups_reencodings(spark, sf_dir):
    from openmrs_module_mamba_etl_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["multimodal_phash_dedup"](spark, sf_dir).collect()
    assert rows, "sampled corpus must produce at least one group"
    for r in rows:
        # every group carries both filter-variant encodings of its image:
        # ≥2 members, and ≥2 byte-distinct payloads collapsed perceptually
        assert r.n_copies >= 2
        assert r.n_distinct_bytes >= 2
        assert r.n_copies >= r.n_distinct_bytes
