"""Property tests for the pure-python media codecs (no Spark needed):
encode→decode must round-trip for ANY size/content, not just the fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from openmrs_module_mamba_etl_spark.llm.png import decode_png, encode_png
from openmrs_module_mamba_etl_spark.llm.wav import decode_wav, encode_wav
from openmrs_module_mamba_etl_spark.llm.y4m import decode_y4m, encode_y4m


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, ft, seed):
    rgb = (
        np.random.default_rng(seed)
        .integers(0, 256, size=w * h * 3, dtype=np.uint8)
        .tobytes()
    )
    assert decode_png(encode_png(w, h, rgb, filter_type=ft)) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(0, 5000),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_property(n, rate, seed):
    samples = (
        np.random.default_rng(seed)
        .integers(-32768, 32768, size=n)
        .astype(np.int16)
    )
    r, back = decode_wav(encode_wav(rate, samples))
    assert r == rate
    assert np.array_equal(
        np.rint(back * 32768.0).astype(np.int16), samples
    )


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    n_frames=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_y4m_roundtrip_property(w, h, n_frames, seed):
    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    ]
    rw, rh, _fps, back = decode_y4m(encode_y4m(w, h, frames))
    assert (rw, rh, len(back)) == (w, h, n_frames)
    for orig, dec in zip(frames, back):
        a = np.frombuffer(orig, dtype=np.uint8).astype(np.int16)
        b = np.frombuffer(dec, dtype=np.uint8).astype(np.int16)
        # YUV444 double transform: integer rounding error bounded by ±2
        assert np.abs(a - b).max() <= 2


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    n_colors=st.integers(2, 16),
    n_frames=st.integers(1, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, n_colors, n_frames, seed):
    from openmrs_module_mamba_etl_spark.llm.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = [tuple(int(x) for x in rng.integers(0, 256, 3)) for _ in range(n_colors)]
    idx_frames = [
        rng.integers(0, n_colors, size=w * h, dtype=np.uint8).tobytes()
        for _ in range(n_frames)
    ]
    rw, rh, frames = decode_gif(encode_gif(w, h, pal, idx_frames))
    assert (rw, rh, len(frames)) == (w, h, n_frames)
    for idx, rgb in zip(idx_frames, frames):
        assert rgb == b"".join(bytes(pal[i]) for i in idx)


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    quality=st.integers(70, 95),
    subsample=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_flat_blocks_near_exact_property(w, h, quality, subsample, seed):
    """Per-8x8-flat content survives the lossy round trip within a small
    bound at any size/quality/subsampling — incl. odd dims (edge pad)."""
    from openmrs_module_mamba_etl_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    color = rng.integers(30, 226, size=3)
    rgb = np.tile(color.astype(np.uint8), (h, w, 1))
    rw, rh, raw = decode_jpeg(
        encode_jpeg(w, h, rgb.tobytes(), quality=quality, subsample=subsample)
    )
    assert (rw, rh) == (w, h)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)
    assert np.abs(out - rgb.astype(np.int16)).max() <= 3


@settings(max_examples=10, deadline=None)
@given(
    w=st.integers(8, 40),
    h=st.integers(8, 40),
    restart=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_noise_roundtrip_bounded_property(w, h, restart, seed):
    """Arbitrary noise must decode to the same dims with bounded error —
    JPEG is lossy, but a correct codec pair stays within the quantizer's
    worst case; restart markers must not desynchronize the scan."""
    from openmrs_module_mamba_etl_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    data = encode_jpeg(
        w, h, rgb.tobytes(), quality=95, restart_interval=restart
    )
    rw, rh, raw = decode_jpeg(data)
    assert (rw, rh) == (w, h)
    out = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(np.int16)
    # quality-95 worst case on noise: quant steps are small but chroma
    # error can still reach a few tens of levels on adversarial blocks
    assert np.abs(out - rgb.astype(np.int16)).mean() < 12


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 3000),
    rate=st.sampled_from([8000, 16000, 44100]),
    amp=st.floats(0.05, 0.9),
    freq=st.integers(50, 2000),
)
def test_adpcm_roundtrip_property(n, rate, amp, freq):
    """IMA ADPCM is lossy but must track a signal within its slope
    capacity closely: exact sample count back (fact chunk), bounded RMS
    error, exact first sample (stored verbatim in each block header).
    The tight bound applies inside the codec's design band (per-sample
    delta ≪ full scale); near-Nyquist full-scale content is inherent
    slope overload for ANY 4-bit ADPCM, where only graceful degradation
    is required (see the companion test)."""
    from openmrs_module_mamba_etl_spark.llm.wav import (
        decode_wav,
        encode_wav_adpcm,
        is_wav,
    )

    t = np.arange(n) / rate
    sig = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    data = encode_wav_adpcm(rate, sig)
    assert is_wav(data)
    r, out = decode_wav(data)
    assert r == rate and len(out) == n
    assert out[0] == sig[0] / 32768.0
    err = out - sig.astype(np.float64) / 32768.0
    # max per-sample slope of the input, normalized to [-1, 1] scale
    max_delta = 2.0 * amp * np.sin(np.pi * min(freq / rate, 0.5))
    if max_delta <= 0.25:  # inside the tracking band
        assert np.sqrt((err**2).mean()) < 0.08
    else:  # slope overload: error stays bounded by the signal itself
        assert np.sqrt((err**2).mean()) < max(0.15, amp * 0.5)


def test_adpcm_slope_overload_degrades_gracefully():
    """A near-Nyquist full-scale tone exceeds 4-bit ADPCM slope capacity
    by construction; the decode must remain stable (no divergence, error
    bounded by the signal), never blow up."""
    from openmrs_module_mamba_etl_spark.llm.wav import (
        decode_wav,
        encode_wav_adpcm,
    )

    rate, n = 8000, 2000
    t = np.arange(n) / rate
    sig = (0.9 * np.sin(2 * np.pi * 1911 * t) * 32767).astype(np.int16)
    r, out = decode_wav(encode_wav_adpcm(rate, sig))
    assert r == rate and len(out) == n
    assert np.abs(out).max() <= 1.0
    err = out - sig.astype(np.float64) / 32768.0
    assert np.sqrt((err**2).mean()) < 0.45  # bounded, not divergent


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(1, 2000),
    rate=st.sampled_from([8000, 16000]),
    amp=st.floats(0.02, 0.95),
    freq=st.integers(50, 1500),
)
def test_mulaw_roundtrip_property(n, rate, amp, freq):
    """G.711 mu-law: exact sample count back, logarithmic quantization
    error — relative error bounded for every sample (the G.711 SNR
    guarantee), tiny RMS on band-limited signals."""
    from openmrs_module_mamba_etl_spark.llm.wav import (
        decode_wav,
        encode_wav_mulaw,
    )

    t = np.arange(n) / rate
    sig = (amp * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    r, out = decode_wav(encode_wav_mulaw(rate, sig))
    assert r == rate and len(out) == n
    err = np.abs(out * 32768.0 - np.clip(sig, -32635, 32635))
    # mu-law segment size: quantization step ~ (|x|+132)/16 per segment
    bound = (np.abs(sig.astype(np.float64)) + 132.0) / 16.0 + 4.0
    assert (err <= bound).all()
