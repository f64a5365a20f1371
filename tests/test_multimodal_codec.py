"""Real-codec path for the multimodal seam: pure-python PNG codec +
decode/resize kernels, exercised BOTH ways (fake and real) through the
same mapInPandas plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from openmrs_module_mamba_etl_spark.llm.multimodal import (
    MEDIA_SCHEMA,
    _decode_rgb,
    decode_images,
    resize_images,
)
from openmrs_module_mamba_etl_spark.llm.png import (
    decode_png,
    encode_png,
    is_png,
    resize_nearest,
)


def _rgb(w: int, h: int, seed: int = 7) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_all_filters(filter_type):
    w, h = 13, 9  # odd sizes catch stride bugs
    rgb = _rgb(w, h)
    data = encode_png(w, h, rgb, filter_type=filter_type)
    assert is_png(data)
    rw, rh, back = decode_png(data)
    assert (rw, rh) == (w, h)
    assert back == rgb


def test_png_rejects_garbage():
    assert not is_png(b"JFIF not a png")
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")


def test_png_crc_checked():
    data = bytearray(encode_png(4, 4, _rgb(4, 4)))
    data[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_resize_nearest_reference():
    w, h = 4, 2
    rgb = _rgb(w, h, seed=3)
    out = resize_nearest(w, h, rgb, 2, 1)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    expect = px[[0]][:, [0, 2]].tobytes()  # ys=[0], xs=[0,2]
    assert out == expect


def _media_df(spark, images: dict[int, bytes]):
    rows = [
        (mid, content, "image/png", f"synthetic://{mid}")
        for mid, content in images.items()
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_images_real_path(spark):
    imgs = {
        1: encode_png(20, 10, _rgb(20, 10, seed=1)),
        2: encode_png(8, 8, _rgb(8, 8, seed=2), filter_type=4),
    }
    out = {
        r["media_id"]: r
        for r in decode_images(_media_df(spark, imgs), n_features=16, fake=False)
        .collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (20, 10)
    assert (out[2]["width"], out[2]["height"]) == (8, 8)
    assert len(out[1]["features"]) == 16
    assert all(0.0 <= f <= 1.0 for f in out[1]["features"])
    # real features depend on pixels, not payload hash: two encodings of
    # the SAME pixels (different filter) must give identical features
    same_px = encode_png(8, 8, _rgb(8, 8, seed=2), filter_type=0)
    out2 = (
        decode_images(_media_df(spark, {3: same_px}), n_features=16, fake=False)
        .first()
    )
    assert out2["features"] == out[2]["features"]


def test_decode_images_fake_path_still_deterministic(spark):
    imgs = {1: b"any payload at all"}
    a = decode_images(_media_df(spark, imgs), fake=True).first()
    b = decode_images(_media_df(spark, imgs), fake=True).first()
    assert (a["width"], a["height"], a["features"]) == (
        b["width"],
        b["height"],
        b["features"],
    )


def test_resize_images_real_path(spark):
    w, h = 10, 6
    rgb = _rgb(w, h, seed=5)
    imgs = {1: encode_png(w, h, rgb)}
    row = resize_images(_media_df(spark, imgs), width=4, height=4, fake=False).first()
    assert len(row["content"]) == 4 * 4 * 3
    assert bytes(row["content"]) == resize_nearest(w, h, rgb, 4, 4)


def test_non_png_without_pil_raises_at_seam():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available — the non-PNG fallback seam is inactive")
    except ImportError:
        pass
    # JPEG magic now routes to the pure-python JPEG decoder, which rejects
    # a malformed payload with its ValueError contract
    with pytest.raises(ValueError):
        _decode_rgb(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    # formats with no codec (e.g. WebP) still raise at the honest seam
    with pytest.raises(NotImplementedError, match="non-PNG"):
        _decode_rgb(b"RIFF\x00\x00\x00\x00WEBPVP8 ")


def test_png_rgba_alpha_dropped():
    # hand-build a 2x1 RGBA PNG via the codec's own chunk writer
    import struct
    import zlib

    from openmrs_module_mamba_etl_spark.llm.png import PNG_SIGNATURE, _chunk

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    raw = bytes([0, 10, 20, 30, 255, 40, 50, 60, 128])
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, rgb = decode_png(data)
    assert (w, h) == (2, 1)
    assert rgb == bytes([10, 20, 30, 40, 50, 60])


def test_wav_roundtrip():
    from openmrs_module_mamba_etl_spark.llm.wav import (
        decode_wav,
        encode_wav,
        is_wav,
    )

    rng = np.random.default_rng(11)
    samples = rng.integers(-32768, 32767, size=1601, dtype=np.int16)
    data = encode_wav(16000, samples)
    assert is_wav(data)
    rate, back = decode_wav(data)
    assert rate == 16000
    assert np.allclose(back * 32768.0, samples.astype(np.float64))


def test_wav_stereo_downmix():
    import struct

    from openmrs_module_mamba_etl_spark.llm.wav import decode_wav

    # hand-build a 2-channel WAV: L=[1000, -1000], R=[3000, 1000]
    pcm = np.array([1000, 3000, -1000, 1000], dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ", 16, 1, 2,
        8000, 8000 * 4, 4, 16, b"data", len(pcm),
    )
    rate, mono = decode_wav(hdr + pcm)
    assert rate == 8000
    assert np.allclose(mono * 32768.0, [2000.0, 0.0])


def test_wav_rejects_non_pcm():
    from openmrs_module_mamba_etl_spark.llm.wav import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3 not a wav at all........")


def test_frame_energies_shape():
    from openmrs_module_mamba_etl_spark.llm.wav import frame_energies

    e = frame_energies(np.ones(100), 8)
    assert len(e) == 8 and all(abs(x - 1.0) < 1e-12 for x in e)
    assert frame_energies(np.array([]), 4) == [0.0] * 4


def test_audio_real_path_on_spark(spark):
    from openmrs_module_mamba_etl_spark.llm.multimodal import (
        extract_audio_features,
    )
    from openmrs_module_mamba_etl_spark.llm.wav import encode_wav

    samples = np.zeros(24000, dtype=np.int16)
    media = spark.createDataFrame(
        [(1, encode_wav(12000, samples), "audio/wav", "s://1")],
        MEDIA_SCHEMA,
    )
    row = extract_audio_features(media, n_mfcc=5, fake=False).first()
    assert row["sample_rate"] == 12000
    assert row["duration_ms"] == 2000
    assert len(row["mfcc"]) == 5


def test_audio_non_wav_without_codec_raises_at_seam():
    from openmrs_module_mamba_etl_spark.llm.multimodal import (
        extract_audio_features,
    )

    # exercise the kernel directly (the seam contract, no Spark job)
    import inspect

    src = inspect.getsource(extract_audio_features)
    assert "NotImplementedError" in src  # the seam is still honest


def test_y4m_roundtrip():
    from openmrs_module_mamba_etl_spark.llm.y4m import (
        decode_y4m,
        encode_y4m,
        is_y4m,
    )

    w, h = 6, 4
    frames = [_rgb(w, h, seed=s) for s in (1, 2, 3)]
    data = encode_y4m(w, h, frames, fps=30)
    assert is_y4m(data)
    rw, rh, fps, back = decode_y4m(data)
    assert (rw, rh, fps, len(back)) == (w, h, 30, 3)
    # YUV444 round trip is lossy by at most the integer rounding of the
    # two color transforms: every channel within ±2
    for orig, dec in zip(frames, back):
        a = np.frombuffer(orig, dtype=np.uint8).astype(np.int16)
        b = np.frombuffer(dec, dtype=np.uint8).astype(np.int16)
        assert np.abs(a - b).max() <= 2


def test_y4m_rejects_non_y4m():
    from openmrs_module_mamba_etl_spark.llm.y4m import decode_y4m

    with pytest.raises(ValueError, match="magic"):
        decode_y4m(b"RIFF....WAVE not video")


def test_sample_frames_real_path(spark):
    from openmrs_module_mamba_etl_spark.llm.multimodal import sample_frames
    from openmrs_module_mamba_etl_spark.llm.y4m import encode_y4m

    w, h = 4, 4
    vid = encode_y4m(w, h, [_rgb(w, h, seed=s) for s in range(5)])
    media = spark.createDataFrame(
        [(1, vid, "video/x-yuv4mpeg", "s://v1")], MEDIA_SCHEMA
    )
    rows = sample_frames(media, max_frames=3, fake=False).collect()
    assert len(rows) == 3
    assert sorted(r["frame_index"] for r in rows) == [0, 1, 2]
    assert all(len(r["frame_bytes"]) == w * h * 3 for r in rows)


def test_sample_frames_fake_path_unchanged(spark):
    from openmrs_module_mamba_etl_spark.llm.multimodal import sample_frames

    media = spark.createDataFrame(
        [(1, b"x" * 3000, "application/octet-stream", "s://f")],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(media, every_n_bytes=1024, max_frames=8).collect()
    assert len(rows) == 2  # 3000 // 1024


def _palette():
    return [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def test_gif_roundtrip_multiframe():
    from openmrs_module_mamba_etl_spark.llm.gif import decode_gif, encode_gif, is_gif

    w, h = 7, 5
    pal = _palette()
    rng = np.random.default_rng(3)
    idx_frames = [
        rng.integers(0, len(pal), size=w * h, dtype=np.uint8).tobytes()
        for _ in range(3)
    ]
    data = encode_gif(w, h, pal, idx_frames)
    assert is_gif(data)
    rw, rh, frames = decode_gif(data)
    assert (rw, rh, len(frames)) == (w, h, 3)
    for idx, rgb in zip(idx_frames, frames):
        expect = b"".join(bytes(pal[i]) for i in idx)
        assert rgb == expect


def test_gif_lzw_kwkwk_case():
    """The code==next_code (KwKwK) branch: stream [CLEAR, 1, 6] at
    min_code=2 must decode to pixels 1,1,1 — entry 6 is defined AS it is
    consumed."""
    from openmrs_module_mamba_etl_spark.llm.gif import _lzw_decode

    acc, nbits, out = 0, 0, bytearray()
    for code in (4, 1, 6, 5):  # clear, literal 1, KwKwK, EOI
        acc |= code << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    assert _lzw_decode(2, bytes(out), 3) == bytes([1, 1, 1])


def test_gif_large_frame_width_growth():
    # >2^width literals force CLEAR re-emission in the encoder and table
    # rebuilds in the decoder — a 64x64 frame crosses several cycles
    from openmrs_module_mamba_etl_spark.llm.gif import decode_gif, encode_gif

    w = h = 64
    pal = _palette()
    idx = (np.arange(w * h) % len(pal)).astype(np.uint8).tobytes()
    _, _, frames = decode_gif(encode_gif(w, h, pal, [idx]))
    assert frames[0] == b"".join(bytes(pal[i]) for i in idx)


def test_decode_images_gif_fallback(spark):
    from openmrs_module_mamba_etl_spark.llm.gif import encode_gif

    pal = _palette()
    idx = bytes([1, 2, 3, 4, 0, 1] * 4)  # 6x4
    gif = encode_gif(6, 4, pal, [idx])
    row = decode_images(
        _media_df(spark, {9: gif}), n_features=4, fake=False
    ).first()
    assert (row["width"], row["height"]) == (6, 4)


def test_sample_frames_gif_real_path(spark):
    from openmrs_module_mamba_etl_spark.llm.gif import encode_gif
    from openmrs_module_mamba_etl_spark.llm.multimodal import sample_frames

    pal = _palette()
    frames_idx = [bytes([i % len(pal)] * 12) for i in range(4)]  # 4x3 frames
    gif = encode_gif(4, 3, pal, frames_idx)
    media = spark.createDataFrame([(1, gif, "image/gif", "s://g")], MEDIA_SCHEMA)
    rows = sample_frames(media, max_frames=2, fake=False).collect()
    assert len(rows) == 2
    assert all(len(r["frame_bytes"]) == 4 * 3 * 3 for r in rows)


def test_gif_subrectangle_frame_composited():
    """Optimized animated GIFs ship partial-update frames: a 2x2 frame at
    offset (1,1) of a 4x4 screen must composite onto the accumulated
    canvas and still emit a full-screen RGB buffer."""
    import struct
    import zlib  # noqa: F401 — parity with sibling handmade-codec tests

    from openmrs_module_mamba_etl_spark.llm.gif import (
        _lzw_encode_literals,
        decode_gif,
        encode_gif,
    )

    pal = _palette()
    full = bytes([1] * 16)  # 4x4 all red
    data = bytearray(encode_gif(4, 4, pal, [full]))
    assert data[-1] == 0x3B
    del data[-1]
    # hand-append a 2x2 frame of color 2 at offset (1,1)
    data += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)
    min_code = max(2, (len(_palette()) - 1).bit_length())
    stream = _lzw_encode_literals(min_code, bytes([2, 2, 2, 2]))
    data.append(min_code)
    data.append(len(stream))
    data += stream
    data += bytes([0, 0x3B])
    w, h, frames = decode_gif(bytes(data))
    assert (w, h, len(frames)) == (4, 4, 2)
    assert len(frames[1]) == 4 * 4 * 3
    px = np.frombuffer(frames[1], dtype=np.uint8).reshape(4, 4, 3)
    assert tuple(px[0, 0]) == pal[1]  # untouched area keeps frame-1 color
    assert tuple(px[1, 1]) == pal[2]  # composited update
    assert tuple(px[2, 2]) == pal[2]
    assert tuple(px[3, 3]) == pal[1]


def test_gif_frame_exceeding_screen_rejected():
    import struct

    from openmrs_module_mamba_etl_spark.llm.gif import (
        _lzw_encode_literals,
        decode_gif,
        encode_gif,
    )

    pal = _palette()
    data = bytearray(encode_gif(2, 2, pal, [bytes([0] * 4)]))
    del data[-1]
    data += struct.pack("<BHHHHB", 0x2C, 1, 1, 2, 2, 0)  # overflows screen
    min_code = max(2, (len(pal) - 1).bit_length())
    stream = _lzw_encode_literals(min_code, bytes([0] * 4))
    data.append(min_code)
    data.append(len(stream))
    data += stream
    data += bytes([0, 0x3B])
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif(bytes(data))


def test_gif_truncated_raises_valueerror_everywhere():
    """A GIF cut at ANY byte offset must raise the decoder's ValueError
    contract, never a raw IndexError/struct.error from the block walk."""
    from openmrs_module_mamba_etl_spark.llm.gif import decode_gif, encode_gif

    pal = _palette()
    data = encode_gif(4, 3, pal, [bytes([1] * 12), bytes([2] * 12)])
    # prepend a graphic-control extension so the extension walk is exercised
    data = data[:13 + 3 * 8] + bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]) + data[13 + 3 * 8:]
    for cut in range(1, len(data)):
        truncated = data[:cut]
        try:
            decode_gif(truncated)
        except ValueError:
            pass  # the contract
        # any other exception type propagates and fails the test


def test_decode_rgb_prefers_pil_when_importable(monkeypatch):
    """The first branch of the _decode_rgb fallback chain (PIL) must win
    when PIL imports — proven here with a stub PIL module returning
    sentinel pixels distinguishable from the pure-python PNG path, so the
    branch is exercised even in containers without real Pillow."""
    import sys
    import types

    from openmrs_module_mamba_etl_spark.llm import png as pngc
    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    sentinel = bytes([9, 8, 7] * 4)  # 2x2 RGB unlike any encoded pixel

    class _StubImage:
        size = (2, 2)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return sentinel

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: _StubImage()
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    data = pngc.encode_png(2, 2, bytes([255, 0, 0] * 4))
    w, h, raw = _decode_rgb(data)
    assert (w, h) == (2, 2)
    assert raw == sentinel  # PIL branch won, not the pure-python codec


def test_decode_rgb_real_pillow_jpeg_roundtrip():
    """With REAL Pillow installed, _decode_rgb must decode a JPEG — the
    compressed-format seam that raises NotImplementedError in containers
    without PIL. Skips cleanly where Pillow is absent."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")

    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    im = PIL_Image.new("RGB", (8, 6), (200, 30, 30))
    buf = io.BytesIO()
    im.save(buf, format="JPEG")
    w, h, raw = _decode_rgb(buf.getvalue())
    assert (w, h) == (8, 6)
    assert len(raw) == 8 * 6 * 3


def test_jpeg_truncated_raises_valueerror_everywhere():
    """A JPEG cut at ANY byte offset must either raise ValueError (the
    header walk, segment parse, and entropy scan all bounds-check) or —
    only when the cut lands after the final MCU's entropy bits, losing
    just padding/EOI — still decode to the full correct dimensions. No
    other exception type may escape."""
    from openmrs_module_mamba_etl_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rgb = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(10)
        for x in range(9)
        for c in range(3)
    )
    data = encode_jpeg(9, 10, rgb, quality=90, restart_interval=1)
    for cut in range(1, len(data)):
        try:
            w, h, raw = decode_jpeg(data[:cut])
        except ValueError:
            continue  # the contract
        assert (w, h) == (9, 10) and len(raw) == 9 * 10 * 3


def test_jpeg_unsupported_process_rejected():
    """A coding process outside the supported subset (SOF3 lossless) must
    raise the documented seam error, not garbage output. (SOF2
    progressive used to live here — it is now supported.)"""
    from openmrs_module_mamba_etl_spark.llm.jpeg import decode_jpeg, encode_jpeg

    data = bytearray(encode_jpeg(8, 8, bytes(192), quality=90))
    idx = data.find(b"\xff\xc0")
    assert idx > 0
    data[idx + 1] = 0xC3  # lossless sequential
    with pytest.raises(ValueError, match="unsupported JPEG coding process"):
        decode_jpeg(bytes(data))


def test_jpeg_grayscale_single_component():
    """A 1-component (grayscale) baseline JPEG decodes to replicated-Y
    RGB — hand-build the file from the encoder's own segments."""
    import numpy as np

    from openmrs_module_mamba_etl_spark.llm import jpeg as J

    # build a grayscale JPEG by re-encoding only the Y plane
    w = h = 8
    gray = np.full((8, 8), 99.0)
    luma_q = J._quality_scale(J.STD_LUMA_Q, 90)
    dc_l = J._build_codes(J._DC_LUMA_BITS, J._DC_LUMA_VALS)
    ac_l = J._build_codes(J._AC_BITS, J._AC_SYMBOLS)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + bytes([0, 67, 0]) + bytes(
        int(luma_q[z]) for z in J.ZIGZAG
    )
    import struct

    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xc4" + struct.pack(">HB", 19 + 12, 0x00)
    out += bytes(J._DC_LUMA_BITS) + bytes(J._DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(J._AC_SYMBOLS), 0x10)
    out += bytes(J._AC_BITS) + bytes(J._AC_SYMBOLS)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    bw = J._BitWriter()
    J._encode_block(bw, gray, luma_q, dc_l, ac_l, 0)
    bw.flush()
    out += bw.out + b"\xff\xd9"
    rw, rh, raw = J.decode_jpeg(bytes(out))
    assert (rw, rh) == (8, 8)
    px = np.frombuffer(raw, dtype=np.uint8).reshape(8, 8, 3)
    assert abs(int(px[4, 4, 0]) - 99) <= 2
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 0] == px[..., 2]).all()


def test_jpeg_pillow_interop_both_directions():
    """With real Pillow installed: our files decode in PIL, PIL's files
    decode here (tables ship in the file). Skips cleanly without PIL."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.jpeg import decode_jpeg, encode_jpeg

    rgb = np.full((16, 24, 3), (120, 200, 40), dtype=np.uint8)
    ours = encode_jpeg(24, 16, rgb.tobytes(), quality=92, subsample=True)
    with PIL_Image.open(io.BytesIO(ours)) as im:
        assert im.size == (24, 16)
        theirs = np.asarray(im.convert("RGB")).astype(np.int16)
    assert np.abs(theirs - rgb.astype(np.int16)).max() <= 4

    buf = io.BytesIO()
    PIL_Image.fromarray(rgb).save(buf, format="JPEG", quality=92)
    w, h, raw = decode_jpeg(buf.getvalue())
    ours_dec = np.frombuffer(raw, dtype=np.uint8).reshape(16, 24, 3).astype(np.int16)
    assert (w, h) == (24, 16)
    assert np.abs(ours_dec - rgb.astype(np.int16)).max() <= 4


def test_jpeg_progressive_roundtrip_identical_to_sequential():
    """Progressive (SOF2, spectral selection) must decode to bit-identical
    pixels as the sequential encoding at the same quality — only the
    entropy-coded ordering differs. Covers 4:4:4, 4:2:0, odd dims (spec
    block grid smaller than the padded MCU grid)."""
    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(23)
    for w, h, sub in [(24, 16, False), (19, 13, True), (33, 7, True)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        seq = decode_jpeg(encode_jpeg(w, h, rgb, quality=88, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, rgb, quality=88, subsample=sub)
        )
        assert seq == prog


def test_jpeg_successive_approximation_roundtrip():
    """The Ah/Al successive-approximation scan script (the shape real
    progressive encoders emit) must decode bit-identical to the
    sequential encoding — point transforms refine losslessly. Sparse and
    smooth content exercises the long-EOBRUN + buffered-correction-bit
    paths of both coder and decoder."""
    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(41)
    flat = np.full((24, 40, 3), (120, 60, 200), dtype=np.uint8)
    spot = flat.copy()
    spot[11, 21] = (255, 255, 255)
    noise = rng.integers(0, 256, size=(13, 19, 3), dtype=np.uint8)
    for img, q, sub in [
        (flat, 85, True),
        (spot, 85, False),
        (noise, 90, True),
        (noise, 30, False),
    ]:
        h, w = img.shape[:2]
        seq = decode_jpeg(
            encode_jpeg(w, h, img.tobytes(), quality=q, subsample=sub)
        )
        sa = decode_jpeg(
            encode_jpeg_progressive(
                w, h, img.tobytes(), quality=q, subsample=sub,
                successive=True,
            )
        )
        assert sa == seq


def test_jpeg_progressive_truncated_contract():
    """Progressive files cut at any byte: ValueError or a dims-correct
    partial decode (a cut between scans legally yields fewer-band
    pixels) — never another exception type."""
    from openmrs_module_mamba_etl_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rgb = bytes((x * 11 + y * 3 + c * 7) % 256
                for y in range(10) for x in range(9) for c in range(3))
    data = encode_jpeg_progressive(9, 10, rgb, quality=90)
    for cut in range(1, len(data)):
        try:
            w, h, raw = decode_jpeg(data[:cut])
        except ValueError:
            continue
        assert (w, h) == (9, 10) and len(raw) == 9 * 10 * 3


def test_jpeg_progressive_pillow_interop():
    """With real Pillow: our progressive files decode in PIL, and PIL's
    progressive output (which uses AC successive approximation) hits our
    documented refinement seam. Skips cleanly without PIL."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.jpeg import (
        decode_jpeg,
        encode_jpeg_progressive,
    )

    rgb = np.full((16, 24, 3), (90, 160, 220), dtype=np.uint8)
    ours = encode_jpeg_progressive(24, 16, rgb.tobytes(), quality=92)
    with PIL_Image.open(io.BytesIO(ours)) as im:
        assert im.size == (24, 16)
        theirs = np.asarray(im.convert("RGB")).astype(np.int16)
    assert np.abs(theirs - rgb.astype(np.int16)).max() <= 4

    buf = io.BytesIO()
    PIL_Image.fromarray(rgb).save(buf, format="JPEG", progressive=True)
    # libjpeg's default progressive scan script uses successive
    # approximation — now fully supported
    w, h, raw = decode_jpeg(buf.getvalue())
    assert (w, h) == (24, 16) and len(raw) == 24 * 16 * 3


def test_audio_soundfile_adapter_wins_for_non_wav(monkeypatch):
    """extract_audio_features(fake=False): a non-WAV payload must route to
    the optional soundfile backend when importable — proven with a stub
    soundfile module emitting sentinel samples, so the adapter wiring is
    exercised even in containers without the real library."""
    import sys
    import types

    import numpy as np
    import pandas as pd

    from openmrs_module_mamba_etl_spark.llm import multimodal as mm
    from openmrs_module_mamba_etl_spark.llm.wav import frame_energies

    rate = 22_050
    samples = np.arange(-100, 100, dtype=np.int16)

    sf_mod = types.ModuleType("soundfile")

    def _read(buf, dtype, always_2d):
        assert dtype == "int16" and always_2d
        return samples.reshape(-1, 1), rate

    sf_mod.read = _read
    monkeypatch.setitem(sys.modules, "soundfile", sf_mod)

    # drive the row kernel through the same mapInPandas batch fn the
    # DataFrame path uses, without spinning Spark
    captured = {}

    def fake_map_in_pandas(self, fn, schema):
        pdf = pd.DataFrame({"media_id": [1], "content": [b"ID3 not a wav"]})
        captured["out"] = next(fn(iter([pdf])))
        return self

    class _FakeDF:
        mapInPandas = fake_map_in_pandas

    mm.extract_audio_features(_FakeDF(), n_mfcc=4, fake=False)
    out = captured["out"]
    assert int(out["sample_rate"][0]) == rate
    assert int(out["duration_ms"][0]) == (len(samples) * 1000) // rate
    # same normalization contract as the pure-python WAV path
    assert out["mfcc"][0] == frame_energies(
        samples.astype(np.float64) / 32768.0, 4
    )


def test_audio_non_wav_without_soundfile_raises_at_seam(monkeypatch):
    """Without any backend, the non-WAV audio seam must raise loudly and
    name the missing adapter."""
    import builtins
    import sys

    import pandas as pd

    from openmrs_module_mamba_etl_spark.llm import multimodal as mm

    monkeypatch.delitem(sys.modules, "soundfile", raising=False)
    real_import = builtins.__import__

    def no_soundfile(name, *a, **k):
        if name == "soundfile":
            raise ImportError("stubbed out")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_soundfile)

    captured = {}

    def fake_map_in_pandas(self, fn, schema):
        pdf = pd.DataFrame({"media_id": [1], "content": [b"ID3 not a wav"]})
        with pytest.raises(NotImplementedError, match="soundfile"):
            next(fn(iter([pdf])))
        captured["raised"] = True
        return self

    class _FakeDF:
        mapInPandas = fake_map_in_pandas

    mm.extract_audio_features(_FakeDF(), fake=False)
    assert captured["raised"]


def test_pil_frames_adapter_and_absent_seam(monkeypatch):
    """_pil_frames: returns RGB frames through a stub PIL ImageSequence
    when PIL imports, and None (caller raises the declared seam) when it
    does not."""
    import sys
    import types

    from openmrs_module_mamba_etl_spark.llm.multimodal import _pil_frames

    f0, f1, f2 = (bytes([i, i, i] * 4) for i in (1, 2, 3))

    class _Frame:
        def __init__(self, raw):
            self.raw = raw

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return self.raw

    class _StubAnim:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _StubUnidentified(Exception):
        pass

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")

    def _open(buf):
        if buf.getvalue().startswith(b"\x00\x00\x00 ftyp"):  # MP4 box
            raise _StubUnidentified("cannot identify image file")
        return _StubAnim()

    image_mod.open = _open
    seq_mod = types.ModuleType("PIL.ImageSequence")
    seq_mod.Iterator = lambda im: iter([_Frame(f0), _Frame(f1), _Frame(f2)])
    pil.Image = image_mod
    pil.ImageSequence = seq_mod
    pil.UnidentifiedImageError = _StubUnidentified
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    monkeypatch.setitem(sys.modules, "PIL.ImageSequence", seq_mod)

    # adapter decodes and honors max_frames
    assert _pil_frames(b"RIFFxxxxWEBPVP8 ", max_frames=2) == [f0, f1]

    # PIL present but container unidentifiable (compressed video): None,
    # so the caller raises the honest NotImplementedError seam instead of
    # leaking a cryptic PIL error
    assert _pil_frames(b"\x00\x00\x00 ftypisom....", max_frames=2) is None

    # PIL absent -> None (the sample_frames caller raises the seam)
    import builtins

    real_import = builtins.__import__

    def no_pil(name, *a, **k):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError("stubbed out")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "PIL", raising=False)
    monkeypatch.delitem(sys.modules, "PIL.Image", raising=False)
    monkeypatch.delitem(sys.modules, "PIL.ImageSequence", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_pil)
    assert _pil_frames(b"RIFFxxxxWEBPVP8 ", max_frames=2) is None


def test_av_frames_adapter_and_absent_seam(monkeypatch):
    """_av_frames: decodes compressed-video frames through a stub PyAV
    when it imports, returns None for unidentifiable/videoless payloads
    (caller raises the declared seam), and None when PyAV is absent —
    the video twin of the PIL/soundfile adapter tests."""
    import sys
    import types

    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.multimodal import _av_frames

    shades = (10, 20, 30)
    arrays = [np.full((2, 2, 3), s, dtype=np.uint8) for s in shades]

    class _Frame:
        def __init__(self, arr):
            self.arr = arr

        def to_rgb(self):
            return self

        def to_ndarray(self):
            return self.arr

    class _InvalidData(Exception):
        pass

    class _Container:
        def __init__(self, has_video):
            self.streams = types.SimpleNamespace(
                video=[object()] if has_video else []
            )

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            assert video == 0
            return iter(_Frame(a) for a in arrays)

    av_mod = types.ModuleType("av")
    err_mod = types.ModuleType("av.error")
    err_mod.InvalidDataError = _InvalidData
    av_mod.error = err_mod

    def _open(buf):
        data = buf.getvalue()
        if data.startswith(b"garbage"):
            raise _InvalidData("moov atom not found")
        return _Container(has_video=not data.startswith(b"ID3"))

    av_mod.open = _open
    monkeypatch.setitem(sys.modules, "av", av_mod)
    monkeypatch.setitem(sys.modules, "av.error", err_mod)

    # adapter decodes and honors max_frames
    out = _av_frames(b"\x00\x00\x00 ftypisom....", max_frames=2)
    assert out == [a.tobytes() for a in arrays[:2]]

    # PyAV present but container unidentifiable: None (honest seam at the
    # caller, not a leaked av.error)
    assert _av_frames(b"garbage not a container", max_frames=2) is None

    # identified container with no video stream (an MP3): None
    assert _av_frames(b"ID3 audio only", max_frames=2) is None

    # PyAV absent -> None
    import builtins

    real_import = builtins.__import__

    def no_av(name, *a, **k):
        if name == "av" or name.startswith("av."):
            raise ImportError("stubbed out")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "av", raising=False)
    monkeypatch.delitem(sys.modules, "av.error", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_av)
    assert _av_frames(b"\x00\x00\x00 ftypisom....", max_frames=2) is None


def test_sample_frames_video_routes_through_av_adapter(monkeypatch):
    """sample_frames(fake=False): an MP4-ish payload the image codecs and
    PIL can't identify must fall through to the PyAV adapter — proven by
    stubbing _av_frames itself, so the routing (not the codec) is what's
    under test."""
    import pandas as pd

    from openmrs_module_mamba_etl_spark.llm import multimodal as mm

    sentinel = [b"\x01\x02\x03" * 4, b"\x04\x05\x06" * 4]
    monkeypatch.setattr(
        mm, "_av_frames", lambda payload, max_frames: sentinel[:max_frames]
    )

    captured = {}

    def fake_map_in_pandas(self, fn, schema):
        pdf = pd.DataFrame(
            {"media_id": [7], "content": [b"\x00\x00\x00 ftypisom...."]}
        )
        captured["out"] = next(fn(iter([pdf])))
        return self

    class _FakeDF:
        mapInPandas = fake_map_in_pandas

    mm.sample_frames(_FakeDF(), max_frames=2, fake=False)
    out = captured["out"]
    assert list(out["media_id"]) == [7, 7]
    assert list(out["frame_index"]) == [0, 1]
    assert list(out["frame_bytes"]) == sentinel


def test_av_real_interop_mp4_roundtrip():
    """Real-PyAV interop (skipped where PyAV is absent, like the PIL
    suite): encode a 3-frame MP4 with PyAV, decode through _av_frames,
    and check the raw-RGB contract — frame count capped at max_frames,
    byte length = w*h*3, lossy-tolerant luminance."""
    av = pytest.importorskip("av")
    import io

    import numpy as np

    from openmrs_module_mamba_etl_spark.llm.multimodal import _av_frames

    buf = io.BytesIO()
    with av.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 16
        stream.pix_fmt = "yuv420p"
        for shade in (16, 128, 240):
            img = np.full((16, 32, 3), shade, dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for pkt in stream.encode(frame):
                container.mux(pkt)
        for pkt in stream.encode():
            container.mux(pkt)

    frames = _av_frames(buf.getvalue(), max_frames=2)
    assert frames is not None and len(frames) == 2
    assert all(len(f) == 32 * 16 * 3 for f in frames)
    first = np.frombuffer(frames[0], dtype=np.uint8)
    assert abs(float(first.mean()) - 16) <= 16  # mpeg4 is lossy


def test_soundfile_real_interop_flac():
    """Real-soundfile interop (skipped where soundfile is absent): a FLAC
    payload — lossless, so rate/duration/frame-RMS must match the
    pure-python WAV contract exactly."""
    soundfile = pytest.importorskip("soundfile")
    import io

    import numpy as np
    import pandas as pd

    from openmrs_module_mamba_etl_spark.llm import multimodal as mm
    from openmrs_module_mamba_etl_spark.llm.wav import frame_energies

    rate = 8_000
    samples = (np.sin(np.linspace(0, 20 * np.pi, 800)) * 20_000).astype(np.int16)
    buf = io.BytesIO()
    soundfile.write(buf, samples, rate, format="FLAC")

    captured = {}

    def fake_map_in_pandas(self, fn, schema):
        pdf = pd.DataFrame({"media_id": [1], "content": [buf.getvalue()]})
        captured["out"] = next(fn(iter([pdf])))
        return self

    class _FakeDF:
        mapInPandas = fake_map_in_pandas

    mm.extract_audio_features(_FakeDF(), n_mfcc=4, fake=False)
    out = captured["out"]
    assert int(out["sample_rate"][0]) == rate
    assert int(out["duration_ms"][0]) == (len(samples) * 1000) // rate
    assert out["mfcc"][0] == frame_energies(
        samples.astype(np.float64) / 32768.0, 4
    )


def test_av_frames_zero_frame_identified_container_raises(monkeypatch):
    """An IDENTIFIED video container whose stream decodes to zero frames
    must raise (data error), not return [] — the caller's seam only fires
    on None, so an empty list would silently emit no frames for a payload
    a backend claimed (round-8 ADVICE item 3)."""
    import sys
    import types

    from openmrs_module_mamba_etl_spark.llm.multimodal import _av_frames

    class _Container:
        streams = types.SimpleNamespace(video=[object()])

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            return iter(())  # identified stream, nothing decodable

    av_mod = types.ModuleType("av")
    err_mod = types.ModuleType("av.error")
    err_mod.InvalidDataError = type("_InvalidData", (Exception,), {})
    av_mod.error = err_mod
    av_mod.open = lambda buf: _Container()
    monkeypatch.setitem(sys.modules, "av", av_mod)
    monkeypatch.setitem(sys.modules, "av.error", err_mod)

    with pytest.raises(ValueError, match="zero frames"):
        _av_frames(b"\x00\x00\x00 ftypisom....", max_frames=2)


def _sof3_jpeg() -> bytes:
    """A structurally-valid JPEG whose SOF marker declares lossless
    sequential (SOF3) — the T.81 process the pure-python codec rejects."""
    from openmrs_module_mamba_etl_spark.llm.jpeg import encode_jpeg

    data = bytearray(encode_jpeg(8, 8, bytes(192), quality=90))
    idx = data.find(b"\xff\xc0")
    assert idx > 0
    data[idx + 1] = 0xC3
    return bytes(data)


def test_lossless_jpeg_raises_declared_seam_without_capable_pil(monkeypatch):
    """With no PIL at all, a lossless JPEG must surface as the DECLARED
    NotImplementedError seam naming the needed backend — not as the pure
    codec's bare ValueError (round-8 verdict task 6: the one codec path
    that previously had no adapter slot)."""
    import builtins
    import sys

    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    real_import = builtins.__import__

    def no_pil(name, *a, **k):
        if name == "PIL" or name.startswith("PIL."):
            raise ImportError("stubbed out")
        return real_import(name, *a, **k)

    monkeypatch.delitem(sys.modules, "PIL", raising=False)
    monkeypatch.delitem(sys.modules, "PIL.Image", raising=False)
    monkeypatch.setattr(builtins, "__import__", no_pil)

    with pytest.raises(NotImplementedError, match="lossless/arithmetic"):
        _decode_rgb(_sof3_jpeg())


def test_lossless_jpeg_decodes_through_capable_pil_slot(monkeypatch):
    """The adapter slot works: a (stub) PIL whose libjpeg build carries
    the lossless process decodes the SOF3 payload through _pil_still_rgb,
    and an INCAPABLE build (open raises) falls through to the declared
    seam instead of leaking its own error."""
    import sys
    import types

    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    sentinel = bytes([1, 2, 3] * 4)  # 2x2 RGB

    class _StubImage:
        size = (2, 2)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return self

        def tobytes(self):
            return sentinel

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda buf: _StubImage()
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    assert _decode_rgb(_sof3_jpeg()) == (2, 2, sentinel)

    def _incapable_open(buf):
        raise OSError("decoder jpeg_lossless not available")

    image_mod.open = _incapable_open
    with pytest.raises(NotImplementedError, match="lossless/arithmetic"):
        _decode_rgb(_sof3_jpeg())


def _stub_pil(monkeypatch, open_fn):
    """Install a minimal stub PIL whose Image.open is ``open_fn``."""
    import sys
    import types

    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = open_fn
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)
    return pil


def test_pil_data_error_on_pil_only_format_propagates(monkeypatch):
    """round-9 ADVICE item 1: with PIL installed, a CORRUPT payload of a
    PIL-only container (WebP/BMP/TIFF — no pure-python fallback) must
    surface PIL's data error, not fall through to the capability seam's
    factually-wrong 'requires PIL, not available' message."""
    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    def _truncated_open(buf):
        raise OSError("image file is truncated (5 bytes not processed)")

    _stub_pil(monkeypatch, _truncated_open)
    webp_ish = b"RIFF\x10\x00\x00\x00WEBPVP8 garbage"
    with pytest.raises(OSError, match="truncated"):
        _decode_rgb(webp_ish)


def test_pil_unidentified_still_falls_to_declared_seam(monkeypatch):
    """With PIL installed but unable to IDENTIFY the container
    (UnidentifiedImageError — a capability statement, not a data error),
    an unknown format still reaches the declared NotImplementedError
    seam exactly as in the PIL-less container."""
    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    class _Unidentified(OSError):
        pass

    def _cannot_identify(buf):
        raise _Unidentified("cannot identify image file")

    pil = _stub_pil(monkeypatch, _cannot_identify)
    pil.UnidentifiedImageError = _Unidentified
    with pytest.raises(NotImplementedError, match="requires PIL/cv2"):
        _decode_rgb(b"\x00\x00\x00 ftypisom not an image")


def test_pil_data_error_on_pure_codec_format_defers_to_pure_codec(
    monkeypatch,
):
    """A PIL failure on a container the pure codecs cover (here: PNG) is
    NOT a final verdict — the pure codec decodes it (PIL merely loses its
    first-slot priority), keeping the arbiter contract."""
    from openmrs_module_mamba_etl_spark.llm import png as pngc
    from openmrs_module_mamba_etl_spark.llm.multimodal import _decode_rgb

    def _broken_open(buf):
        raise OSError("broken data stream when reading image file")

    _stub_pil(monkeypatch, _broken_open)
    rgb = bytes([10, 20, 30] * 4)
    w, h, raw = _decode_rgb(pngc.encode_png(2, 2, rgb))
    assert (w, h, raw) == (2, 2, rgb)


def test_unsupported_coding_process_is_typed_not_message_matched(
    monkeypatch,
):
    """round-9 ADVICE item 5: the lossless/arithmetic seam keys on the
    UnsupportedCodingProcess TYPE — a reworded message must not downgrade
    it back to a bare data error."""
    from openmrs_module_mamba_etl_spark.llm import jpeg as jpegc
    from openmrs_module_mamba_etl_spark.llm import multimodal as mm

    assert issubclass(jpegc.UnsupportedCodingProcess, ValueError)

    def _reworded(content):
        raise jpegc.UnsupportedCodingProcess("completely reworded text")

    monkeypatch.setattr(jpegc, "decode_jpeg", _reworded)
    with pytest.raises(NotImplementedError, match="lossless/arithmetic"):
        mm._decode_rgb(_sof3_jpeg())


def test_adapters_only_reachable_inside_mapinpandas_batches():
    """Structural pin (round-8 verdict task 8): every decode adapter
    (_pil_frames, _av_frames, _pil_still_rgb, the soundfile import) is
    reachable ONLY from inside the nested per-batch kernels that operators
    hand to mapInPandas — never from an operator's driver-side body or at
    module import. Keeps the executor-side contract pinned even in this
    library-less container: when a real backend lands, its decode work
    cannot silently move to the driver."""
    import ast
    import inspect

    from openmrs_module_mamba_etl_spark.llm import multimodal as mm

    tree = ast.parse(inspect.getsource(mm))
    top = {
        n.name: n for n in tree.body if isinstance(n, ast.FunctionDef)
    }

    def referenced(node: ast.AST) -> set[str]:
        out: set[str] = set()
        for sub in ast.walk(node):
            if isinstance(sub, ast.Call):
                f = sub.func
                if isinstance(f, ast.Name):
                    out.add(f.id)
                elif isinstance(f, ast.Attribute):
                    out.add(f.attr)
            elif isinstance(sub, ast.Import):
                out.update(a.name for a in sub.names)
            elif isinstance(sub, ast.ImportFrom) and sub.module:
                out.add(sub.module)
        return out

    # transitive closure: module-level functions that can reach an adapter
    reach = {"_pil_frames", "_av_frames", "_pil_still_rgb", "soundfile", "av"}
    changed = True
    while changed:
        changed = False
        for name, node in top.items():
            if name not in reach and referenced(node) & reach:
                reach.add(name)
                changed = True
    assert "_decode_rgb" in reach  # sanity: the closure actually closed

    # 1. module import runs no adapter-reaching code
    module_level = [n for n in tree.body if not isinstance(n, ast.FunctionDef)]
    for stmt in module_level:
        assert not referenced(stmt) & reach, ast.dump(stmt)[:120]

    # 2. every public operator keeps adapter-reaching calls inside its
    #    nested kernel functions, and ships those kernels via mapInPandas
    for name, node in top.items():
        if name in reach or name.startswith("_"):
            continue
        nested = [
            sub for sub in node.body if isinstance(sub, ast.FunctionDef)
        ]
        driver_body = [
            sub for sub in node.body if not isinstance(sub, ast.FunctionDef)
        ]
        driver_refs = set()
        for stmt in driver_body:
            driver_refs |= referenced(stmt)
        illegal = (driver_refs - {"mapInPandas"}) & reach
        assert not illegal, f"{name} reaches adapters driver-side: {illegal}"
        if any(referenced(sub) & reach for sub in nested):
            assert "mapInPandas" in driver_refs, (
                f"{name} has adapter-reaching kernels but no mapInPandas"
            )


# ---- round-10 review fixes: PIL failure classification ---------------------
# The adapter's fall-through contract is tested against CONTROLLED fake PIL
# builds injected into sys.modules, so the classification holds (and stays
# covered) in this PIL-less container.

_BMP_PAYLOAD = b"BM" + b"\x00" * 32  # a container no pure codec covers


def _fake_pil(monkeypatch, open_raises, with_unidentified_cls=True):
    import sys
    import types

    pil = types.ModuleType("PIL")

    class _Image:
        @staticmethod
        def open(_fh):
            raise open_raises

    pil.Image = _Image
    if with_unidentified_cls:
        class UnidentifiedImageError(Exception):
            pass

        pil.UnidentifiedImageError = UnidentifiedImageError
    monkeypatch.setitem(sys.modules, "PIL", pil)
    return pil


def test_pre70_pillow_unidentified_falls_through(monkeypatch):
    """Pre-7.0 Pillow has no UnidentifiedImageError class and raises plain
    OSError('cannot identify image file ...') — that is MISSING CAPABILITY
    (container unknown to this build), so the adapter must fall through to
    the seam, not surface a spurious data error."""
    from openmrs_module_mamba_etl_spark.llm.multimodal import _pil_still_rgb

    _fake_pil(
        monkeypatch,
        OSError("cannot identify image file <_io.BytesIO object>"),
        with_unidentified_cls=False,
    )
    assert _pil_still_rgb(_BMP_PAYLOAD) is None


def test_corrupt_pil_only_container_propagates_as_data_error(monkeypatch):
    """'Unsupported BMP compression' is a DATA error on an identified
    container — the 'unsupported' word must not reclassify it as a missing
    backend (round-9 ADVICE item 1, tightened by the round-10 review)."""
    import pytest

    from openmrs_module_mamba_etl_spark.llm.multimodal import _pil_still_rgb

    _fake_pil(monkeypatch, OSError("Unsupported BMP compression (5)"))
    with pytest.raises(OSError, match="Unsupported BMP compression"):
        _pil_still_rgb(_BMP_PAYLOAD)


def test_build_missing_decoder_falls_through(monkeypatch):
    """'decoder jpeg2k not available' / 'WEBP support not installed' mean
    THIS BUILD lacks the decoder — genuine capability fall-through."""
    from openmrs_module_mamba_etl_spark.llm.multimodal import _pil_still_rgb

    _fake_pil(monkeypatch, OSError("decoder jpeg2k not available"))
    assert _pil_still_rgb(_BMP_PAYLOAD) is None
    _fake_pil(monkeypatch, OSError("WEBP support not installed"))
    assert _pil_still_rgb(_BMP_PAYLOAD) is None


def test_modern_pil_unidentified_class_falls_through(monkeypatch):
    from openmrs_module_mamba_etl_spark.llm.multimodal import _pil_still_rgb

    pil = _fake_pil(monkeypatch, None)

    class _Image:
        @staticmethod
        def open(_fh):
            raise pil.UnidentifiedImageError("cannot identify image file")

    pil.Image = _Image
    assert _pil_still_rgb(_BMP_PAYLOAD) is None
