"""Pure-python Y4M (YUV4MPEG2) video codec — the real codec behind the
frame-sampling seam.

Y4M is the uncompressed video interchange format (the same byte stream
``ffmpeg -f yuv4mpegpipe`` produces): a plain-text stream header
(``YUV4MPEG2 W.. H.. F..:..``) followed by ``FRAME`` markers each carrying
one raw YUV frame. No entropy coding — so, like PNG (zlib) and WAV
(struct), it is decodable with the stdlib alone, which makes the video
``fake=False`` path REAL in this container. Compressed video (H.264/VP9)
still raises at the seam; an ffmpeg binding slots in the same way.

Color: 8-bit BT.601 full-range YUV 4:4:4 (``C444``), integer-rounded both
directions so encode→decode round trips are deterministic cross-platform.
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def is_y4m(data: bytes | None) -> bool:
    return data is not None and data[:9] == _MAGIC


def _rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, u, v], axis=-1)), 0, 255).astype(np.uint8)


def _yuv_to_rgb(yuv: np.ndarray) -> np.ndarray:
    y = yuv[..., 0].astype(np.float64)
    u = yuv[..., 1].astype(np.float64) - 128.0
    v = yuv[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_y4m(
    width: int, height: int, rgb_frames: list[bytes], fps: int = 25
) -> bytes:
    """RGB frame buffers (``width*height*3`` each) → one C444 Y4M stream."""
    out = bytearray(
        f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C444\n".encode()
    )
    for rgb in rgb_frames:
        if len(rgb) != width * height * 3:
            raise ValueError(
                f"frame needs {width * height * 3} bytes, got {len(rgb)}"
            )
        px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
        yuv = _rgb_to_yuv(px)
        out += b"FRAME\n"
        # planar: all Y, all U, all V
        for c in range(3):
            out += yuv[..., c].tobytes()
    return bytes(out)


def decode_y4m(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """→ (width, height, fps, [raw RGB frame bytes, ...])."""
    if not is_y4m(data):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    header = data[:nl].decode("ascii", "replace")
    width = height = fps = None
    colorspace = "C420"
    for tok in header.split()[1:]:
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C"):
            colorspace = tok
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(
            f"unsupported Y4M colorspace {colorspace} (C444 only)"
        )
    plane = width * height
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        pos = fnl + 1
        raw = data[pos : pos + 3 * plane]
        if len(raw) < 3 * plane:
            raise ValueError("truncated Y4M frame")
        yuv = np.stack(
            [
                np.frombuffer(raw[i * plane : (i + 1) * plane], dtype=np.uint8)
                .reshape(height, width)
                for i in range(3)
            ],
            axis=-1,
        )
        frames.append(_yuv_to_rgb(yuv).tobytes())
        pos += 3 * plane
    return width, height, fps or 25, frames
