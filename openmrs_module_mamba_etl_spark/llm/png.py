"""Pure-python PNG codec — the "real codec" behind the multimodal seam.

The container has no PIL/cv2, but PNG needs only stdlib ``zlib`` +
``struct`` (the format is public: RFC 2083). This module implements the
subset a training-data pipeline's decode/resize kernels need:

- encode: 8-bit RGB (color type 2), any scanline filter type 0-4 (the
  non-zero filters exist mainly so decode's unfiltering is testable);
- decode: 8-bit RGB and RGBA (alpha dropped), all five filter types,
  non-interlaced; CRC-verified chunk walk;
- nearest-neighbor resize over the raw RGB buffer (numpy, vectorized).

``llm.multimodal`` prefers PIL when importable and falls back here, so the
``fake=False`` path is a working decoder either way; GIF and baseline JPEG
decode via their sibling pure-python codecs (llm/gif.py, llm/jpeg.py), and
payloads with no codec (e.g. WebP) still raise at the honest seam.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def is_png(data: bytes | None) -> bool:
    return data is not None and data[:8] == PNG_SIGNATURE


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb: bytes, filter_type: int = 0) -> bytes:
    """8-bit RGB PNG from a ``width*height*3`` buffer.

    ``filter_type`` applies the same PNG scanline filter to every row —
    type 0 is the natural choice; 1-4 exercise the decoder's unfiltering.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} bytes for {width}x{height} RGB, "
            f"got {len(rgb)}"
        )
    if not 0 <= filter_type <= 4:
        raise ValueError(f"PNG filter type must be 0-4, got {filter_type}")
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width * 3).astype(np.int16)
    bpp = 3
    raw = bytearray()
    prev = np.zeros(width * 3, dtype=np.int16)
    for y in range(height):
        row = px[y]
        left = np.concatenate([np.zeros(bpp, np.int16), row[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int16), prev[:-bpp]])
        if filter_type == 0:
            out = row
        elif filter_type == 1:  # Sub
            out = row - left
        elif filter_type == 2:  # Up
            out = row - prev
        elif filter_type == 3:  # Average
            out = row - (left + prev) // 2
        else:  # Paeth
            out = row - _paeth(left, prev, upleft)
        raw.append(filter_type)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, raw RGB bytes). 8-bit RGB/RGBA, filters 0-4."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color not in (2, 6):
                raise ValueError(
                    f"unsupported PNG: bit depth {depth}, color type {color} "
                    "(8-bit RGB/RGBA only)"
                )
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = 3 if color == 2 else 4
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 2:  # Up
            cur = (row + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the already-reconstructed left
            # pixel — sequential in x, vectorized across channels
            cur = row.copy()
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if ft == 1:
                    cur[x] = (row[x] + a) % 256
                elif ft == 3:
                    cur[x] = (row[x] + (a + b) // 2) % 256
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(height, width, channels)
    if channels == 4:
        px = px[:, :, :3]
    return width, height, px.tobytes()


def resize_nearest(
    width: int, height: int, rgb: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resize of a raw RGB buffer (vectorized)."""
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return px[ys][:, xs].tobytes()
