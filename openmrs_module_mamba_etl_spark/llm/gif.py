"""Pure-python GIF decoder (and a minimal encoder) — second real image
codec behind the multimodal seam.

GIF (GIF87a/89a) is a public spec: palette-indexed pixels compressed with
variable-width LSB-first LZW inside sub-blocks. The decoder here covers
what a training-data pipeline meets in practice: global + local color
tables, interlacing, multiple frames (animated GIF → frame sampling),
transparency ignored (composited as the palette color), and the full LZW
code stream including clear/EOI codes. The encoder exists to make the
decoder testable hermetically: it emits valid fixed-width-friendly LZW
(literal codes with periodic clear), one frame per image descriptor.

Like llm/png.py (zlib) and llm/wav.py (struct), this keeps the
``fake=False`` path REAL in a container with no PIL: decode_images falls
back PNG → GIF before raising at the seam.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes | None) -> bool:
    return data is not None and data[:6] in _GIF_MAGICS


# ---- LZW ----------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, variable code width,
    CLEAR = 2^min, EOI = CLEAR+1."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader over the concatenated sub-block payload — one
    # int.from_bytes per code, not a python loop per bit (the per-pixel
    # hot path of the decode)
    bitpos = 0
    total_bits = len(data) * 8

    def read(nbits: int) -> int:
        nonlocal bitpos
        if bitpos + nbits > total_bits:
            return eoi  # truncated stream → stop
        chunk = data[bitpos >> 3 : (bitpos + nbits + 7) >> 3]
        v = (int.from_bytes(chunk, "little") >> (bitpos & 7)) & (
            (1 << nbits) - 1
        )
        bitpos += nbits
        return v

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}

    table = reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    next_code = eoi + 1

    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            table = reset_table()
            width = min_code_size + 1
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_expected])


def _lzw_encode_literals(min_code_size: int, indices: bytes) -> bytes:
    """Valid GIF LZW that emits every pixel as a literal code, issuing a
    CLEAR before the table would force a width bump — simple, spec-exact,
    and enough to exercise the decoder (compression is not the point)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - eoi - 1  # codes until the width would grow
    for b in indices:
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 1
        emit(b)
        budget -= 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---- container ----------------------------------------------------------


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[bytes],
) -> bytes:
    """Animated GIF from palette-index frame buffers (``width*height``
    bytes each, values < len(palette); palette padded to a power of 2)."""
    size = 2
    while size < max(2, len(palette)):
        size *= 2
    if size > 256:
        raise ValueError("palette too large")
    bits = max(1, (size - 1).bit_length())
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (bits - 1), 0, 0)
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += bytes(3) * (size - len(palette))
    min_code = max(2, bits)
    for idx in frames:
        if len(idx) != width * height:
            raise ValueError("frame size mismatch")
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
        out.append(min_code)
        stream = _lzw_encode_literals(min_code, idx)
        for i in range(0, len(stream), 255):
            block = stream[i : i + 255]
            out.append(len(block))
            out += block
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, list[bytes]]:
    """→ (width, height, [raw RGB frame bytes, ...])."""

    def need(end: int) -> None:
        # All block-walk reads funnel through this bound so a truncated
        # file raises the decoder's ValueError contract, never a raw
        # IndexError/struct.error from data[pos].
        if end > len(data):
            raise ValueError("truncated GIF")

    if not is_gif(data):
        raise ValueError("not a GIF (bad magic)")
    need(13)
    width, height, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        need(pos + 3 * n)
        global_palette = np.frombuffer(
            data[pos : pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    frames: list[bytes] = []
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            need(pos + 1)
            while data[pos] != 0:
                pos += 1 + data[pos]
                need(pos + 1)
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        need(pos + 10)
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        if fx + fw > width or fy + fh > height:
            raise ValueError("GIF frame rectangle exceeds logical screen")
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            need(pos + 3 * n)
            palette = np.frombuffer(
                data[pos : pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF frame without any color table")
        need(pos + 1)
        min_code = data[pos]
        pos += 1
        lzw = bytearray()
        need(pos + 1)
        while data[pos] != 0:
            ln = data[pos]
            need(pos + 1 + ln)
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
            need(pos + 1)
        pos += 1
        idx = np.frombuffer(
            _lzw_decode(min_code, bytes(lzw), fw * fh), dtype=np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("truncated GIF frame")
        rows = idx.reshape(fh, fw)
        if iflags & 0x40:  # interlaced: reorder rows
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            fixed = np.empty_like(rows)
            fixed[order] = rows
            rows = fixed
        # composite the (possibly sub-rectangle) frame onto the logical
        # screen canvas — optimized animated GIFs ship partial updates,
        # and the canvas accumulates (do-not-dispose semantics), so every
        # emitted frame is always width×height×3
        rgb = palette[np.clip(rows, 0, len(palette) - 1)].astype(np.uint8)
        canvas[fy : fy + fh, fx : fx + fw] = rgb
        frames.append(canvas.tobytes())
    if not frames:
        raise ValueError("GIF contains no image frames")
    return width, height, frames
