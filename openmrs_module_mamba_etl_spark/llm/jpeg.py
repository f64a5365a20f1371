"""Pure-python JPEG codec (baseline + progressive) — closing the
compressed-image seam.

The container has no PIL/cv2; PNG/GIF already decode via the pure-python
codecs, but JPEG corpora previously raised at the seam. The format is
public (ITU-T T.81 / ISO 10918-1 + JFIF); this module implements the
subset a training-data pipeline's decode kernels need:

- encode: 8-bit RGB → baseline sequential DCT (SOF0) or progressive
  spectral-selection (SOF2, ``encode_jpeg_progressive``), 4:4:4 or 4:2:0
  chroma subsampling, Annex-K quantization tables scaled by the libjpeg
  quality curve, Annex-K DC Huffman tables + a valid-canonical
  full-coverage AC table (see the spec note below), restart markers
  optional;
- decode: a coefficient-accumulation scan machine covering baseline
  sequential (SOF0/SOF1) AND full progressive (SOF2): spectral
  selection, EOBRUN band-skip codes, and COMPLETE successive
  approximation — DC first/refinement and AC first/refinement scans
  (T.81 G.1.2.3 correction-bit protocol), i.e. the scan scripts real
  encoders (libjpeg/mozjpeg) emit; any sampling factors (1-2 per axis),
  grayscale, multiple DQT/DHT per segment, restart markers (DRI/RSTn),
  0xFF00 byte unstuffing. Lossless/arithmetic/12-bit processes raise
  ``ValueError`` — an honest seam, not a silent fake.

Quality note: JPEG is lossy — round-trip tests assert bounded per-pixel
error (tight on flat/smooth content), not byte equality. Tables are
carried in the file (DQT/DHT), so files from other encoders decode with
their own embedded tables and vice versa.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -----------------------------------------------------------

#: zigzag scan: position i in scan order -> row-major index in the 8x8 block
ZIGZAG: list[int] = []
for _s in range(15):
    for _r in range(_s + 1) if _s % 2 == 1 else range(_s, -1, -1):
        _c = _s - _r
        if _r < 8 and _c < 8:
            ZIGZAG.append(_r * 8 + _c)
_UNZIGZAG = np.argsort(np.array(ZIGZAG))

#: Annex K.1 quantization tables (luminance / chrominance), row-major
STD_LUMA_Q = np.array(
    [16, 11, 10, 16, 24, 40, 51, 61,
     12, 12, 14, 19, 26, 58, 60, 55,
     14, 13, 16, 24, 40, 57, 69, 56,
     14, 17, 22, 29, 51, 87, 80, 62,
     18, 22, 37, 56, 68, 109, 103, 77,
     24, 35, 55, 64, 81, 104, 113, 92,
     49, 64, 78, 87, 103, 121, 120, 101,
     72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32)
STD_CHROMA_Q = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99,
     99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32)

# Huffman table specs (bits[16] = #codes per length 1..16, then values).
# DC specs are Annex K.3; the AC value ORDER within each code length does
# not affect validity (codes are canonical; tables ship in the file), so
# the AC specs below enumerate all 162 symbols under a provably-valid
# Kraft-complete length profile rather than trusting a from-memory copy of
# the Annex ordering: every symbol gets a 9-or-10-bit code (2*256+... < 2^10).
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_SYMBOLS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    # EOBn run-length symbols (r<<4, s=0 for r=1..14): unused by baseline,
    # required by progressive scans to code end-of-band runs > 1 block
    + [r << 4 for r in range(1, 15)]
)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0]


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment: symbol -> (code, length)."""
    if sum(bits) != len(vals):
        raise ValueError("huffman spec: bits/vals mismatch")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


# --- color + DCT ---------------------------------------------------------

_DCT_T = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_T[_k, _n] = (0.5 if _k else 1 / np.sqrt(8)) * (
            np.cos((2 * _n + 1) * _k * np.pi / 16) if _k else 1.0
        )


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_T @ block @ _DCT_T.T


# --- bit I/O -------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, surfaces RSTn, stops at
    any other marker (EOI ends the scan)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG scan")
        byte = self.data[self.pos]
        if byte == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG scan")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                self.marker = nxt
                raise _MarkerReached()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | byte
        self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Consume the pending RSTn marker and realign."""
        self._acc = 0
        self._nbits = 0
        self.marker = None
        self.pos += 2  # the 0xFF Dn pair


class _MarkerReached(Exception):
    pass


class UnsupportedCodingProcess(ValueError):
    """T.81 coding process this pure-python codec does not implement
    (lossless SOF3, arithmetic SOF9+, differential/hierarchical): a
    capability gap of THIS decoder, not a data error. Callers with an
    optional-backend adapter slot (``llm/multimodal._decode_rgb``) catch
    this TYPE to route to their declared seam — a dedicated subclass so a
    rewording of the message can never silently downgrade the seam back
    to a bare data error (round-9 ADVICE item 5). Still a ``ValueError``:
    callers that only distinguish decodable-vs-not keep working."""


# --- encoder -------------------------------------------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _magnitude(v: int) -> tuple[int, int]:
    """→ (category ssss, appended bits) per T.81 F.1.2.1."""
    ssss = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << ssss) - 1
    return ssss, bits


def _pt_dc(v: int, al: int) -> int:
    """DC point transform: arithmetic shift right (T.81 G.1.2.1)."""
    return int(v) >> al


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: division by 2^Al truncating toward zero
    (T.81 G.1.2.2) — NOT an arithmetic shift for negatives."""
    v = int(v)
    return -((-v) >> al) if v < 0 else v >> al


def _encode_block(
    bw: _BitWriter,
    block: np.ndarray,
    qtab: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    # qtab is NATURAL (row-major) order here; the zigzag reorder below
    # applies to the already-quantized coefficients
    coef = np.round(_dct2(block - 128.0).reshape(64) / qtab).astype(np.int64)
    zz = coef[ZIGZAG]
    dc = int(zz[0])
    ssss, bits = _magnitude(dc - pred)
    code, length = dc_codes[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(bits, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]  # EOB
                bw.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.write(code, length)
                run = 0
            continue
        ssss, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(bits, ssss)
        run = 0
    return dc


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = -h % mult
    pw = -w % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF JPEG from a ``width*height*3`` RGB buffer.

    ``subsample=True`` writes 4:2:0 (2x2-mean chroma); default is 4:4:4.
    ``restart_interval`` > 0 emits DRI + RSTn every that many MCUs.
    """
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} bytes for {width}x{height} RGB, "
            f"got {len(rgb)}"
        )
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(px)
    mcu = 16 if subsample else 8
    y_plane = _pad_edge(ycc[..., 0], mcu)
    cb_full = _pad_edge(ycc[..., 1], mcu)
    cr_full = _pad_edge(ycc[..., 2], mcu)
    if subsample:
        cb_plane = cb_full.reshape(
            cb_full.shape[0] // 2, 2, cb_full.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        cr_plane = cr_full.reshape(
            cr_full.shape[0] // 2, 2, cr_full.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        y_samp, c_samp = (2, 2), (1, 1)
    else:
        cb_plane, cr_plane = cb_full, cr_full
        y_samp, c_samp = (1, 1), (1, 1)

    luma_q = _quality_scale(STD_LUMA_Q, quality)
    chroma_q = _quality_scale(STD_CHROMA_Q, quality)
    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_l = _build_codes(_AC_BITS, _AC_SYMBOLS)
    ac_c = _build_codes(_AC_BITS, _AC_SYMBOLS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density + no thumbnail
    for tid, q in ((0, luma_q), (1, chroma_q)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[z]) for z in ZIGZAG)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    out += bytes([1, (y_samp[0] << 4) | y_samp[1], 0])
    out += bytes([2, (c_samp[0] << 4) | c_samp[1], 1])
    out += bytes([3, (c_samp[0] << 4) | c_samp[1], 1])
    for tc_th, spec in (
        ((0, 0), (_DC_LUMA_BITS, _DC_LUMA_VALS)),
        ((0, 1), (_DC_CHROMA_BITS, _DC_CHROMA_VALS)),
        ((1, 0), (_AC_BITS, _AC_SYMBOLS)),
        ((1, 1), (_AC_BITS, _AC_SYMBOLS)),
    ):
        bits, vals = spec
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc_th[0] << 4) | tc_th[1])
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])

    bw = _BitWriter()
    mcus_x = y_plane.shape[1] // mcu
    mcus_y = y_plane.shape[0] // mcu
    preds = [0, 0, 0]
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            if subsample:
                for v in range(2):
                    for h in range(2):
                        r0, c0 = my * 16 + v * 8, mx * 16 + h * 8
                        preds[0] = _encode_block(
                            bw,
                            y_plane[r0 : r0 + 8, c0 : c0 + 8],
                            luma_q,
                            dc_l,
                            ac_l,
                            preds[0],
                        )
                r0, c0 = my * 8, mx * 8
                preds[1] = _encode_block(
                    bw, cb_plane[r0 : r0 + 8, c0 : c0 + 8],
                    chroma_q, dc_c, ac_c, preds[1],
                )
                preds[2] = _encode_block(
                    bw, cr_plane[r0 : r0 + 8, c0 : c0 + 8],
                    chroma_q, dc_c, ac_c, preds[2],
                )
            else:
                r0, c0 = my * 8, mx * 8
                preds[0] = _encode_block(
                    bw, y_plane[r0 : r0 + 8, c0 : c0 + 8],
                    luma_q, dc_l, ac_l, preds[0],
                )
                preds[1] = _encode_block(
                    bw, cb_plane[r0 : r0 + 8, c0 : c0 + 8],
                    chroma_q, dc_c, ac_c, preds[1],
                )
                preds[2] = _encode_block(
                    bw, cr_plane[r0 : r0 + 8, c0 : c0 + 8],
                    chroma_q, dc_c, ac_c, preds[2],
                )
            n_mcu += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder -------------------------------------------------


def _plane_blocks(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Quantized zigzag-order coefficient blocks for a padded plane:
    → int64[by, bx, 64]."""
    by, bx = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((by, bx, 64), dtype=np.int64)
    for r in range(by):
        for c in range(bx):
            coef = np.round(
                _dct2(plane[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8] - 128.0)
                .reshape(64)
                / qtab
            ).astype(np.int64)
            out[r, c] = coef[ZIGZAG]
    return out


def _emit_dc(bw: _BitWriter, dc: int, pred: int, dc_codes: dict) -> int:
    ssss, bits = _magnitude(dc - pred)
    code, length = dc_codes[ssss]
    bw.write(code, length)
    if ssss:
        bw.write(bits, ssss)
    return dc


def _emit_ac_band(
    bw: _BitWriter, zz: np.ndarray, ac_codes: dict, ss: int, se: int,
    al: int = 0,
) -> None:
    """Run-length + magnitude coding of the band zz[ss..se] (after the
    Al point transform) with a per-block EOB (an EOBRUN of exactly 1 —
    always spec-valid)."""
    band = [_pt_ac(v, al) for v in zz[ss : se + 1]]
    nz = [i for i, v in enumerate(band) if v]
    last = (nz[-1] + ss) if nz else ss - 1
    run = 0
    for k in range(ss, se + 1):
        v = band[k - ss]
        if v == 0:
            if k > last:
                code, length = ac_codes[0x00]
                bw.write(code, length)
                return
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]
                bw.write(code, length)
                run = 0
            continue
        ssss, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | ssss]
        bw.write(code, length)
        bw.write(bits, ssss)
        run = 0
    if last < se:
        code, length = ac_codes[0x00]
        bw.write(code, length)



class _RefineACEncoder:
    """AC successive-approximation refinement coder (T.81 G.1.2.3 —
    the encode_mcu_AC_refine algorithm): newly significant coefficients
    emit run/size-1 symbols; already-significant ones contribute
    correction bits buffered until the next symbol (or carried across
    blocks inside an EOB run). State spans the whole scan — call
    :meth:`finish` to flush the final EOB run."""

    def __init__(self, bw: _BitWriter, ac_codes: dict, al: int) -> None:
        self.bw = bw
        self.codes = ac_codes
        self.al = al
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits inside the EOB run

    def _emit_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.codes[nbits << 4]
            self.bw.write(code, length)
            if nbits:
                self.bw.write(self.eobrun - (1 << nbits), nbits)
            for b in self.pending:
                self.bw.write(b, 1)
            self.pending = []
            self.eobrun = 0

    def encode_block(self, zz: np.ndarray, ss: int, se: int) -> None:
        al = self.al
        absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = ss - 1
        for i, t in enumerate(absv):
            if t == 1:
                eob = ss + i
        r = 0
        br: list[int] = []
        for k in range(ss, se + 1):
            t = absv[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob:
                self._emit_eobrun()
                code, length = self.codes[0xF0]
                self.bw.write(code, length)
                r -= 16
                for b in br:
                    self.bw.write(b, 1)
                br = []
            if t > 1:  # already significant: buffer the correction bit
                br.append(t & 1)
                continue
            self._emit_eobrun()
            code, length = self.codes[(r << 4) | 1]
            self.bw.write(code, length)
            self.bw.write(0 if int(zz[k]) < 0 else 1, 1)
            for b in br:
                self.bw.write(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            self.eobrun += 1
            self.pending.extend(br)
            if self.eobrun == 0x7FFF:
                self._emit_eobrun()

    def finish(self) -> None:
        self._emit_eobrun()


def encode_jpeg_progressive(
    width: int,
    height: int,
    rgb: bytes,
    quality: int = 90,
    subsample: bool = False,
    successive: bool = False,
) -> bytes:
    """Progressive (SOF2) JFIF JPEG.

    ``successive=False``: spectral selection only — one interleaved DC
    scan, then one full-band AC scan per component (every scan final for
    its band). ``successive=True``: the REAL-WORLD scan script shape —
    successive approximation with Al=1 first passes (DC and per-component
    AC, coarse coefficients) followed by Ah=1/Al=0 refinement scans (DC
    correction bits; AC newly-significant symbols + buffered correction
    bits per T.81 G.1.2.3). Both decode to the IDENTICAL pixels as the
    sequential encoding at the same quality: point transforms refine
    losslessly, only the entropy-coded ordering differs."""
    if len(rgb) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} bytes for {width}x{height} RGB, "
            f"got {len(rgb)}"
        )
    px = (
        np.frombuffer(rgb, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.float64)
    )
    ycc = _rgb_to_ycbcr(px)
    mcu = 16 if subsample else 8
    y_plane = _pad_edge(ycc[..., 0], mcu)
    cb_full = _pad_edge(ycc[..., 1], mcu)
    cr_full = _pad_edge(ycc[..., 2], mcu)
    if subsample:
        cb_plane = cb_full.reshape(
            cb_full.shape[0] // 2, 2, cb_full.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        cr_plane = cr_full.reshape(
            cr_full.shape[0] // 2, 2, cr_full.shape[1] // 2, 2
        ).mean(axis=(1, 3))
        y_samp, c_samp = (2, 2), (1, 1)
    else:
        cb_plane, cr_plane = cb_full, cr_full
        y_samp, c_samp = (1, 1), (1, 1)

    luma_q = _quality_scale(STD_LUMA_Q, quality)
    chroma_q = _quality_scale(STD_CHROMA_Q, quality)
    dc_l = _build_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    dc_c = _build_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac = _build_codes(_AC_BITS, _AC_SYMBOLS)

    blocks = [
        _plane_blocks(y_plane, luma_q),
        _plane_blocks(cb_plane, chroma_q),
        _plane_blocks(cr_plane, chroma_q),
    ]
    samp = [y_samp, c_samp, c_samp]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, q in ((0, luma_q), (1, chroma_q)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(q[z]) for z in ZIGZAG)
    out += b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, height, width, 3)
    for i, cid in enumerate((1, 2, 3)):
        out += bytes([cid, (samp[i][0] << 4) | samp[i][1], 0 if i == 0 else 1])
    for tc_th, spec in (
        ((0, 0), (_DC_LUMA_BITS, _DC_LUMA_VALS)),
        ((0, 1), (_DC_CHROMA_BITS, _DC_CHROMA_VALS)),
        ((1, 0), (_AC_BITS, _AC_SYMBOLS)),
        ((1, 1), (_AC_BITS, _AC_SYMBOLS)),
    ):
        bits, vals = spec
        out += b"\xff\xc4" + struct.pack(
            ">HB", 19 + len(vals), (tc_th[0] << 4) | tc_th[1]
        )
        out += bytes(bits) + bytes(vals)

    al1 = 1 if successive else 0
    mcus_x = y_plane.shape[1] // mcu
    mcus_y = y_plane.shape[0] // mcu
    dc_tabs = [dc_l, dc_c, dc_c]

    def dc_scan(al: int) -> bytes:
        """Interleaved DC first scan at point transform ``al``."""
        bw = _BitWriter()
        preds = [0, 0, 0]
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    hc, vc = samp[ci]
                    for v in range(vc):
                        for h in range(hc):
                            zz = blocks[ci][my * vc + v, mx * hc + h]
                            preds[ci] = _emit_dc(
                                bw, _pt_dc(int(zz[0]), al),
                                preds[ci], dc_tabs[ci],
                            )
        bw.flush()
        return bytes(bw.out)

    def dc_refine_scan(al: int) -> bytes:
        """Interleaved DC refinement: one bit per block."""
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(3):
                    hc, vc = samp[ci]
                    for v in range(vc):
                        for h in range(hc):
                            zz = blocks[ci][my * vc + v, mx * hc + h]
                            bw.write((int(zz[0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def comp_grid(ci: int) -> tuple[int, int]:
        hc, vc = samp[ci]
        cw = -(-width * hc // hmax)
        ch = -(-height * vc // vmax)
        return -(-cw // 8), -(-ch // 8)

    def ac_first_scan(ci: int, al: int) -> bytes:
        bw = _BitWriter()
        bx, by = comp_grid(ci)
        for r in range(by):
            for c in range(bx):
                _emit_ac_band(bw, blocks[ci][r, c], ac, 1, 63, al=al)
        bw.flush()
        return bytes(bw.out)

    def ac_refine_scan(ci: int, al: int) -> bytes:
        bw = _BitWriter()
        enc = _RefineACEncoder(bw, ac, al)
        bx, by = comp_grid(ci)
        for r in range(by):
            for c in range(bx):
                enc.encode_block(blocks[ci][r, c], 1, 63)
        enc.finish()
        bw.flush()
        return bytes(bw.out)

    def sos(comps: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        hdr = struct.pack(">HB", 6 + 2 * len(comps), len(comps))
        body = b"".join(bytes([cid, tdta]) for cid, tdta in comps)
        return b"\xff\xda" + hdr + body + bytes([ss, se, (ah << 4) | al])

    # scan 1: interleaved DC first pass (Al = al1)
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, al1)
    out += dc_scan(al1)
    # scans 2-4: one full-band AC first pass per component (Al = al1)
    for ci, cid in enumerate((1, 2, 3)):
        out += sos([(cid, 0x00)], 1, 63, 0, al1)
        out += ac_first_scan(ci, al1)
    if successive:
        # refinement passes: DC correction bits, then per-component AC
        out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 1, 0)
        out += dc_refine_scan(0)
        for ci, cid in enumerate((1, 2, 3)):
            out += sos([(cid, 0x00)], 1, 63, 1, 0)
            out += ac_refine_scan(ci, 0)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -------------------------------------------------------------


def is_jpeg(data: bytes | None) -> bool:
    return data is not None and data[:2] == b"\xff\xd8"


def _decode_huffman_tables(payload: bytes) -> dict[tuple[int, int], dict]:
    tables = {}
    pos = 0
    while pos < len(payload):
        tc_th = payload[pos]
        bits = list(payload[pos + 1 : pos + 17])
        n = sum(bits)
        vals = list(payload[pos + 17 : pos + 17 + n])
        if len(vals) < n:
            raise ValueError("truncated DHT")
        codes = _build_codes(bits, vals)
        # invert: (length, code) -> symbol
        tables[(tc_th >> 4, tc_th & 0x0F)] = {
            (length, code): sym for sym, (code, length) in codes.items()
        }
        pos += 17 + n
    return tables


def _read_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG scan")


def _extend(v: int, ssss: int) -> int:
    return v if v >= (1 << (ssss - 1)) else v - (1 << ssss) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """→ (width, height, raw RGB bytes).

    Baseline sequential (SOF0/SOF1) and progressive (SOF2) with full
    successive approximation — spectral selection plus DC *and* AC
    refinement scans (Ah≠0, any Ss; see ``decode_ac_refine``).
    Coefficients accumulate across scans and the image reconstructs once
    at EOI, so any legal sequential/progressive scan script decodes. The
    unsupported edges are the other T.81 modes: lossless (SOF3),
    arithmetic coding (SOF9+), and 12-bit precision — each raises
    ``ValueError`` at its marker."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad magic)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    restart_interval = 0
    frame: dict | None = None
    coefs: dict[int, np.ndarray] = {}
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RST
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG")
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        payload = data[pos + 4 : pos + 2 + seg_len]
        if len(payload) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                zzq = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                if len(zzq) < 64:
                    raise ValueError("truncated DQT")
                qtabs[tq] = zzq
                p += 65
        elif marker == 0xC4:  # DHT
            huff.update(_decode_huffman_tables(payload))
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            prec, h, w, nc = struct.unpack(">BHHB", payload[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = payload[6 + 3 * i : 9 + 3 * i]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "hmax": hmax,
                "vmax": vmax,
                "mcus_x": mcus_x,
                "mcus_y": mcus_y,
                "progressive": marker == 0xC2,
            }
            for c in comps:
                coefs[c["id"]] = np.zeros(
                    (mcus_y * c["v"] * 8 // 8, mcus_x * c["h"] * 8 // 8, 64),
                    dtype=np.int64,
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedCodingProcess(
                f"unsupported JPEG coding process (SOF{marker & 0x0F})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", payload[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scomps = []
            for i in range(ns):
                cs, tdta = payload[1 + 2 * i : 3 + 2 * i]
                scomps.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = payload[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_scan(
                data, pos + 2 + seg_len, frame, scomps,
                ss, se, ah, al, huff, restart_interval, coefs,
            )
            saw_scan = True
            continue
        # APPn / COM / DNL / others: skip
        pos += 2 + seg_len
    if frame is None or not saw_scan:
        raise ValueError("JPEG contains no scan")
    return _reconstruct(frame, coefs, qtabs)


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    scomps: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    huff: dict,
    restart_interval: int,
    coefs: dict[int, np.ndarray],
) -> int:
    """Decode one entropy-coded scan into the coefficient store; returns
    the byte position just after the scan's data."""
    comps = {c["id"]: c for c in frame["comps"]}
    br = _BitReader(data, pos)
    preds = {cid: 0 for cid, _, _ in scomps}
    state = {"eobrun": 0}

    def dc_tab(td):
        t = huff.get((0, td))
        if t is None:
            raise ValueError("missing DC huffman table")
        return t

    def ac_tab(ta):
        t = huff.get((1, ta))
        if t is None:
            raise ValueError("missing AC huffman table")
        return t

    def decode_dc_first(zz, cid, td):
        ssss = _read_symbol(br, dc_tab(td))
        diff = _extend(br.read_bits(ssss), ssss) if ssss else 0
        preds[cid] += diff
        zz[0] = preds[cid] << al

    def decode_dc_refine(zz):
        if br.read_bit():
            zz[0] |= 1 << al

    def decode_ac_first(zz, ta):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        k = ss
        tab = ac_tab(ta)
        while k <= se:
            rs = _read_symbol(br, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += br.read_bits(r)
                break
            k += r
            if k > se:
                raise ValueError("AC coefficient index out of range")
            zz[k] = _extend(br.read_bits(s), s) << al
            k += 1

    def decode_ac_refine(zz, ta):
        """T.81 G.1.2.3 (the decode_mcu_AC_refine algorithm): correction
        bits for already-nonzero coefficients, run/size-1 symbols for
        newly significant ones; EOB runs still consume correction bits
        for every nonzero coefficient in the covered blocks."""
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        tab = ac_tab(ta)

        def correct(k):
            if br.read_bit() and (int(zz[k]) & p1) == 0:
                zz[k] += p1 if int(zz[k]) >= 0 else m1

        if state["eobrun"] == 0:
            while k <= se:
                rs = _read_symbol(br, tab)
                r, s = rs >> 4, rs & 0x0F
                newval = 0
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r)
                        if r:
                            state["eobrun"] += br.read_bits(r)
                        break
                    # r == 15: ZRL — skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "refinement scan symbol with size > 1"
                        )
                    newval = p1 if br.read_bit() else m1
                while k <= se:
                    if int(zz[k]) != 0:
                        correct(k)
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval and k <= se:
                    zz[k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if int(zz[k]) != 0:
                    correct(k)
                k += 1
            state["eobrun"] -= 1

    def decode_seq_block(zz, cid, td, ta):
        decode_dc_first(zz, cid, td)
        k = 1
        tab = ac_tab(ta)
        while k < 64:
            rs = _read_symbol(br, tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break
            k += r
            if k > 63:
                raise ValueError("AC coefficient index out of range")
            zz[k] = _extend(br.read_bits(s), s)
            k += 1

    def handle_restart(n_units):
        if restart_interval and n_units and n_units % restart_interval == 0:
            br._acc = 0
            br._nbits = 0
            try:
                br._fill()
            except _MarkerReached:
                pass
            if br.marker is None or not 0xD0 <= br.marker <= 0xD7:
                raise ValueError("expected restart marker")
            br.restart()
            for cid in preds:
                preds[cid] = 0
            state["eobrun"] = 0

    progressive = frame["progressive"]
    try:
        if len(scomps) > 1:
            # interleaved MCU walk (sequential full-band, or DC band)
            if progressive and ss != 0:
                raise ValueError("progressive AC scans must be single-component")
            n_mcu = 0
            for my in range(frame["mcus_y"]):
                for mx in range(frame["mcus_x"]):
                    handle_restart(n_mcu)
                    for cid, td, ta in scomps:
                        c = comps[cid]
                        for v in range(c["v"]):
                            for h in range(c["h"]):
                                zz = coefs[cid][my * c["v"] + v, mx * c["h"] + h]
                                if not progressive:
                                    decode_seq_block(zz, cid, td, ta)
                                elif ah == 0:
                                    decode_dc_first(zz, cid, td)
                                else:
                                    decode_dc_refine(zz)
                    n_mcu += 1
        else:
            cid, td, ta = scomps[0]
            c = comps[cid]
            cw = -(-frame["w"] * c["h"] // frame["hmax"])
            ch = -(-frame["h"] * c["v"] // frame["vmax"])
            bx, by = -(-cw // 8), -(-ch // 8)
            n_blk = 0
            for r in range(by):
                for cc in range(bx):
                    handle_restart(n_blk)
                    zz = coefs[cid][r, cc]
                    if not progressive:
                        decode_seq_block(zz, cid, td, ta)
                    elif ss == 0:
                        if ah == 0:
                            decode_dc_first(zz, cid, td)
                        else:
                            decode_dc_refine(zz)
                    elif ah == 0:
                        decode_ac_first(zz, ta)
                    else:
                        decode_ac_refine(zz, ta)
                    n_blk += 1
    except _MarkerReached as exc:
        raise ValueError("truncated JPEG scan (marker inside MCU)") from exc
    return br.pos


def _reconstruct(
    frame: dict, coefs: dict[int, np.ndarray], qtabs: dict[int, np.ndarray]
) -> tuple[int, int, bytes]:
    w, h = frame["w"], frame["h"]
    full = []
    for c in frame["comps"]:
        q = qtabs.get(c["tq"])
        if q is None:
            raise ValueError("missing quantization table")
        C = coefs[c["id"]]  # [by, bx, 64] zigzag
        deq = (C * q)[:, :, _UNZIGZAG].astype(np.float64)
        by, bx = deq.shape[0], deq.shape[1]
        blocks = deq.reshape(by, bx, 8, 8)
        spat = (
            np.einsum("ij,xyjk,kl->xyil", _DCT_T.T, blocks, _DCT_T) + 128.0
        )
        plane = spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        plane = np.repeat(
            np.repeat(plane, frame["vmax"] // c["v"], axis=0),
            frame["hmax"] // c["h"],
            axis=1,
        )
        full.append(plane[:h, :w])
    if len(full) == 3:
        rgb = _ycbcr_to_rgb(np.stack(full, axis=-1))
    elif len(full) == 1:  # grayscale
        g = np.clip(full[0], 0, 255)
        rgb = np.stack([g, g, g], axis=-1)
    else:
        raise ValueError(f"unsupported component count {len(full)}")
    return w, h, np.round(rgb).astype(np.uint8).tobytes()
