"""Pure-python WAV (RIFF PCM) codec — the real codec behind the audio seam.

Like llm/png.py for images: WAV needs only stdlib ``struct`` (the RIFF
container and PCM encoding are public specs), so the ``fake=False`` audio
path can decode for real in this container. Supported: 16-bit PCM, mono or
multi-channel (downmixed by averaging), standard ``fmt ``/``fact``/``data``
chunk walk, plus two real COMPRESSED audio codecs: IMA ADPCM (wFormatTag
0x11, 4 bits/sample) and G.711 mu-law (0x07, 8 bits/sample). Perceptual
formats (MP3/OGG/FLAC) still raise at the seam — no codec for them here.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes | None) -> bool:
    return (
        data is not None
        and len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """16-bit PCM mono WAV from an int16 sample array."""
    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 2,
        2,
        16,
        b"data",
        len(pcm),
    )
    return hdr + pcm


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """→ (sample_rate, mono float64 samples in [-1, 1])."""
    if not is_wav(data):
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    rate = channels = bits = fmt_code = None
    block_align = samples_per_block = fact_samples = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code == 0x11:  # IMA ADPCM (compressed, 4 bits/sample)
                if channels != 1:
                    raise ValueError("IMA ADPCM WAV: mono only")
                samples_per_block = (
                    struct.unpack("<H", body[18:20])[0]
                    if len(body) >= 20
                    else (block_align - 4) * 2 + 1
                )
            elif fmt_code == 0x07:  # G.711 mu-law (8 bits/sample)
                if channels != 1:
                    raise ValueError("mu-law WAV: mono only")
            elif fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format {fmt_code}, {bits}-bit "
                    "(16-bit PCM, IMA ADPCM, or mu-law only)"
                )
        elif tag == b"fact":
            fact_samples = struct.unpack("<I", body[:4])[0]
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if fmt_code == 0x11:
        samples = _decode_adpcm_data(pcm, block_align, samples_per_block)
        if fact_samples is not None:
            samples = samples[:fact_samples]  # drop final-block padding
        return rate, samples / 32768.0
    if fmt_code == 0x07:
        samples = np.asarray(
            [_mulaw_decode_sample(b) for b in pcm], dtype=np.float64
        )
        if fact_samples is not None:
            samples = samples[:fact_samples]
        return rate, samples / 32768.0
    samples = np.frombuffer(
        pcm[: len(pcm) - len(pcm) % (2 * channels)], dtype="<i2"
    ).astype(np.float64)
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples / 32768.0


def frame_energies(samples: np.ndarray, n_frames: int) -> list[float]:
    """RMS energy of ``n_frames`` equal time slices — the deterministic
    feature vector the real audio path emits (honest naming: these are
    frame energies, not cepstral coefficients; a real MFCC kernel slots
    into the same seam when librosa/torchaudio exist)."""
    if len(samples) == 0:
        return [0.0] * n_frames
    bounds = (np.arange(n_frames + 1) * len(samples)) // n_frames
    out = []
    for i in range(n_frames):
        seg = samples[bounds[i] : bounds[i + 1]]
        out.append(float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0)
    return out


# --- IMA ADPCM (DVI4, wFormatTag 0x11) -----------------------------------
# A real COMPRESSED audio codec (4 bits/sample, public spec: IMA "DVI"
# ADPCM as carried in RIFF): the audio sibling of llm/jpeg.py closing the
# compressed-format seam. Mono only — the pipeline downmixes anyway.

_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibble(code: int, predictor: int, index: int) -> tuple[int, int]:
    step = _IMA_STEPS[index]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    predictor = predictor - diffq if code & 8 else predictor + diffq
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_ADJ[code & 7]))
    return predictor, index


def encode_wav_adpcm(
    sample_rate: int, samples: np.ndarray, samples_per_block: int = 505
) -> bytes:
    """Mono IMA-ADPCM WAV (4 bits/sample, ~4x smaller than 16-bit PCM).

    Block layout per spec: 4-byte header (predictor int16, step index,
    reserved) then (samples_per_block−1) nibbles, low nibble first.
    ``samples_per_block`` must be odd so nibbles fill whole bytes.
    """
    if samples_per_block % 2 == 0:
        raise ValueError("samples_per_block must be odd")
    import bisect

    s = np.asarray(samples, dtype=np.int64)
    block_align = 4 + (samples_per_block - 1) // 2
    blocks = bytearray()
    index = 0
    for start in range(0, len(s), samples_per_block):
        chunk = s[start : start + samples_per_block]
        predictor = int(chunk[0])
        if len(chunk) > 1:
            # Per-block initial step sized to the first delta (the header
            # carries the index, so any choice is spec-valid): a code-7
            # nibble reaches ~1.75*step, so starting near |delta|/1.75
            # removes the cold-start transient a zero index costs on
            # signals that move immediately.
            desired = max(7, int(abs(int(chunk[1]) - predictor) / 1.75))
            index = min(bisect.bisect_left(_IMA_STEPS, desired), 88)
        blocks += struct.pack("<hBB", predictor, index, 0)
        nibbles: list[int] = []
        for sample in chunk[1:]:
            step = _IMA_STEPS[index]
            diff = int(sample) - predictor
            code = 0
            if diff < 0:
                code = 8
                diff = -diff
            if diff >= step:
                code |= 4
                diff -= step
            if diff >= step >> 1:
                code |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                code |= 1
            predictor, index = _ima_decode_nibble(code, predictor, index)
            nibbles.append(code)
        # pad the final (possibly short) block to full nibble count
        nibbles += [0] * (samples_per_block - 1 - len(nibbles))
        for lo, hi in zip(nibbles[::2], nibbles[1::2]):
            blocks.append(lo | (hi << 4))
    n_blocks = -(-len(s) // samples_per_block) if len(s) else 0
    byte_rate = (sample_rate * block_align) // samples_per_block
    hdr = struct.pack(
        "<4sI4s4sIHHIIHHHH",
        b"RIFF",
        52 + len(blocks),
        b"WAVE",
        b"fmt ",
        20,
        0x11,  # IMA ADPCM
        1,  # mono
        sample_rate,
        byte_rate,
        block_align,
        4,  # bits per sample
        2,  # cbSize
        samples_per_block,
    )
    # fact chunk: exact sample count — required for compressed WAV, and
    # what lets decode drop the final block's nibble padding
    hdr += struct.pack("<4sII", b"fact", 4, len(s))
    hdr += struct.pack("<4sI", b"data", len(blocks))
    assert n_blocks * block_align == len(blocks)
    return hdr + bytes(blocks)


def _decode_adpcm_data(
    pcm: bytes, block_align: int, samples_per_block: int
) -> np.ndarray:
    out: list[int] = []
    for start in range(0, len(pcm) - len(pcm) % block_align, block_align):
        block = pcm[start : start + block_align]
        predictor, index, _ = struct.unpack("<hBB", block[:4])
        index = max(0, min(88, index))
        out.append(predictor)
        for byte in block[4:]:
            for code in (byte & 0x0F, byte >> 4):
                predictor, index = _ima_decode_nibble(code, predictor, index)
                out.append(predictor)
    return np.asarray(out, dtype=np.float64)


# --- G.711 mu-law (wFormatTag 0x07) --------------------------------------
# Log-PCM telephony encoding: 8 bits/sample, 2x compression, public spec
# (ITU-T G.711). Encode/decode are exact table-free bit manipulations.

_MU_BIAS = 0x84
_MU_CLIP = 32635


def _mulaw_encode_sample(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    if s < 0:
        s = -s
    s = min(s, _MU_CLIP) + _MU_BIAS
    exponent = s.bit_length() - 8  # s >= 0x84 so bit_length >= 8
    mantissa = (s >> (exponent + 3)) & 0x0F
    return ~(sign | (exponent << 4) | mantissa) & 0xFF


def _mulaw_decode_sample(b: int) -> int:
    b = ~b & 0xFF
    sign = b & 0x80
    exponent = (b >> 4) & 0x07
    mantissa = b & 0x0F
    s = ((mantissa << 3) + _MU_BIAS) << exponent
    s -= _MU_BIAS
    return -s if sign else s


def encode_wav_mulaw(sample_rate: int, samples: np.ndarray) -> bytes:
    """Mono G.711 mu-law WAV (8 bits/sample) from int16 samples."""
    s = np.asarray(samples, dtype=np.int64)
    payload = bytes(_mulaw_encode_sample(int(x)) for x in s)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHHH",
        b"RIFF",
        50 + len(payload),
        b"WAVE",
        b"fmt ",
        18,
        0x07,  # mu-law
        1,
        sample_rate,
        sample_rate,
        1,
        8,
        0,  # cbSize
    )
    hdr += struct.pack("<4sII", b"fact", 4, len(s))
    hdr += struct.pack("<4sI", b"data", len(payload))
    return hdr + payload
