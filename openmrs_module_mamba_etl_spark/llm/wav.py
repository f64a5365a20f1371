"""Pure-python WAV (RIFF PCM) codec — the real codec behind the audio seam.

Like llm/png.py for images: WAV needs only stdlib ``struct`` (the RIFF
container and PCM encoding are public specs), so the ``fake=False`` audio
path can decode for real in this container. Supported: 16-bit PCM, mono or
multi-channel (downmixed by averaging), standard ``fmt ``/``data`` chunk
walk. Compressed formats (MP3/OGG/FLAC) still raise at the seam — no codec
for them exists here.
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
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            fmt_code, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt_code != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: format {fmt_code}, {bits}-bit "
                    "(16-bit PCM only)"
                )
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
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
