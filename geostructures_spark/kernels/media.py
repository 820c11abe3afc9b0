"""Real media codecs in pure NumPy/stdlib: PCM WAV and binary PPM.

The multimodal pipeline (operators/multimodal.py) treats media as opaque
binary columns; this module supplies genuine decode/encode kernels for the
two container formats that need no external codec libraries:

- **WAV** (RIFF / PCM16 mono or interleaved): struct-parsed header + a
  zero-copy ``np.frombuffer`` over the data chunk.
- **PPM** (Netpbm P6, maxval 255): ASCII header + raw RGB bytes.

Plus the vectorized transforms built on them: nearest-neighbor resize
(pure index arithmetic) and deterministic audio/image feature extraction.
Everything here is exact integer/double math, so feature values are
reproducible down to float rounding by an independent implementation — the
contract oracle recomputes them in SQL from the synthetic generator's
formula (no binary parsing on the oracle side).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

__all__ = [
    'encode_wav', 'decode_wav', 'encode_ppm', 'decode_ppm',
    'resize_nearest', 'audio_features', 'image_features', 'sniff_kind',
    'FEATURE_DIM',
]

FEATURE_DIM = 16


# --- WAV (RIFF PCM16) -------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Mono PCM16 WAV bytes from an int16 sample array."""
    data = np.asarray(samples, dtype='<i2').tobytes()
    n = len(data)
    hdr = struct.pack(
        '<4sI4s4sIHHIIHH4sI',
        b'RIFF', 36 + n, b'WAVE',
        b'fmt ', 16, 1, 1, rate, rate * 2, 2, 16,
        b'data', n)
    return hdr + data


def decode_wav(blob: bytes) -> Tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from PCM WAV bytes. Walks RIFF chunks,
    so extra chunks (LIST/fact) before 'data' are fine."""
    b = bytes(blob)
    if b[:4] != b'RIFF' or b[8:12] != b'WAVE':
        raise ValueError('not a RIFF/WAVE stream')
    pos, rate, bits, channels = 12, None, 16, 1
    data = None
    while pos + 8 <= len(b):
        cid, size = struct.unpack_from('<4sI', b, pos)
        body = b[pos + 8:pos + 8 + size]
        if cid == b'fmt ':
            fmt, channels, rate = struct.unpack_from('<HHI', body, 0)
            bits = struct.unpack_from('<H', body, 14)[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f'unsupported WAV format {fmt}/{bits}bit')
        elif cid == b'data':
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError('WAV missing fmt/data chunk')
    samples = np.frombuffer(data, dtype='<i2')
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1).astype(np.int16)
    return rate, samples


# --- PPM (Netpbm P6) --------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """P6 PPM bytes from an (h, w, 3) uint8 array."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    return f'P6\n{w} {h}\n255\n'.encode() + img.tobytes()


def decode_ppm(blob: bytes) -> np.ndarray:
    """(h, w, 3) uint8 array from P6 PPM bytes (maxval 255; comments and
    arbitrary whitespace in the header handled per the Netpbm spec)."""
    b = bytes(blob)
    if b[:2] != b'P6':
        raise ValueError('not a P6 PPM stream')
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(b) and b[pos:pos + 1].isspace():
            pos += 1
        if b[pos:pos + 1] == b'#':  # comment to end of line
            while pos < len(b) and b[pos:pos + 1] != b'\n':
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f'unsupported PPM maxval {maxval}')
    return np.frombuffer(b, dtype=np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3)


# --- transforms / features --------------------------------------------------

def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index mapping (the standard
    src_idx = floor((dst + 0.5) * src / dst) grid)."""
    h, w = img.shape[0], img.shape[1]
    rows = ((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64)
    cols = ((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64)
    return img[rows.clip(0, h - 1)[:, None], cols.clip(0, w - 1)[None, :]]


def sniff_kind(blob: bytes) -> str:
    b = bytes(blob or b'')
    if b[:4] == b'RIFF' and b[8:12] == b'WAVE':
        return 'audio'
    if b[:2] == b'P6':
        return 'image'
    return 'unknown'


def audio_features(rate: int, samples: np.ndarray) -> np.ndarray:
    """[1=audio flag, duration_s, rms/32768, zero-crossing rate, peak/32768,
    0...] (FEATURE_DIM,)"""
    s = samples.astype(np.float64)
    n = len(s)
    out = np.zeros(FEATURE_DIM)
    out[0] = 0.0
    out[1] = n / float(rate)
    if n:
        out[2] = float(np.sqrt(np.mean(s * s))) / 32768.0
        if n > 1:
            out[3] = float(np.count_nonzero(np.signbit(s[1:]) != np.signbit(s[:-1]))) / (n - 1)
        out[4] = float(np.max(np.abs(s))) / 32768.0
    return out


def image_features(img: np.ndarray) -> np.ndarray:
    """[1=image flag, width, height, mean r/g/b /255, luma std /255, 0...]"""
    f = img.astype(np.float64)
    out = np.zeros(FEATURE_DIM)
    out[0] = 1.0
    out[1] = img.shape[1]
    out[2] = img.shape[0]
    out[3] = float(f[:, :, 0].mean()) / 255.0
    out[4] = float(f[:, :, 1].mean()) / 255.0
    out[5] = float(f[:, :, 2].mean()) / 255.0
    luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    out[6] = float(luma.std()) / 255.0
    return out
