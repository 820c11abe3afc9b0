"""Real media codec tests: WAV/PPM round trips, chunk/comment handling,
resize semantics, and feature determinism (the contract oracle recomputes
the same features from the generator formula in SQL)."""

import struct

import numpy as np
import pytest

from geostructures_spark.kernels.media import (
    audio_features, decode_ppm, decode_wav, encode_ppm, encode_wav,
    image_features, resize_nearest, sniff_kind)


def test_wav_roundtrip_exact():
    s = ((np.arange(64) * 17 + 13) % 2048 - 1024).astype(np.int16)
    rate, s2 = decode_wav(encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(s, s2)


def test_wav_extra_chunks_and_stereo():
    s = np.array([100, -100, 200, -200], dtype=np.int16)
    b = encode_wav(s, 44100)
    # splice a LIST chunk between fmt and data (word-aligned walker)
    head, data = b[:36], b[36:]
    extra = b'LIST' + struct.pack('<I', 5) + b'INFOx' + b'\x00'
    rate, s2 = decode_wav(head[:12] + head[12:36] + extra + data)
    assert rate == 44100 and np.array_equal(s, s2)
    # stereo downmixes by mean
    inter = np.stack([s, s + 10]).T.ravel().astype('<i2')
    hdr = struct.pack('<4sI4s4sIHHIIHH4sI', b'RIFF', 36 + len(inter) * 2,
                      b'WAVE', b'fmt ', 16, 1, 2, 8000, 32000, 4, 16,
                      b'data', len(inter) * 2)
    _, mono = decode_wav(hdr + inter.tobytes())
    assert np.array_equal(mono, s + 5)


def test_ppm_roundtrip_and_comments():
    img = (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    with_comment = b'P6\n# test comment\n8\t8\n255\n' + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)
    with pytest.raises(ValueError):
        decode_ppm(b'P5\n8 8\n255\n' + img.tobytes())


def test_resize_nearest_grid():
    img = (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    out = resize_nearest(img, 4, 4)
    # standard grid: src row/col = floor((dst + 0.5) * 8 / 4) = 1,3,5,7
    assert out.shape == (4, 4, 3)
    assert np.array_equal(out, img[np.ix_([1, 3, 5, 7], [1, 3, 5, 7])])
    up = resize_nearest(img, 16, 16)
    assert up.shape == (16, 16, 3)


def test_sniff_and_features():
    s = ((np.arange(64) * 17) % 2048 - 1024).astype(np.int16)
    wav = encode_wav(s, 8000)
    img = np.full((4, 4, 3), 128, dtype=np.uint8)
    ppm = encode_ppm(img)
    assert sniff_kind(wav) == 'audio' and sniff_kind(ppm) == 'image'
    assert sniff_kind(b'garbage') == 'unknown'
    af = audio_features(*decode_wav(wav))
    assert af[0] == 0.0 and af[1] == 64 / 8000.0
    assert af[2] == pytest.approx(float(np.sqrt(np.mean(s.astype(float) ** 2))) / 32768.0)
    imf = image_features(decode_ppm(ppm))
    assert imf[0] == 1.0 and imf[1] == 4 and imf[2] == 4
    assert imf[3] == pytest.approx(128 / 255.0)
    assert imf[6] == 0.0  # constant image: zero luma std
