"""Multimodal column plumbing: opaque binary media + typed metadata.

Media travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
over pruned (id, blob, meta) projections so the binary never joins wide rows.

Two decode paths:

- ``decode_fn='real'`` — genuine binary decode for the container formats
  implementable without external codec libraries (kernels/media.py): RIFF
  PCM WAV and Netpbm P6 PPM, sniffed by magic bytes, with exact audio
  (duration/RMS/ZCR/peak) and image (dims/channel means/luma std) features.
  Compressed formats (JPEG/MP3/H.264) would slot in here but their codecs
  are not installed in this environment.
- ``decode_fn='stub'`` — deterministic byte-hash fake for opaque blobs,
  exercising the identical plumbing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['MEDIA_SCHEMA', 'extract_features', 'sample_frames',
           'resize_images']

MEDIA_SCHEMA = ('media_id long, blob binary, '
                'meta struct<kind:string,width:int,height:int,duration_ms:int>')

_FEATURE_DIM = 16


def _stub_features(blobs: pd.Series) -> pd.Series:
    """Deterministic fake 'decode': 16 floats from the blob's sha1 bytes."""
    out = []
    for b in blobs:
        h = hashlib.sha1(bytes(b or b'')).digest()
        vec = np.frombuffer(h[:_FEATURE_DIM], dtype=np.uint8).astype(np.float64) / 255.0
        out.append(vec.tolist())
    return pd.Series(out, index=blobs.index)


def _real_features(blobs: pd.Series) -> pd.Series:
    from geostructures_spark.kernels.media import (
        FEATURE_DIM, audio_features, decode_ppm, decode_wav, image_features,
        sniff_kind)
    out = []
    for b in blobs:
        kind = sniff_kind(b)
        if kind == 'audio':
            out.append(audio_features(*decode_wav(b)).tolist())
        elif kind == 'image':
            out.append(image_features(decode_ppm(b)).tolist())
        else:
            out.append([float('nan')] * FEATURE_DIM)
    return pd.Series(out, index=blobs.index)


def extract_features(media: DataFrame, decode_fn: str = 'stub',
                     id_col: str = 'media_id', blob_col: str = 'blob') -> DataFrame:
    """media -> (media_id, features array<double>): the decode/featurize
    stage. Column-prunes to (id, blob) before the Arrow boundary."""
    if decode_fn == 'real':
        featurize = _real_features
    elif decode_fn == 'stub':
        featurize = _stub_features
    else:
        raise ValueError(f'unknown decode_fn: {decode_fn}')

    schema = f'{id_col} long, features array<double>'

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                'features': featurize(pdf[blob_col]),
            })

    return media.select(id_col, blob_col).mapInPandas(run, schema=schema)


def resize_images(media: DataFrame, out_w: int, out_h: int,
                  id_col: str = 'media_id', blob_col: str = 'blob') -> DataFrame:
    """Real image resize: decode P6 PPM -> nearest-neighbor resample
    (kernels/media.py, pure index arithmetic) -> re-encode. Non-image blobs
    pass through null. Output: (media_id, blob binary)."""
    from geostructures_spark.kernels.media import (
        decode_ppm, encode_ppm, resize_nearest, sniff_kind)
    schema = f'{id_col} long, {blob_col} binary'

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                if sniff_kind(b) == 'image':
                    out.append(encode_ppm(resize_nearest(decode_ppm(b),
                                                         out_w, out_h)))
                else:
                    out.append(None)
            yield pd.DataFrame({id_col: pdf[id_col], blob_col: out})

    return media.select(id_col, blob_col).mapInPandas(run, schema=schema)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  id_col: str = 'media_id') -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    timestamp (the decode of each frame is the stubbed step above). Pure
    DataFrame: sequence + explode, no Python."""
    n_frames = F.greatest((F.col('meta.duration_ms') / every_ms).cast('int'), F.lit(1))
    return (media
            .filter(F.col('meta.kind') == 'video')
            .select(id_col,
                    F.explode(F.sequence(F.lit(0), n_frames - 1)).alias('frame_idx'))
            .withColumn('ts_ms', F.col('frame_idx') * every_ms))
