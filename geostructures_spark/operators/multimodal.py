"""Multimodal column plumbing: opaque binary media + typed metadata.

Media travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched ``mapInPandas``
over pruned (id, blob, meta) projections so the binary never joins wide rows.

The actual codec step is environment-dependent: image/audio libs are not
installed here, so ``decode_fn='stub'`` produces a deterministic fake
(byte-hash features) and ``decode_fn='real'`` raises NotImplementedError —
the Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
is real and tested either way.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['MEDIA_SCHEMA', 'extract_features', 'sample_frames']

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


def extract_features(media: DataFrame, decode_fn: str = 'stub',
                     id_col: str = 'media_id', blob_col: str = 'blob') -> DataFrame:
    """media -> (media_id, features array<double>): the decode/featurize
    stage. Column-prunes to (id, blob) before the Arrow boundary."""
    if decode_fn == 'real':
        raise NotImplementedError(
            'real media decode requires image/audio libraries not present in '
            'this environment; plug a decode kernel in here')
    if decode_fn != 'stub':
        raise ValueError(f'unknown decode_fn: {decode_fn}')

    schema = f'{id_col} long, features array<double>'

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                id_col: pdf[id_col],
                'features': _stub_features(pdf[blob_col]),
            })

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
