"""Deterministic synthetic media blobs (real WAV/PPM containers).

Every blob's *content* follows closed-form integer arithmetic on
(media_id, position), so an independent implementation — the DuckDB
contract oracle — can recompute any decoded quantity without touching the
binary, while the Spark side must round-trip through the genuine codecs in
kernels/media.py. Even ids become 8x8 P6 PPM images, odd ids 64-sample
PCM16 WAVs:

    pixel(r, c, ch) = (id*31 + r*7 + c*3 + ch*11) % 256
    sample(i)       = (id*13 + i*17) % 2048 - 1024        (rate 8000)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['media_blobs', 'IMG_SIZE', 'N_SAMPLES', 'SAMPLE_RATE']

IMG_SIZE = 8
N_SAMPLES = 64
SAMPLE_RATE = 8000


def media_blobs(ids: DataFrame, id_col: str = 'media_id') -> DataFrame:
    """ids -> (media_id, blob binary, meta struct) with real containers."""
    from geostructures_spark.kernels.media import encode_ppm, encode_wav

    schema = (f'{id_col} long, blob binary, '
              'meta struct<kind:string,width:int,height:int,duration_ms:int>')

    r_idx, c_idx, ch_idx = np.meshgrid(np.arange(IMG_SIZE), np.arange(IMG_SIZE),
                                       np.arange(3), indexing='ij')
    i_idx = np.arange(N_SAMPLES)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 2 == 0:
                    img = ((mid * 31 + r_idx * 7 + c_idx * 3 + ch_idx * 11)
                           % 256).astype(np.uint8)
                    rows.append((mid, encode_ppm(img),
                                 ('image', IMG_SIZE, IMG_SIZE, 0)))
                else:
                    s = ((mid * 13 + i_idx * 17) % 2048 - 1024).astype(np.int16)
                    dur_ms = int(N_SAMPLES * 1000 / SAMPLE_RATE)
                    rows.append((mid, encode_wav(s, SAMPLE_RATE),
                                 ('audio', 0, 0, dur_ms)))
            yield pd.DataFrame(rows, columns=[id_col, 'blob', 'meta'])

    return ids.select(F.col(id_col).cast('long')).mapInPandas(run, schema=schema)
