"""Stateful streaming track operators (applyInPandasWithState).

The batch ``filter_impossible_journeys`` (operators/tracks.py:103, mirroring
reference collections.py:917-955) is a sequential greedy scan whose keep
decision depends on the last *kept* ping — under continuous ingest that
anchor is exactly per-entity streaming state. This module runs the same
kernel loop inside ``applyInPandasWithState``: each micro-batch's pings are
sorted within the batch, the greedy loop is seeded from the entity's stored
anchor, kept pings are appended to the output stream, and the final anchor
is written back to state.

Equivalence contract (tested): if pings arrive time-ordered across
micro-batches (per entity), the streamed output equals the batch operator's
output on the union of the batches. Late pings (before the stored anchor)
are dropped by the same speed rule they would fail in the reference's scan.

Scale shape: state is 3 doubles per entity; each micro-batch shuffles only
on the entity key (the same partitioning the batch groupBy uses), so state
stays local to its partition across batches — no rescan of history, which
is the property that makes this viable on an unbounded 100 TB ping stream
where the batch operator would have to re-sort the full history each run.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ['filter_impossible_journeys_stream', 'run_impossible_to_memory',
           'PINGS_SCHEMA']

from geostructures_spark.operators.tracks import greedy_keep

PINGS_SCHEMA = 'entity long, dt_start timestamp, lon double, lat double'
_STATE_SCHEMA = 'anchor_lon double, anchor_lat double, anchor_ts double'
_OUT_SCHEMA = PINGS_SCHEMA


def filter_impossible_journeys_stream(pings: DataFrame,
                                      max_speed_mps: float) -> DataFrame:
    """Streaming form of filter_impossible_journeys over a ``PINGS_SCHEMA``
    stream: per-entity greedy speed filter with the anchor carried in
    GroupState. Emits kept pings (append mode)."""

    def update(key: Tuple[Any], batches: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            anchor = tuple(state.get)
        else:
            anchor = (float('nan'), float('nan'), float('nan'))
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = pdf.sort_values('dt_start', kind='stable').reset_index(drop=True)
            lons = pdf['lon'].to_numpy(np.float64)
            lats = pdf['lat'].to_numpy(np.float64)
            ts = pdf['dt_start'].astype('int64').to_numpy() / 1e9
            keep, new_anchor = greedy_keep(lons, lats, ts, max_speed_mps, anchor)
            if new_anchor is not None:
                anchor = new_anchor
            out = pdf.iloc[keep]
            if len(out):
                yield out
        if not np.isnan(anchor[2]):
            state.update((float(anchor[0]), float(anchor[1]), float(anchor[2])))

    return (pings.groupBy('entity')
            .applyInPandasWithState(update, _OUT_SCHEMA, _STATE_SCHEMA,
                                    'append', GroupStateTimeout.NoTimeout))


def run_impossible_to_memory(spark: SparkSession, parquet_dir: str,
                             max_speed_mps: float,
                             query_name: str = 'journeys_kept') -> DataFrame:
    """Drive the stateful filter over a parquet directory source (one file
    per micro-batch via maxFilesPerTrigger, preserving file order) to
    completion; returns the materialized kept pings."""
    stream = (spark.readStream.schema(PINGS_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(parquet_dir))
    kept = filter_impossible_journeys_stream(stream, max_speed_mps)
    q = (kept.writeStream.outputMode('append')
         .format('memory').queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f'SELECT * FROM {query_name}')
