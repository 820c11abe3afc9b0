"""Ring-column transport for Arrow-batched Python operators.

Spark 4's Arrow->pandas input converter fails on *inhomogeneous* nested
arrays: a rings column ``array<array<struct<lon,lat>>>`` whose rings have
different vertex counts within one row (e.g. a holed multipolygon) raises
"setting an array element with a sequence" inside the worker's
arrow_to_pandas. The robust transport is JSON: encode rings JVM-side with
``to_json`` (Jackson emits round-trippable doubles), decode with
``json.loads`` in the Python worker — bit-exact doubles both ways, any ring
shape. Python->Arrow *output* of nested lists works fine, so operators
re-emit decoded rings as lists.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['encode_rings_json', 'decode_rings_json', 'RINGS_TYPE']

RINGS_TYPE = 'array<array<struct<lon:double,lat:double>>>'


def encode_rings_json(df: DataFrame, rings_col: str = 'rings') -> DataFrame:
    """Replace the rings column with its JSON string encoding (NULL-safe)."""
    return df.withColumn(
        rings_col,
        F.when(F.col(rings_col).isNotNull(), F.to_json(F.col(rings_col))))


def decode_rings_json(s):
    """JSON string -> list of rings ([{'lon': .., 'lat': ..}, ...]) or None."""
    if s is None or (isinstance(s, float)):
        return None
    return json.loads(s)
