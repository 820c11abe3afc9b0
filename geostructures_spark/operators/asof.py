"""Distributed as-of (time-nearest) join.

The task brief names as-of join as a canonical operator Spark lacks: match
each left row to the temporally closest right row per key (backward = the
latest right.ts <= left.ts; forward = the earliest right.ts >= left.ts),
optionally within a tolerance. The reference's track algebra answers
point-in-time questions by slicing eager Python lists
(/root/reference/geostructures/collections.py Track.__getitem__ /
_slice_dt); this is the same question asked at table scale.

Spark-first plan — NOT a per-key UDF loop: both sides are tagged and
unioned, hash-shuffled ONCE on the key, and sorted within partitions by
(ts, side); a running ``last(right_payload, ignorenulls=True)`` window
then carries the most recent right row onto every left row. That is
exactly the merge plan a purpose-built as-of join executes: one Exchange
on the key, one in-partition sort, zero Python, no row expansion (the
window is rowsBetween(unboundedPreceding, current), which Spark evaluates
as a running accumulator — no O(n^2) frame rescan).

Scale notes (10^12 rows):
- cost = one shuffle of (left + right), same as any keyed join; AQE
  coalesces small partitions.
- a pathologically hot key serializes inside one task (windows cannot be
  salted without breaking the running-last semantics); the mitigation is
  the standard pre-filter — bucket both sides by coarse time range first,
  joining each right row into its own and the NEXT bucket, which bounds
  per-task rows while preserving backward matches across the bucket edge.
  That variant composes from this operator + a bucket column; the hot-key
  case (one entity with billions of pings) is rare enough that the simple
  form is the default, as in DuckDB/Pandas/kdb.

Ties: at equal (key, ts) the right row sorts BEFORE the left row, so a
backward match at ts == left.ts is inclusive (DuckDB ``ASOF JOIN ... ON
l.ts >= r.ts`` semantics). Multiple right rows at the exact same
(key, ts) have no defined winner (same as DuckDB) — deduplicate the right
side first when (key, ts) is not unique.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ['asof_join']


def asof_join(left: DataFrame, right: DataFrame, on: str | Sequence[str],
              left_ts: str = 'ts', right_ts: str = 'ts',
              direction: str = 'backward',
              tolerance_sec: Optional[float] = None,
              prefix: str = 'r_') -> DataFrame:
    """As-of join: left rows + the time-nearest right row per key.

    Returns every left row (left-join semantics) with the matched right
    row's non-key columns attached as ``<prefix><col>`` (null when no
    right row qualifies, or the nearest one is farther than
    ``tolerance_sec``).
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f'direction must be backward|forward: {direction}')
    keys = [on] if isinstance(on, str) else list(on)

    r_payload = [c for c in right.columns if c not in keys]
    if right_ts not in r_payload:
        raise ValueError(f'right_ts {right_ts!r} missing from right side')
    l_cols = [c for c in left.columns]

    l_tag = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias('__ts'),
        F.lit(1).alias('__is_left'),
        F.struct(*[F.col(c) for c in l_cols]).alias('__l'),
        F.lit(None).cast(
            'struct<' + ','.join(
                f'{c}:{right.schema[c].dataType.simpleString()}'
                for c in r_payload) + '>').alias('__r'))
    r_tag = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias('__ts'),
        F.lit(0).alias('__is_left'),
        F.lit(None).cast(
            'struct<' + ','.join(
                f'{c}:{left.schema[c].dataType.simpleString()}'
                for c in l_cols) + '>').alias('__l'),
        F.struct(*[F.col(c) for c in r_payload]).alias('__r'))

    u = l_tag.unionByName(r_tag)
    # backward: ascending ts, right-before-left at ties -> running last
    # forward: descending ts, right-before-left at ties -> running last is
    # the EARLIEST right row with ts >= left ts
    order = ([F.col('__ts').asc(), F.col('__is_left').asc()]
             if direction == 'backward'
             else [F.col('__ts').desc(), F.col('__is_left').asc()])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = u.withColumn('__m', F.last('__r', ignorenulls=True).over(w)) \
               .where(F.col('__is_left') == 1)

    if tolerance_sec is not None:
        lts = F.col('__ts').cast('timestamp')
        rts = F.col(f'__m.{right_ts}').cast('timestamp')
        gap = (F.unix_micros(lts) - F.unix_micros(rts)) / 1e6 \
            if direction == 'backward' \
            else (F.unix_micros(rts) - F.unix_micros(lts)) / 1e6
        matched = matched.withColumn(
            '__m', F.when(gap <= tolerance_sec, F.col('__m')))

    out_cols = ([F.col(f'__l.{c}').alias(c) for c in l_cols]
                + [F.col(f'__m.{c}').alias(f'{prefix}{c}')
                   for c in r_payload])
    return matched.select(*out_cols)
