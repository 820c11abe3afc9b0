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
  salted without breaking the running-last semantics); pass
  ``time_bucket_sec`` to switch to the hot-key plan: both sides bucket by
  coarse time range, a bucket-granular carry-in table (the last right row
  BEFORE each bucket, computed with a per-key window over bucket summaries
  — rows = buckets, not pings) is injected as one synthetic right row per
  (key, bucket), and the running-last window partitions by (key, bucket).
  Per-task rows are then bounded by one bucket's rows + 1, at the cost of
  two extra bucket-granular shuffles. Identical results to the simple
  plan for any bucket width; the hot-key case (one entity with billions
  of pings) is rare enough that the simple form is the default, as in
  DuckDB/Pandas/kdb.

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
              prefix: str = 'r_',
              time_bucket_sec: Optional[float] = None) -> DataFrame:
    """As-of join: left rows + the time-nearest right row per key.

    Returns every left row (left-join semantics) with the matched right
    row's non-key columns attached as ``<prefix><col>`` (null when no
    right row qualifies, or the nearest one is farther than
    ``tolerance_sec``).

    ``time_bucket_sec`` switches to the hot-key plan (see module
    docstring): the running-last window partitions by (key, coarse time
    bucket) instead of key alone, with a bucket-granular carry-in row
    preserving matches across bucket edges — per-task rows bounded by
    one bucket regardless of key skew. Results identical to the default
    plan for any width.
    """
    if direction not in ('backward', 'forward'):
        raise ValueError(f'direction must be backward|forward: {direction}')
    keys = [on] if isinstance(on, str) else list(on)

    r_payload = [c for c in right.columns if c not in keys]
    if right_ts not in r_payload:
        raise ValueError(f'right_ts {right_ts!r} missing from right side')
    l_cols = [c for c in left.columns]

    l_null = ('struct<' + ','.join(
        f'{c}:{left.schema[c].dataType.simpleString()}'
        for c in l_cols) + '>')
    r_null = ('struct<' + ','.join(
        f'{c}:{right.schema[c].dataType.simpleString()}'
        for c in r_payload) + '>')

    l_tag = left.select(
        *[F.col(c) for c in keys],
        F.col(left_ts).alias('__ts'),
        F.lit(1).alias('__is_left'),
        F.struct(*[F.col(c) for c in l_cols]).alias('__l'),
        F.lit(None).cast(r_null).alias('__r'))
    r_tag = right.select(
        *[F.col(c) for c in keys],
        F.col(right_ts).alias('__ts'),
        F.lit(0).alias('__is_left'),
        F.lit(None).cast(l_null).alias('__l'),
        F.struct(*[F.col(c) for c in r_payload]).alias('__r'))

    # backward: ascending ts, right-before-left at ties -> running last
    # forward: descending ts, right-before-left at ties -> running last is
    # the EARLIEST right row with ts >= left ts
    backward = direction == 'backward'
    order = ([F.col('__ts').asc(), F.col('__is_left').asc()] if backward
             else [F.col('__ts').desc(), F.col('__is_left').asc()])

    if time_bucket_sec is None:
        u = l_tag.unionByName(r_tag)
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        # Hot-key plan: partition the window by (key, coarse bucket) so
        # a skewed key splits across tasks. Matches that cross a bucket
        # edge are preserved by ONE synthetic carry-in row per
        # (key, bucket): the extreme right row from the match-direction
        # side of the bucket (latest earlier row for backward, earliest
        # later row for forward), computed over bucket SUMMARIES — the
        # per-key carry window sees one row per bucket, not per ping,
        # so the hot key never serializes its rows anywhere.
        ts_t = left.schema[left_ts].dataType.simpleString()
        # the bucket conversion is chosen from the LEFT ts type and applied
        # to both sides' __ts — make the incidental constraint explicit
        # (ADVICE r5): unionByName would reject a mismatch later anyway,
        # but fail here with the actual reason
        right_t = right.schema[right_ts].dataType.simpleString()
        if ts_t.startswith('timestamp') != right_t.startswith('timestamp'):
            raise ValueError(
                f'asof_join(time_bucket_sec=...) needs matching ts kinds: '
                f'left {left_ts}:{ts_t} vs right {right_ts}:{right_t}')
        if ts_t.startswith('timestamp'):
            def _sec(c):
                return F.unix_micros(c.cast('timestamp')) / F.lit(1e6)
        else:
            def _sec(c):
                return c.cast('double')
        bkt = F.floor(_sec(F.col('__ts'))
                      / F.lit(float(time_bucket_sec))).cast('long')
        l_tag = l_tag.withColumn('__bkt', bkt)
        r_tag = r_tag.withColumn('__bkt', bkt)

        ext = (F.max_by(F.struct('__ts', '__r'), '__ts') if backward
               else F.min_by(F.struct('__ts', '__r'), '__ts'))
        rb = r_tag.groupBy(*keys, '__bkt').agg(ext.alias('__ext'))
        lb = (l_tag.select(*keys, '__bkt').distinct()
              .withColumn('__has_left', F.lit(1)))
        allb = lb.join(rb, [*keys, '__bkt'], 'full')
        w_c = (Window.partitionBy(*keys)
               .orderBy(F.col('__bkt').asc() if backward
                        else F.col('__bkt').desc())
               .rowsBetween(Window.unboundedPreceding, -1))
        carry = (allb
                 .withColumn('__c', F.last('__ext', ignorenulls=True)
                             .over(w_c))
                 .where(F.col('__has_left').isNotNull()
                        & F.col('__c').isNotNull()))
        carry_tag = carry.select(
            *[F.col(c) for c in keys],
            F.col('__c.__ts').alias('__ts'),
            F.lit(0).alias('__is_left'),
            F.lit(None).cast(l_null).alias('__l'),
            F.col('__c.__r').alias('__r'),
            F.col('__bkt'))
        u = l_tag.unionByName(r_tag).unionByName(carry_tag)
        # the carry row's ts lies strictly outside its assigned bucket
        # on the match side, so it sorts before every in-bucket row
        # under either direction's ordering — exactly the running-last
        # seed the un-bucketed plan would have carried in.
        w = (Window.partitionBy(*keys, '__bkt').orderBy(*order)
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
