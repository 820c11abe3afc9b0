"""Right-open time-interval kernels (pure NumPy, no Spark).

Reimplements the reference's TimeInterval semantics
(``/root/reference/geostructures/time.py:27-226``) over int64 epoch-
microsecond arrays, the natural representation of Spark TimestampType.

Semantics (load-bearing for parity):
- intervals are right-open [start, end)
- an interval with start == end is an *instant*
- two instants are disjoint unless equal (time.py:200-204)
- an instant vs an interval uses membership: start <= t < end, except an
  instant interval contains only its exact time (time.py:67-78)
- containment (issuperset/issubset) is closed on both ends:
  o.start <= s.start and s.end <= o.end (time.py:216-222)

These same predicates are emitted as Spark Column expressions in
``geostructures_spark.functions.temporal`` — this module is the NumPy twin
used inside pandas UDF kernels and unit tests.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    'contains_time', 'intersects_interval', 'isdisjoint', 'issubset',
    'contains_instant', 'elapsed_seconds',
]


def _as_i64(x):
    return np.asarray(x, dtype=np.int64)


def contains_instant(start, end, t):
    """datetime in interval (time.py:67-78): instant -> equality, else
    half-open membership."""
    start, end, t = _as_i64(start), _as_i64(end), _as_i64(t)
    is_instant = start == end
    return np.where(is_instant, start == t, (start <= t) & (t < end))


def isdisjoint(s_start, s_end, o_start, o_end):
    """TimeInterval.isdisjoint (time.py:200-214) with instant special cases."""
    s_start, s_end = _as_i64(s_start), _as_i64(s_end)
    o_start, o_end = _as_i64(o_start), _as_i64(o_end)
    s_instant = s_start == s_end
    o_instant = o_start == o_end

    both = s_instant & o_instant
    plain = (s_end <= o_start) | (s_start >= o_end)
    s_in_o = contains_instant(o_start, o_end, s_start)
    o_in_s = contains_instant(s_start, s_end, o_start)

    return np.where(
        both, s_start != o_start,
        np.where(s_instant, ~s_in_o,
                 np.where(o_instant, ~o_in_s, plain)))


def intersects_interval(s_start, s_end, o_start, o_end):
    """TimeInterval.intersects (time.py:188-192)."""
    return ~isdisjoint(s_start, s_end, o_start, o_end)


def issubset(s_start, s_end, o_start, o_end):
    """s ⊆ o (time.py:216-218): o.start <= s.start and s.end <= o.end."""
    return (_as_i64(o_start) <= _as_i64(s_start)) & (_as_i64(s_end) <= _as_i64(o_end))


def contains_time(s_start, s_end, o_start, o_end):
    """Shape-level contains_time gate (reference _base.py:326-340):
    s contains o iff o ⊆ s."""
    return issubset(o_start, o_end, s_start, s_end)


def elapsed_seconds(start, end):
    """Interval length in seconds (time.py:85-88), for total_time aggregation
    (utils/agg_functions.py:9-24)."""
    return (_as_i64(end) - _as_i64(start)) / 1_000_000.0
