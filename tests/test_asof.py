"""Unit tests for operators/asof.py (distributed as-of join)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from geostructures_spark.plans.session import get_session
from geostructures_spark.operators.asof import asof_join


@pytest.fixture(scope='module')
def spark():
    s = get_session(app='tests_asof', cores=4, shuffle_partitions=8)
    yield s


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture(scope='module')
def sides(spark):
    left = spark.createDataFrame(
        [('a', _ts(10), 1), ('a', _ts(20), 2), ('a', _ts(5), 3),
         ('b', _ts(15), 4)],
        'k string, ts timestamp, lid long')
    right = spark.createDataFrame(
        [('a', _ts(8), 100.0), ('a', _ts(20), 200.0), ('b', _ts(30), 300.0)],
        'k string, ts timestamp, px double')
    return left, right


def test_backward_inclusive(sides):
    left, right = sides
    got = {r['lid']: (r['r_ts'], r['r_px'])
           for r in asof_join(left, right, on='k').collect()}
    assert got[1] == (_ts(8), 100.0)     # latest <= 00:10
    assert got[2] == (_ts(20), 200.0)    # equal ts matches (inclusive)
    assert got[3] == (None, None)        # nothing before 00:05
    assert got[4] == (None, None)        # b's only purchase is later


def test_forward(sides):
    left, right = sides
    got = {r['lid']: r['r_px'] for r in
           asof_join(left, right, on='k', direction='forward').collect()}
    assert got == {1: 200.0, 2: 200.0, 3: 100.0, 4: 300.0}


def test_tolerance(sides):
    left, right = sides
    got = {r['lid']: r['r_px'] for r in
           asof_join(left, right, on='k',
                     tolerance_sec=150.0).collect()}
    # lid=1 gap is 120 s (ok); lid=2 gap 0 s; others unmatched
    assert got == {1: 100.0, 2: 200.0, 3: None, 4: None}


def test_left_rows_preserved(sides):
    left, right = sides
    assert asof_join(left, right, on='k').count() == left.count()


def test_single_exchange_plan(sides):
    """The whole as-of join must cost ONE shuffle (hash exchange on the
    key for the union), like a purpose-built merge-asof."""
    left, right = sides
    plan = asof_join(left, right, on='k')._jdf.queryExecution() \
        .executedPlan().toString()
    n_exchange = plan.count('Exchange hashpartitioning')
    assert n_exchange == 1, plan


# ---------------- hot-key (time-bucketed) plan ----------------

@pytest.fixture(scope='module')
def random_sides(spark):
    # many keys, clustered + sparse timestamps, duplicate left ts values
    left = spark.range(400).selectExpr(
        "concat('k', id % 7) AS k",
        "timestamp_seconds(1700000000 + (id * 7919) % 100000) AS ts",
        'id AS lid')
    right = spark.range(150).selectExpr(
        "concat('k', id % 5) AS k",
        "timestamp_seconds(1700000000 + (id * 104729) % 100000) AS ts",
        'cast(id AS double) AS px')
    return left, right


@pytest.mark.parametrize('direction', ['backward', 'forward'])
@pytest.mark.parametrize('width', [60.0, 3600.0, 1e9])
def test_bucketed_matches_plain(random_sides, direction, width):
    left, right = random_sides
    base = sorted(map(tuple, asof_join(
        left, right, on='k', direction=direction).collect()))
    got = sorted(map(tuple, asof_join(
        left, right, on='k', direction=direction,
        time_bucket_sec=width).collect()))
    assert got == base


def test_bucketed_tolerance_matches_plain(random_sides):
    left, right = random_sides
    base = sorted(map(tuple, asof_join(
        left, right, on='k', tolerance_sec=5000.0).collect()))
    got = sorted(map(tuple, asof_join(
        left, right, on='k', tolerance_sec=5000.0,
        time_bucket_sec=1800.0).collect()))
    assert got == base


def test_bucketed_hot_key_splits_partitions(spark):
    # Adversarial skew: ONE entity, 20k pings. The default plan funnels
    # the whole key through a single window task; the bucketed plan's
    # executed window must hash-partition on (k, __bkt) so per-task rows
    # are bounded by one bucket.
    left = spark.range(20000).selectExpr(
        "'hot' AS k",
        'timestamp_seconds(1700000000 + id * 3) AS ts',
        'id AS lid')
    right = spark.range(500).selectExpr(
        "'hot' AS k",
        'timestamp_seconds(1700000000 + id * 120 + 1) AS ts',
        'cast(id AS double) AS px')
    out = asof_join(left, right, on='k', time_bucket_sec=600.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert '__bkt' in plan and 'hashpartitioning' in plan
    # correctness on the skewed input: every left row matches the
    # latest right ping at-or-before it (right pings every 120 s from
    # +1 s, left every 3 s)
    rows = out.collect()
    assert len(rows) == 20000
    got = {r['lid']: r['r_px'] for r in rows}
    for lid in (0, 1, 40, 41, 19999):
        t_left = 1700000000 + lid * 3
        expect = (t_left - 1700000001) // 120
        expect = None if t_left < 1700000001 else float(min(expect, 499))
        assert got[lid] == expect, lid


def test_bucketed_numeric_ts(spark):
    # non-timestamp (double seconds) time column through the bucket path
    left = spark.createDataFrame(
        [('a', 10.0, 1), ('a', 55.5, 2)], 'k string, ts double, lid long')
    right = spark.createDataFrame(
        [('a', 9.0, 1.5), ('a', 50.0, 2.5)], 'k string, ts double, px double')
    got = {r['lid']: r['r_px'] for r in
           asof_join(left, right, on='k', time_bucket_sec=20.0).collect()}
    assert got == {1: 1.5, 2: 2.5}
