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
