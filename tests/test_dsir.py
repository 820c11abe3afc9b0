"""DSIR importance weights (operators/dsir.py) vs scalar replay."""

import hashlib
import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.dsir import (dsir_bucket_probs,
                                                dsir_features,
                                                dsir_logweights)

from tests.test_spark_operators import spark  # shared session fixture

__ = spark

M = 64


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {'doc_id': range(len(rows)), 'text': rows}))


def _feats(text):
    import re
    w = [x for x in re.sub('[^a-z ]', ' ', text[:150].lower()).split(' ')
         if x != '']
    grams = w + [f'{a} {b}' for a, b in zip(w, w[1:])]
    out = {}
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % M
        out[b] = out.get(b, 0) + 1
    return out


def test_features_match_scalar(spark):
    rows = ['the cat sat on the mat', 'dogs bark', 'x', '']
    got = {}
    for r in dsir_features(_docs(spark, rows), m=M).collect():
        got.setdefault(r['doc_id'], {})[r['bucket']] = r['c']
    for i, t in enumerate(rows):
        assert got.get(i, {}) == _feats(t), i


def test_logweights_match_scalar_and_favor_target(spark):
    raw_rows = ['alpha beta alpha beta', 'gamma delta gamma',
                'alpha beta gamma', 'epsilon zeta eta']
    tgt_rows = ['alpha beta alpha', 'alpha beta beta']
    raw = _docs(spark, raw_rows)
    tgt = _docs(spark, tgt_rows)
    got = {r['doc_id']: (r['n_feats'], r['logweight'])
           for r in dsir_logweights(raw, tgt, m=M).collect()}
    # scalar replay
    fr = [_feats(t) for t in raw_rows]
    ft = [_feats(t) for t in tgt_rows]
    def tot(fs):
        return sum(sum(f.values()) for f in fs)
    def cnt(fs):
        c = {}
        for f in fs:
            for b, v in f.items():
                c[b] = c.get(b, 0) + v
        return c
    cr, ct = cnt(fr), cnt(ft)
    nr, nt = tot(fr), tot(ft)
    for i, f in enumerate(fr):
        lw = sum(v * (math.log((ct.get(b, 0) + 1) / (nt + M))
                      - math.log((cr[b] + 1) / (nr + M)))
                 for b, v in f.items())
        assert got[i][0] == sum(f.values())
        assert got[i][1] == pytest.approx(round(lw, 6), abs=2e-6), i
    # the alpha-beta doc must outscore the epsilon doc against an
    # alpha-beta target
    assert got[0][1] > got[3][1]


def test_empty_doc_scores_zero(spark):
    raw = _docs(spark, ['alpha beta', ''])
    tgt = _docs(spark, ['alpha'])
    got = {r['doc_id']: (r['n_feats'], r['logweight'])
           for r in dsir_logweights(raw, tgt, m=M).collect()}
    assert got[1] == (0, 0.0)


def test_bucket_probs_sum_with_smoothing(spark):
    f = dsir_features(_docs(spark, ['a b c d e']), m=M)
    probs = dsir_bucket_probs(f, m=M).collect()
    n = sum(r['cb'] for r in
            f.groupBy('bucket').agg(F.sum('c').alias('cb')).collect())
    # seen buckets: (c+1)/(n+m); full distribution sums to 1 once the
    # (m - seen) unseen buckets' 1/(n+m) floors are added
    seen = sum(r['p'] for r in probs)
    assert seen + (M - len(probs)) / (n + M) == pytest.approx(1.0)
