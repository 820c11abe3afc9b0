"""BM25 retrieval (operators/bm25.py) vs a scalar replay, plus ranking
and plan contracts."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.bm25 import bm25_topk

from tests.test_spark_operators import spark  # shared session fixture

__ = spark


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {'doc_id': list(range(len(rows))), 'text': rows}))


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = [t.split() for t in corpus]
    n = float(len(toks))
    avgdl = sum(len(t) for t in toks) / n
    scores = {}
    for d, ts in enumerate(toks):
        s = 0.0
        for term in set(terms):
            tf = float(ts.count(term))
            if tf == 0:
                continue
            df = float(sum(1 for o in toks if term in o))
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(ts) / avgdl))
        if s:
            scores[d] = round(s, 6)
    return scores


def test_matches_scalar_replay(spark):
    corpus = [
        'the quick brown fox jumps over the lazy dog',
        'the lazy dog sleeps all day long in peace',
        'quick quick quick brown foxes everywhere around here',
        'completely unrelated text about spark and shuffles',
    ]
    got = bm25_topk(_docs(spark, corpus), [(7, ['quick', 'fox'])],
                    k=10).collect()
    exp = _py_bm25(corpus, ['quick', 'fox'])
    assert {r['doc_id']: r['score'] for r in got} == exp
    order = sorted(exp, key=lambda d: (-exp[d], d))
    assert [r['doc_id'] for r in sorted(got, key=lambda r: r['rank'])] == order
    assert all(r['query_id'] == 7 for r in got)


def test_rare_term_beats_common_term(spark):
    corpus = (['common words fill this entire document space here'] * 6
              + ['common rare words fill this document space here'])
    got = bm25_topk(_docs(spark, corpus), [(0, ['rare'])], k=3).collect()
    assert [r['doc_id'] for r in got] == [6]


def test_k_cut_and_tie_break(spark):
    corpus = ['apple banana'] * 5 + ['banana cherry']
    rows = bm25_topk(_docs(spark, corpus), [(0, ['apple'])], k=3).collect()
    # five identical docs tie on score; top-3 by doc_id
    assert [r['doc_id'] for r in sorted(rows, key=lambda r: r['rank'])] \
        == [0, 1, 2]
    assert len({r['score'] for r in rows}) == 1


def test_multi_query_isolation(spark):
    corpus = ['alpha beta gamma', 'delta epsilon zeta', 'alpha delta']
    rows = bm25_topk(_docs(spark, corpus),
                     [(0, ['alpha']), (1, ['delta'])], k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r['query_id'], set()).add(r['doc_id'])
    assert by_q[0] == {0, 2} and by_q[1] == {1, 2}


def test_hits_filtered_before_shuffle(spark):
    df = bm25_topk(_docs(spark, ['x y z']), [(0, ['x'])], k=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the corpus explode joins the broadcast query terms map-side
    assert 'BroadcastHashJoin' in plan


def test_tfidf_top_terms_golden(spark):
    import math
    from geostructures_spark.operators.textstats import tfidf_top_terms
    corpus = ['apple apple banana common',
              'banana cherry common',
              'cherry cherry cherry common']
    rows = tfidf_top_terms(_docs(spark, corpus), k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r['doc_id'], []).append((r['rank'], r['term'],
                                                   r['score']))
    # doc 0: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert [t for _, t, _ in sorted(by_doc[0])] == ['apple', 'banana']
    assert sorted(by_doc[0])[0][2] == round(2 * math.log(3.0), 6)
    # 'common' appears in every doc: idf = 0, never a top term over a
    # positive-scoring one; doc 2's top is cherry
    assert sorted(by_doc[2])[0][1] == 'cherry'
    assert all(r['rank'] <= 2 for r in rows)


def test_rrf_fuse_golden(spark):
    import pandas as pd
    from geostructures_spark.operators.bm25 import rrf_fuse
    a = spark.createDataFrame(pd.DataFrame(
        {'query_id': [0, 0, 0], 'doc_id': [10, 11, 12], 'rank': [1, 2, 3]}))
    b = spark.createDataFrame(pd.DataFrame(
        {'query_id': [0, 0], 'doc_id': [12, 13], 'rank': [1, 2]}))
    rows = {r['doc_id']: r for r in rrf_fuse([a, b], k=4).collect()}
    # doc 12: in both lists -> 1/63 + 1/61 beats every single-list doc
    assert rows[12]['rank'] == 1
    assert rows[12]['rrf_score'] == round(1 / 63 + 1 / 61, 12)
    # doc 10 (1/61) and doc 13 (1/62) and doc 11 (1/62)... doc 10 next
    assert rows[10]['rank'] == 2
    assert rows[10]['rrf_score'] == round(1 / 61, 12)
    # docs 11 and 13 tie at 1/62 -> doc_id ascending
    assert rows[11]['rank'] == 3 and rows[13]['rank'] == 4
