"""Sequence packing (operators/packing.py): the distributed two-phase
prefix sum must equal a single-threaded Python cumsum for ANY
parallelism, and the seq-window math must match hand goldens."""

import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.packing import pack_sequences
from tests.test_spark_operators import spark  # shared session fixture


@pytest.fixture(scope='module')
def docs(spark):
    # ragged token counts incl. zero-token docs; ids deliberately sparse
    rows = [(i * 7 + (i % 3), ' '.join(['w'] * ((i * 13) % 29)))
            for i in range(500)]
    return spark.createDataFrame(rows, 'doc_id long, text string')


def _reference(rows, ctx):
    rows = sorted(rows)
    out, acc = {}, 0
    for doc_id, n in rows:
        out[doc_id] = (n, acc, acc // ctx, (acc + n - 1) // ctx)
        acc += n
    return out


def _tokens(text):
    t = text.strip()
    return len(t.split()) if t else 1  # split(' +') of '' yields ['']


def test_matches_reference_any_parallelism(spark, docs):
    rows = [(r['doc_id'], _tokens(r['text'])) for r in docs.collect()]
    want = _reference(rows, 256)
    for p in (1, 3, 32):
        res = pack_sequences(docs, 256, num_partitions=p)
        got = {r['doc_id']: (r['n_tokens'], r['start_off'],
                             r['first_seq'], r['last_seq'])
               for r in res.df.collect()}
        res.unpersist()
        assert got == want, f'parallelism {p}'


def test_precomputed_token_counts(spark):
    rows = [(1, 100), (2, 200), (3, 56), (4, 300)]
    df = spark.createDataFrame(rows, 'doc_id long, n long')
    res = pack_sequences(df, 256, n_tokens_col='n')
    got = {r['doc_id']: (r['start_off'], r['first_seq'], r['last_seq'])
           for r in res.df.collect()}
    res.unpersist()
    # stream: d1 [0,100) d2 [100,300) d3 [300,356) d4 [356,656)
    assert got[1] == (0, 0, 0)
    assert got[2] == (100, 0, 1)    # crosses the 256 boundary
    assert got[3] == (300, 1, 1)
    assert got[4] == (356, 1, 2)


def test_zero_token_doc_empty_span(spark):
    rows = [(1, 256), (2, 0), (3, 10)]
    df = spark.createDataFrame(rows, 'doc_id long, n long')
    res = pack_sequences(df, 256, n_tokens_col='n')
    got = {r['doc_id']: (r['start_off'], r['first_seq'], r['last_seq'])
           for r in res.df.collect()}
    res.unpersist()
    assert got[2] == (256, 1, 0)  # last_seq < first_seq == empty span


def test_rejects_bad_ctx(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
