"""Unit tests for operators/corpus.py (line dedup + decontamination)."""

import pytest
from pyspark.sql import functions as F

from geostructures_spark.plans.session import get_session
from geostructures_spark.operators.corpus import (
    flag_contaminated, ngram_md5_expr, remove_duplicate_lines)


@pytest.fixture(scope='module')
def spark():
    s = get_session(app='tests_corpus', cores=4, shuffle_partitions=8)
    yield s


def _docs(spark, rows):
    return spark.createDataFrame(rows, 'doc_id long, text string')


def test_remove_duplicate_lines_basic(spark):
    rows = [
        (0, 'cookie banner\nunique zero\ncookie banner'),
        (1, 'cookie banner\nunique one'),
        (2, 'only unique two'),
    ]
    out = {r['doc_id']: r for r in
           remove_duplicate_lines(_docs(spark, rows)).collect()}
    assert out[0]['kept_text'] == 'unique zero'
    assert (out[0]['n_lines'], out[0]['n_removed']) == (3, 2)
    assert out[1]['kept_text'] == 'unique one'
    assert out[2]['kept_text'] == 'only unique two'
    assert out[2]['n_removed'] == 0


def test_remove_duplicate_lines_trim_normalization(spark):
    # '  menu' and 'menu  ' normalize to the same line -> both removed
    rows = [(0, '  menu\nkeep a'), (1, 'menu  \nkeep b')]
    out = {r['doc_id']: r['kept_text'] for r in
           remove_duplicate_lines(_docs(spark, rows)).collect()}
    assert out == {0: 'keep a', 1: 'keep b'}


def test_remove_duplicate_lines_empty_lines_survive(spark):
    # blank lines appear everywhere but are never counted as boilerplate
    rows = [(0, 'a\n\nb'), (1, 'c\n\nd'), (2, 'e\n\nf')]
    out = {r['doc_id']: r for r in
           remove_duplicate_lines(_docs(spark, rows)).collect()}
    assert out[0]['kept_text'] == 'a\n\nb'
    assert all(out[i]['n_removed'] == 0 for i in range(3))


def test_remove_duplicate_lines_all_removed(spark):
    rows = [(0, 'spam'), (1, 'spam'), (2, 'spam\nreal content')]
    out = {r['doc_id']: r for r in
           remove_duplicate_lines(_docs(spark, rows)).collect()}
    assert out[0]['kept_text'] == '' and out[0]['n_removed'] == 1
    assert out[2]['kept_text'] == 'real content'


def test_ngram_short_text_guard(spark):
    # fewer tokens than n must yield [] (not a descending sequence blowup)
    df = spark.createDataFrame([('a b',), ('a b c d e',)], 'text string')
    got = df.select(F.size(ngram_md5_expr(F.col('text'), 5)).alias('k')) \
            .collect()
    assert [r['k'] for r in got] == [0, 1]


def test_flag_contaminated(spark):
    docs = _docs(spark, [
        (0, 'the quick brown fox jumps over the lazy dog'),
        (1, 'totally unrelated text with no overlap at all'),
        (2, 'prefix words then quick brown fox jumps over suffix'),
    ])
    ev = spark.createDataFrame(
        [('quick brown fox jumps over',)], 'etext string')
    got = {r['doc_id']: r['n_hits']
           for r in flag_contaminated(docs, ev, n=5).collect()}
    assert got == {0: 1, 2: 1}


def test_flag_contaminated_broadcasts_eval_side(spark):
    docs = _docs(spark, [(0, 'a b c d e f')])
    ev = spark.createDataFrame([('a b c d e',)], 'etext string')
    plan = flag_contaminated(docs, ev, n=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert 'BroadcastHashJoin' in plan


def test_ngram_novelty_golden(spark):
    import pandas as pd
    from geostructures_spark.operators.corpus import ngram_novelty
    docs = spark.createDataFrame(pd.DataFrame({
        'doc_id': [0, 1, 2, 3],
        'text': ['a b c d',          # grams: abc, bcd
                 'a b c e',          # grams: abc, bce
                 'x y z w v',        # all unique
                 'a b'],             # shorter than n
    }))
    rows = {r['doc_id']: r for r in ngram_novelty(docs, n=3).collect()}
    # 'a b c' occurs in docs 0 and 1 -> not novel there
    assert rows[0]['n_grams'] == 2 and rows[0]['n_novel'] == 1
    assert rows[0]['novelty'] == 0.5
    assert rows[1]['novelty'] == 0.5
    assert rows[2]['n_grams'] == 3 and rows[2]['novelty'] == 1.0
    assert rows[3]['n_grams'] == 0 and rows[3]['novelty'] is None
