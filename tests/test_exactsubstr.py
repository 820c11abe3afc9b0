"""ExactSubstr window-hash span removal (operators/exactsubstr.py)."""

import pandas as pd

from geostructures_spark.operators.exactsubstr import exactsubstr_spans

from tests.test_spark_operators import spark  # shared session fixture

__ = spark


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {'doc_id': list(range(len(rows))), 'text': rows}))


def test_cross_doc_duplicate_span(spark):
    shared = 'one two three four'
    rows = {r['doc_id']: r for r in exactsubstr_spans(_docs(spark, [
        f'alpha beta {shared} gamma delta',
        f'epsilon zeta {shared} eta theta',
        'iota kappa lambda mu nu xi omicron pi',
    ]), L=4).collect()}
    # the 4-token shared block repeats; maximal coverage is exactly it
    assert rows[0]['n_spans'] == 1 and rows[0]['n_dup_tokens'] == 4
    assert rows[0]['spans_str'] == '2-5'
    assert rows[0]['kept_text'] == 'alpha beta gamma delta'
    assert rows[1]['spans_str'] == '2-5'
    assert rows[2]['n_spans'] == 0 and rows[2]['n_dup_tokens'] == 0
    assert rows[2]['kept_text'].startswith('iota kappa')


def test_within_doc_repeat_is_covered(spark):
    block = 'red green blue white'
    rows = exactsubstr_spans(_docs(spark, [
        f'{block} filler words here {block}',
    ]), L=4).collect()
    r = rows[0]
    assert r['n_spans'] == 2 and r['n_dup_tokens'] == 8
    assert r['kept_text'] == 'filler words here'


def test_longer_match_forms_single_span(spark):
    # a 6-token shared substring with L=4: its three 4-windows all
    # repeat, and the covered union is one maximal 6-token span
    shared = 'aa bb cc dd ee ff'
    rows = {r['doc_id']: r for r in exactsubstr_spans(_docs(spark, [
        f'start {shared} finish words',
        f'other {shared} closing words',
    ]), L=4).collect()}
    assert rows[0]['n_spans'] == 1
    assert rows[0]['spans_str'] == '1-6'
    assert rows[0]['n_dup_tokens'] == 6


def test_short_docs_have_no_windows(spark):
    rows = {r['doc_id']: r for r in exactsubstr_spans(_docs(spark, [
        'tiny doc', 'tiny doc', '',
    ]), L=8).collect()}
    for i in range(3):
        assert rows[i]['n_spans'] == 0
    assert rows[0]['kept_text'] == 'tiny doc'
    assert rows[2]['n_tokens'] == 0 and rows[2]['kept_text'] == ''


def test_fully_duplicated_doc_empties(spark):
    t = 'p q r s t u v w'
    rows = {r['doc_id']: r for r in exactsubstr_spans(
        _docs(spark, [t, t]), L=8).collect()}
    for i in (0, 1):
        assert rows[i]['n_dup_tokens'] == 8
        assert rows[i]['kept_text'] == ''
        assert rows[i]['spans_str'] == '0-7'
