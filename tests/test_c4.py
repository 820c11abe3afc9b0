"""C4 cleaning rules (operators/c4.py): hand-built goldens, winner
semantics for the span dedup, and the zero-shuffle plan contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.c4 import (
    FLAG_BAD_WORD, FLAG_CURLY_BRACE, FLAG_FEW_SENTENCES, FLAG_LOREM_IPSUM,
    c4_clean, span_dedup)

from tests.test_spark_operators import spark  # shared session fixture

__ = spark


def _docs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        {'doc_id': list(range(len(rows))), 'text': rows}))


GOOD = ('This sentence has plenty of words and ends well.\n'
        'Another long line with many words follows here too!\n'
        'And a third one so the page clears the sentence rule.')


def test_line_rules(spark):
    rows = {r['doc_id']: r for r in c4_clean(_docs(spark, [
        GOOD,
        # no terminal punctuation -> dropped
        'home about contact menu with many words here',
        # fewer than 5 words -> dropped
        'Too short indeed.',
        # javascript mention -> dropped (even with punctuation + words)
        'Please enable JavaScript to view this page properly.',
        # closing double-quote counts as terminal
        'He said the words "now this line surely ends well."',
    ])).collect()}
    assert rows[0]['n_lines_kept'] == 3 and rows[0]['keep']
    for i in (1, 2, 3):
        assert rows[i]['n_lines_kept'] == 0 and not rows[i]['keep']
        assert rows[i]['kept_text'] == ''
    assert rows[4]['n_lines_kept'] == 1


def test_page_flags(spark):
    rows = {r['doc_id']: r for r in c4_clean(_docs(spark, [
        GOOD,
        GOOD + '\nAnd it renders {{mustache}} templates everywhere fine.',
        GOOD.replace('third', 'Lorem Ipsum third'),
        GOOD + '\nYou are a badword2 person and that is that.',
        'Just one proper sentence lives on this page.',
    ]), badwords=['badword1', 'badword2']).collect()}
    assert rows[0]['fail_mask'] == 0 and rows[0]['keep']
    assert rows[1]['fail_mask'] == FLAG_CURLY_BRACE
    assert rows[2]['fail_mask'] == FLAG_LOREM_IPSUM
    assert rows[3]['fail_mask'] == FLAG_BAD_WORD
    assert rows[4]['fail_mask'] == FLAG_FEW_SENTENCES
    assert not any(rows[i]['keep'] for i in (1, 2, 3, 4))


def test_badword_is_word_level_not_substring(spark):
    # 'class' must not trip a 'ass' badword — tokens, not substrings.
    rows = c4_clean(_docs(spark, ['The class acted with pure style today.']),
                    badwords=['ass']).collect()
    assert rows[0]['fail_mask'] & FLAG_BAD_WORD == 0


def test_span_dedup_keeps_first_occurrence(spark):
    block = 'Red one. Red two. Red three.'
    rows = {r['doc_id']: r for r in span_dedup(_docs(spark, [
        f'Unique opener zero. {block} Unique closer zero.',
        f'{block} Unique closer one.',
        'Totally unrelated page. With its own sentences. All three unique.',
        f'Unique opener three. Another unique line three. {block}',
    ])).collect()}
    # doc 0 wins (min doc_id; its block starts at sentence 1)
    assert rows[0]['n_dropped'] == 0
    # sentence splitting drops the delimiter: kept_text is unpunctuated
    assert rows[0]['kept_text'].startswith('Unique opener zero Red one')
    assert rows[1]['n_dropped'] == 3
    assert rows[1]['kept_text'] == 'Unique closer one'
    assert rows[2]['n_dropped'] == 0
    assert rows[3]['n_dropped'] == 3
    assert rows[3]['kept_text'] == ('Unique opener three'
                                    ' Another unique line three')


def test_span_dedup_overlapping_removals_union(spark):
    # Two duplicated triples overlapping in one doc: drops union, no
    # double counting.
    a, b, c, d = 'Aa aa one.', 'Bb bb two.', 'Cc cc three.', 'Dd dd four.'
    rows = {r['doc_id']: r for r in span_dedup(_docs(spark, [
        f'{a} {b} {c}',
        f'{b} {c} {d}',
        f'Opened uniquely here. {a} {b} {c} {d}',
    ])).collect()}
    assert rows[0]['n_dropped'] == 0 and rows[1]['n_dropped'] == 0
    assert rows[2]['n_dropped'] == 4
    assert rows[2]['kept_text'] == 'Opened uniquely here'


def test_span_dedup_short_docs_untouched(spark):
    rows = {r['doc_id']: r for r in span_dedup(_docs(spark, [
        'One. Two.', 'One. Two.', '', 'Single.'
    ])).collect()}
    for i in range(4):
        assert rows[i]['n_dropped'] == 0
    assert rows[0]['kept_text'] == 'One Two'
    assert rows[0]['n_sentences'] == 2 and rows[2]['n_sentences'] == 0


def test_c4_clean_plan_has_no_exchange(spark):
    plan = (c4_clean(_docs(spark, [GOOD]), badwords=['x'])
            ._jdf.queryExecution().executedPlan().toString())
    assert 'Exchange' not in plan
