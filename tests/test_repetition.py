"""Gopher-style repetition metrics (operators/repetition.py): the Arrow
kernel and the pure-JVM DataFrame form must agree bit-for-bit with each
other AND with an independent per-document Python recomputation
(collections.Counter — no shared code with either path under test)."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.repetition import (
    REP_COLS, repetition_stats, repetition_stats_df)
from tests.test_spark_operators import spark  # shared session fixture

DOCS = [
    (0, 'a b a b a b c'),                    # heavy bigram repetition
    (1, 'the cat sat on the mat'),           # one repeated word
    (2, 'x y z w v u t s r q p o n m'),      # all distinct
    (3, 'spam spam spam spam spam spam'),    # one word only
    (4, 'one two three four five one two three four five end'),  # dup 5-gram
    (5, 'tiny'),                             # shorter than every n-gram
    (6, 'aa bb'),                            # bigram only, no trigram
    (7, '  padded   with   extra   spaces  padded with extra spaces '),
]


def _ref_metrics(text):
    toks = text.strip().split()
    n_chars = max(len(text), 1)
    out = {}
    for n in (2, 3):
        grams = Counter(tuple(toks[i:i + n])
                        for i in range(len(toks) - n + 1))
        if grams:
            # lexicographic (cnt, chars) max — the fraction is cnt*chars
            c, chars = max(((c, sum(len(w) for w in g) + (n - 1))
                            for g, c in grams.items()))
            out[f'top{n}_char_frac'] = c * chars / n_chars
        else:
            out[f'top{n}_char_frac'] = 0.0
    g5 = Counter(tuple(toks[i:i + 5]) for i in range(len(toks) - 4))
    tot = sum(c * (sum(len(w) for w in g) + 4) for g, c in g5.items())
    dup = sum(c * (sum(len(w) for w in g) + 4)
              for g, c in g5.items() if c > 1)
    out['dup5_char_frac'] = dup / max(tot, 1)
    out['dup_word_frac'] = (len(toks) - len(set(toks))) / max(len(toks), 1)
    return out


@pytest.fixture(scope='module')
def docs(spark):
    return spark.createDataFrame(DOCS, 'doc_id long, text string')


def _collect(df):
    return {r['doc_id']: {c: r[c] for c in REP_COLS}
            for r in df.collect()}


def test_kernel_matches_python_reference(spark, docs):
    got = _collect(repetition_stats(docs))
    assert set(got) == {d[0] for d in DOCS}
    for doc_id, text in DOCS:
        want = _ref_metrics(text)
        for c in REP_COLS:
            assert got[doc_id][c] == pytest.approx(want[c], abs=1e-12), \
                (doc_id, c, text)


def test_df_form_bit_identical_to_kernel(spark, docs):
    a = _collect(repetition_stats(docs))
    b = _collect(repetition_stats_df(docs))
    assert a.keys() == b.keys()
    for k in a:
        for c in REP_COLS:
            assert a[k][c] == pytest.approx(b[k][c], abs=1e-12), (k, c)


def test_expected_extremes(spark, docs):
    got = _collect(repetition_stats(docs))
    # 'spam' x6: the top bigram 'spam spam' covers 9 chars 5 times
    assert got[3]['dup_word_frac'] == pytest.approx(5 / 6)
    assert got[3]['dup5_char_frac'] == 1.0  # both 5-grams identical
    # all-distinct doc: zero everywhere except top fractions (cnt=1 grams)
    assert got[2]['dup_word_frac'] == 0.0
    assert got[2]['dup5_char_frac'] == 0.0
    # doc shorter than every n-gram
    assert got[5]['top2_char_frac'] == 0.0
    assert got[5]['dup5_char_frac'] == 0.0
    assert got[5]['dup_word_frac'] == 0.0
    # planted duplicate 5-gram in doc 4 -> strictly positive
    assert got[4]['dup5_char_frac'] > 0.0


def test_multi_space_tokenization(spark, docs):
    """' +' split semantics: runs of spaces collapse (same rule as
    dedup.tokens_expr and the DuckDB oracle)."""
    got = _collect(repetition_stats(docs))
    want = _ref_metrics(DOCS[7][1])
    for c in REP_COLS:
        assert got[7][c] == pytest.approx(want[c], abs=1e-12)


def test_kernel_batch_independence(spark, docs):
    """Metrics are row-local: a 1-row-per-batch run must equal the
    one-batch run (factorize codes are batch-scoped — prove no leakage)."""
    one = _collect(repetition_stats(docs.repartition(8)))
    whole = _collect(repetition_stats(docs.coalesce(1)))
    for k in whole:
        for c in REP_COLS:
            assert one[k][c] == pytest.approx(whole[k][c], abs=1e-12)
