"""Composite quality gate (operators/quality.py): the bitmask must match
an independent Python recomputation of every rule from raw text, and
each rule must be triggerable in isolation."""

import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.quality import (
    DEFAULT_RULES, quality_gate, rule_names)
from tests.test_spark_operators import spark  # shared session fixture

DOCS = [
    (0, 'the cat sat of the mat and then the dog sat too near it all day'),
    (1, 'a b'),                                   # too few tokens
    (2, ' '.join(['supercalifragilistic'] * 30)),  # long tokens + dup words
    (3, '!!! ??? ... ;;; ### !!! ??? ... ;;; ###'
        ' !!! ??? ... ;;; ###'),                  # punct + no stopwords
    (4, ' '.join(f'w{i}' for i in range(60))),    # no stopwords, else clean
    (5, 'the ' * 40 + 'end'),                     # extreme repetition
]


def _signals(text):
    toks = text.strip().split()
    n = len(toks)
    n_chars = len(text)
    n_punct = sum(1 for c in text if not (c.isalnum() or c == '_'
                                          or c.isspace()))
    stop = sum(1 for t in toks if t in ('the', 'a', 'of', 'and', 'in'))
    from collections import Counter
    out = {
        'n_tokens': n,
        'avg_token_len': (n_chars - (n - 1)) / n,
        'punct_ratio': n_punct / max(n_chars, 1),
        'stopword_ratio': stop / max(n, 1),
        'dup_word_frac': (n - len(set(toks))) / max(n, 1),
    }
    for nn, key in ((2, 'top2_char_frac'),):
        grams = Counter(tuple(toks[i:i + nn]) for i in range(n - nn + 1))
        if grams:
            c, chars = max(((c, sum(len(w) for w in g) + nn - 1)
                            for g, c in grams.items()))
            out[key] = c * chars / max(n_chars, 1)
        else:
            out[key] = 0.0
    g5 = Counter(tuple(toks[i:i + 5]) for i in range(n - 4))
    tot = sum(c * (sum(len(w) for w in g) + 4) for g, c in g5.items())
    dup = sum(c * (sum(len(w) for w in g) + 4)
              for g, c in g5.items() if c > 1)
    out['dup5_char_frac'] = dup / max(tot, 1)
    return out


def _ref_mask(text):
    sig = _signals(text)
    mask = 0
    for i, (name, col, lo, hi) in enumerate(DEFAULT_RULES):
        v = sig[col]
        if (lo is not None and v < lo) or (hi is not None and v > hi):
            mask |= 1 << i
    return mask


@pytest.fixture(scope='module')
def docs(spark):
    return spark.createDataFrame(DOCS, 'doc_id long, text string')


def test_mask_matches_reference(spark, docs):
    got = {r['doc_id']: (r['fail_mask'], r['n_failed'], r['keep'])
           for r in quality_gate(docs).collect()}
    for doc_id, text in DOCS:
        want = _ref_mask(text)
        assert got[doc_id][0] == want, (doc_id, bin(got[doc_id][0]), bin(want))
        assert got[doc_id][1] == bin(want).count('1')
        assert got[doc_id][2] == (want == 0)


def test_each_rule_triggers(spark, docs):
    got = {r['doc_id']: r['fail_mask'] for r in quality_gate(docs).collect()}
    names = rule_names()
    bit = {n: 1 << i for i, n in enumerate(names)}
    assert got[0] == 0                                   # clean doc kept
    assert got[1] & bit['n_tokens']
    assert got[2] & bit['avg_token_len']
    assert got[2] & bit['dup_word_frac']
    assert got[3] & bit['punct_ratio']
    assert got[4] & bit['stopword_ratio']
    assert got[5] & bit['top2_char_frac']
    assert got[5] & bit['dup5_char_frac']


def test_no_shuffle_plan(spark, docs):
    """The gate must be one scan->mapInPandas chain: no Exchange in the
    optimized plan (the zero-shuffle claim of the module docstring)."""
    plan = quality_gate(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert 'Exchange' not in plan and 'RepartitionByExpression' not in plan
