"""Deterministic hash-sampling operators (operators/sampling.py): the
training-pipeline quota family (sample, stratified sample, per-key cap).
Membership goldens are recomputed independently with hashlib in Python —
no shared code with the Column-expression path under test."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from geostructures_spark.operators.sampling import (
    HASH_BUCKETS, hash_sample, per_key_cap, stratified_sample)
from tests.test_spark_operators import spark  # shared session fixture


def _bucket(key, salt=''):
    return int(hashlib.md5((salt + str(key)).encode()).hexdigest()[:8], 16)


@pytest.fixture(scope='module')
def docs(spark):
    rows = [(i, f'src{i % 7}', 'en' if i % 3 else 'fr') for i in range(400)]
    return spark.createDataFrame(rows, 'doc_id long, source string, lang string')


def test_hash_sample_exact_membership(spark, docs):
    """The kept set must be EXACTLY {id: md5-bucket(id) < rate * 2^32} —
    byte-level agreement with an independent hashlib recomputation."""
    got = {r['doc_id'] for r in hash_sample(docs, 0.37, 'doc_id').collect()}
    want = {i for i in range(400) if _bucket(i) < int(0.37 * HASH_BUCKETS)}
    assert got == want
    assert 0.2 < len(got) / 400 < 0.55  # plausible rate at n=400


def test_hash_sample_salt_draws_differ(spark, docs):
    a = {r['doc_id'] for r in hash_sample(docs, 0.4, 'doc_id', salt='a').collect()}
    b = {r['doc_id'] for r in hash_sample(docs, 0.4, 'doc_id', salt='b').collect()}
    assert a != b
    # and each matches its own hashlib replay
    assert a == {i for i in range(400)
                 if _bucket(i, 'a') < int(0.4 * HASH_BUCKETS)}


def test_hash_sample_rate_edges(spark, docs):
    assert hash_sample(docs, 0.0, 'doc_id').count() == 0
    assert hash_sample(docs, 1.0, 'doc_id').count() == 400
    with pytest.raises(ValueError, match='rate'):
        hash_sample(docs, 1.5, 'doc_id')


def test_stratified_sample_per_stratum_rates(spark, docs):
    rates = {'en': 0.8, 'fr': 0.2}
    out = stratified_sample(docs, 'lang', rates, key_col='doc_id').collect()
    got = {r['doc_id'] for r in out}
    want = set()
    for i in range(400):
        lang = 'en' if i % 3 else 'fr'
        if _bucket(i) < int(rates[lang] * HASH_BUCKETS):
            want.add(i)
    assert got == want
    # schema passes through unchanged (no helper columns leak)
    assert set(out[0].asDict()) == {'doc_id', 'source', 'lang'}


def test_stratified_default_rate_for_unlisted_stratum(spark, docs):
    out = stratified_sample(docs, 'lang', {'en': 0.5}, key_col='doc_id',
                            default_rate=0.0)
    assert all(r['lang'] == 'en' for r in out.collect())


def test_per_key_cap_counts_and_determinism(spark, docs):
    out = per_key_cap(docs, 'source', k=20, id_col='doc_id')
    pdf = out.toPandas()
    assert (pdf.groupby('source').size() <= 20).all()
    assert len(pdf) == 7 * 20  # every src has ~57 rows, all capped
    # deterministic: the kept ids are the 20 lowest (bucket, id) per key
    for src, grp in pdf.groupby('source'):
        all_ids = [i for i in range(400) if f'src{i % 7}' == src]
        want = sorted(all_ids, key=lambda i: (_bucket(i), i))[:20]
        assert sorted(grp['doc_id']) == sorted(want)


def test_per_key_cap_two_phase_identical(spark, docs):
    """The skew-safe two-phase plan (n_salt) must return the identical
    row set as the single-window form."""
    one = {r['doc_id'] for r in
           per_key_cap(docs, 'source', 15, 'doc_id').collect()}
    two = {r['doc_id'] for r in
           per_key_cap(docs, 'source', 15, 'doc_id', n_salt=4).collect()}
    assert one == two


def test_per_key_cap_under_k_keeps_all(spark):
    small = spark.createDataFrame([(1, 'a'), (2, 'a'), (3, 'b')],
                                  'doc_id long, source string')
    assert per_key_cap(small, 'source', 10, 'doc_id').count() == 3


def test_mixture_sample_exact_copies(spark, docs):
    """Epoch weighting: weight 2.5 -> every key appears 2 or 3 times,
    the extra copy decided by the same hashlib bucket recomputed
    independently; epoch indexes are dense 0..n-1."""
    from geostructures_spark.operators.sampling import mixture_sample
    w = {'src0': 2.5, 'src1': 0.4, 'src2': 0.0, 'src3': 1.0}
    out = mixture_sample(docs, w, 'source', 'doc_id',
                         default_weight=0.25).collect()
    got = {}
    for r in out:
        got.setdefault(r['doc_id'], []).append(r['epoch'])
    src = {r['doc_id']: r['source'] for r in docs.collect()}
    for doc_id, source in src.items():
        weight = w.get(source, 0.25)
        full, frac = int(weight), weight - int(weight)
        expect = full + (1 if _bucket(doc_id) < frac * HASH_BUCKETS else 0)
        epochs = sorted(got.get(doc_id, []))
        assert epochs == list(range(expect)), (doc_id, source, weight)
    # src2 weight 0 -> no row ever
    assert not any(src[d] == 'src2' for d in got)


def test_mixture_sample_rejects_bad_weight(spark, docs):
    from geostructures_spark.operators.sampling import mixture_sample
    with pytest.raises(ValueError):
        mixture_sample(docs, {'src0': -0.1}, 'source', 'doc_id')
    with pytest.raises(ValueError):
        mixture_sample(docs, {'src0': 100.0}, 'source', 'doc_id')


def test_assign_split_group_safe(spark, docs):
    """Every row of a group key lands in the same split; global fractions
    are approximately honored; membership matches the independent
    hashlib recomputation of the bucket ranges."""
    from geostructures_spark.operators.sampling import assign_split
    out = assign_split(docs, {'train': 0.8, 'valid': 0.1, 'test': 0.1},
                       'source').collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r['source'], set()).add(r['split'])
    assert all(len(s) == 1 for s in by_src.values())  # group-safe
    # independent membership recomputation
    acc, bounds = 0.0, []
    for name, f in [('train', 0.8), ('valid', 0.1), ('test', 0.1)]:
        acc += f
        bounds.append((name, int(min(acc, 1.0) * HASH_BUCKETS)))
    for r in out:
        b = _bucket(r['source'])
        want = next(name for name, hi in bounds if b < hi)
        assert r['split'] == want


def test_assign_split_rejects_bad_fractions(spark, docs):
    from geostructures_spark.operators.sampling import assign_split
    with pytest.raises(ValueError):
        assign_split(docs, {'a': 0.5, 'b': 0.4}, 'source')
    with pytest.raises(ValueError):
        assign_split(docs, {'a': 1.5, 'b': -0.5}, 'source')


def test_weighted_sample_proportional_and_deterministic(spark):
    """Heavier rows sample disproportionately; identical runs agree."""
    import pandas as pd
    from pyspark.sql import functions as F
    from geostructures_spark.operators.sampling import weighted_sample
    pdf = pd.DataFrame({
        'doc_id': range(1000),
        # rows 0-99 weigh 100x rows 100-999
        'w': [10_000] * 100 + [100] * 900,
    })
    df = spark.createDataFrame(pdf)
    s1 = sorted(r['doc_id'] for r in weighted_sample(df, 100, 'w').collect())
    s2 = sorted(r['doc_id'] for r in weighted_sample(df, 100, 'w').collect())
    assert s1 == s2  # no RNG state: bit-reproducible
    heavy = sum(1 for d in s1 if d < 100)
    # heavy rows are 10% of the population but 100x the weight: expect
    # the sample dominated by them (~52 of 100 under A-Res here)
    assert heavy >= 35
    # zero/negative weights never sampled
    pdf2 = pd.DataFrame({'doc_id': [1, 2, 3], 'w': [0, -5, 7]})
    s3 = weighted_sample(spark.createDataFrame(pdf2), 3, 'w').collect()
    assert [r['doc_id'] for r in s3] == [3]


def test_weighted_sample_plan_is_top_k(spark):
    import pandas as pd
    from geostructures_spark.operators.sampling import weighted_sample
    df = spark.createDataFrame(pd.DataFrame(
        {'doc_id': range(100), 'w': [1] * 100}))
    plan = (weighted_sample(df, 5, 'w')
            ._jdf.queryExecution().executedPlan().toString())
    assert 'TakeOrderedAndProject' in plan  # no global sort materializes


def test_minhash_cross_finds_planted_dups_and_caps(spark):
    import pandas as pd
    import pytest as _pt
    from pyspark.sql import functions as F
    from geostructures_spark.operators.dedup import minhash_lsh_pairs_cross
    base = 'alpha beta gamma delta epsilon zeta eta theta iota kappa'
    old = spark.createDataFrame(pd.DataFrame({
        'doc_id': [0, 2, 4],
        'text': [base, 'totally different words live here now friend',
                 'yet another unrelated document body text here'],
    }))
    new = spark.createDataFrame(pd.DataFrame({
        'doc_id': [1, 3],
        'text': [base,  # exact copy of old doc 0
                 'nothing like anything in the existing corpus at all'],
    }))
    rows = minhash_lsh_pairs_cross(new, old, n_bands=4).collect()
    got = {(r['new_id'], r['old_id']): r['n_shared_bands'] for r in rows}
    assert got == {(1, 0): 4}  # the planted copy, all 4 bands; no noise
    # observation requires a cap
    with _pt.raises(ValueError):
        minhash_lsh_pairs_cross(new, old, max_bucket=None, observation=object())
