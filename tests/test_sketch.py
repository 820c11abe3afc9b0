"""Count-min + linear-counting sketches (operators/sketch.py)."""

import math

import pandas as pd
from pyspark.sql import functions as F

from geostructures_spark.operators.sketch import (cms_estimate, cms_table,
                                                  linear_count)

from tests.test_spark_operators import spark  # shared session fixture

__ = spark


def _items(spark, words):
    return spark.createDataFrame(pd.DataFrame({'item': words}))


def test_cms_upper_bound_and_exactness_when_sparse(spark):
    words = ['a'] * 50 + ['b'] * 20 + ['c'] * 5 + ['d']
    items = _items(spark, words)
    sketch = cms_table(items, depth=4, width=256)
    est = {r['item']: r['est'] for r in
           cms_estimate(sketch, _items(spark, ['a', 'b', 'c', 'd', 'zzz']),
                        depth=4, width=256).collect()}
    true = {'a': 50, 'b': 20, 'c': 5, 'd': 1}
    for w, t in true.items():
        assert est[w] >= t            # CMS never underestimates
        assert est[w] <= t + 76       # 4 distinct items, width 256: exact
    # with 4 items in 256 buckets per row, collisions are impossible
    # to cause an overestimate beyond another item's count; here the
    # min over 4 independent rows is exact
    assert est == {**true, 'zzz': 0}


def test_cms_total_mass_per_row(spark):
    words = ['x', 'y', 'z'] * 7
    sketch = cms_table(_items(spark, words), depth=4, width=16)
    per_row = {r['d']: r['s'] for r in
               sketch.groupBy('d').agg(F.sum('cnt').alias('s')).collect()}
    assert per_row == {0: 21, 1: 21, 2: 21, 3: 21}


def test_cms_bounded_output(spark):
    items = spark.range(5000).selectExpr(
        "concat('tok', CAST(id % 997 AS STRING)) AS item")
    sketch = cms_table(items, depth=4, width=32)
    assert sketch.count() <= 4 * 32


def test_linear_count_small_cardinality(spark):
    words = [f'w{i}' for i in range(100)] * 3
    row = linear_count(_items(spark, words), m=4096).collect()[0]
    # load factor 100/4096: linear counting is near-exact here
    assert row['n_buckets_hit'] <= 100
    assert abs(row['estimate'] - 100) < 5
    expected = -4096.0 * math.log((4096.0 - row['n_buckets_hit']) / 4096.0)
    assert row['estimate'] == expected


def test_linear_count_saturated_is_null(spark):
    row = linear_count(_items(spark, ['a', 'b']), m=1).collect()[0]
    assert row['n_buckets_hit'] == 1 and row['estimate'] is None


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from geostructures_spark.operators.sketch import (bloom_bits,
                                                      bloom_contains)
    keys = _items(spark, [f'k{i}' for i in range(200)])
    probes = _items(spark, [f'k{i}' for i in range(400)])
    bits = bloom_bits(keys, m_bits=4096, n_hashes=4)
    got = {r['item']: r['maybe_present'] for r in
           bloom_contains(bits, probes, m_bits=4096, n_hashes=4).collect()}
    # every inserted key answers True (no false negatives)
    assert all(got[f'k{i}'] for i in range(200))
    # ~ (1-e^{-kn/m})^k ~ 3e-5 here: essentially no false positives
    fps = sum(got[f'k{i}'] for i in range(200, 400))
    assert fps <= 2
    assert bits.count() <= 4 * 200


def test_bloom_duplicate_probes_stay_present(spark):
    # Regression (r4 advice): bit rows must explode from the DISTINCT
    # probe set — a probe repeated n times would otherwise set
    # n_set = n * n_hashes and flip the equality test to a false negative.
    from geostructures_spark.operators.sketch import (bloom_bits,
                                                      bloom_contains)
    keys = _items(spark, ['a', 'b', 'c'])
    probes = _items(spark, ['a', 'a', 'a', 'b', 'zz', 'zz'])
    bits = bloom_bits(keys, m_bits=4096, n_hashes=4)
    got = {r['item']: r['maybe_present'] for r in
           bloom_contains(bits, probes, m_bits=4096, n_hashes=4).collect()}
    assert got['a'] is True and got['b'] is True
    assert set(got) == {'a', 'b', 'zz'}


def test_hll_registers_match_scalar_replay(spark):
    import hashlib

    from geostructures_spark.operators.sketch import hll_registers
    vals = [f'tok{i}' for i in range(1000)]
    got = sorted(map(tuple, hll_registers(_items(spark, vals)).collect()))
    R = {}
    for s in vals:
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        idx, w = h >> 52, h & ((1 << 52) - 1)
        rho = 53 if w == 0 else 52 - w.bit_length() + 1
        R[idx] = max(R.get(idx, 0), rho)
    assert got == sorted(R.items())


def test_hll_estimate_accuracy_and_linear_branch(spark):
    from geostructures_spark.operators.sketch import (hll_estimate,
                                                      hll_registers)
    # large cardinality: raw HLL branch, expect ~1.04/sqrt(256) = 6.5%
    # std error — assert within 4 sigma
    big = _items(spark, [f'x{i}' for i in range(5000)])
    est = hll_estimate(hll_registers(big)).collect()[0]['estimate']
    assert abs(est - 5000) / 5000 < 0.26
    # small cardinality: E <= 2.5m with zero registers -> linear counting
    import math
    small = _items(spark, [f'y{i}' for i in range(40)])
    regs = hll_registers(small).collect()
    hit = len(regs)
    row = hll_estimate(hll_registers(small)).collect()[0]
    assert row['n_registers_hit'] == hit
    assert row['estimate'] == round(256.0 * math.log(256.0 / (256 - hit)), 6)


def test_hll_merge_is_register_max(spark):
    # sketch union == max-merge of register tables (the distributed
    # aggregation property that makes HLL shuffle-bounded)
    from pyspark.sql import functions as F

    from geostructures_spark.operators.sketch import hll_registers
    a = _items(spark, [f'a{i}' for i in range(300)])
    b = _items(spark, [f'b{i}' for i in range(300)])
    both = a.unionByName(b)
    direct = sorted(map(tuple, hll_registers(both).collect()))
    merged = sorted(map(tuple, (
        hll_registers(a).unionByName(hll_registers(b))
        .groupBy('idx').agg(F.max('rho').alias('rho'))).collect()))
    assert direct == merged
