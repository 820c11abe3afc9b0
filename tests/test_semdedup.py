"""SemDeDup composition (operators/semdedup.py): winner selection and
transitive grouping over the embedding near-dup graph."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from geostructures_spark.operators.semdedup import semantic_dedup

from tests.test_spark_operators import spark  # shared session fixture

__ = spark


def test_components_and_winners(spark):
    # vectors 0,1,2 are a duplicate chain (0~1, 1~2 but 0!~2 direct via
    # cosine is still ~1 here — identical directions); 3 is unique;
    # 4,5 duplicate each other in a different direction.
    V = np.array([
        [1.0, 0.0, 0.0], [1.0, 0.001, 0.0], [1.0, -0.001, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0], [0.001, 0.0, 1.0],
    ])
    vecs = spark.createDataFrame(pd.DataFrame(
        {'vec_id': range(6), 'embedding': [list(r) for r in V]}))
    cents = (vecs.where(F.col('vec_id').isin([0, 3, 4]))
             .select(F.col('vec_id').alias('centroid_id'),
                     F.col('embedding').alias('c_embedding')))
    rows = {r['vec_id']: r for r in
            semantic_dedup(vecs, cents, threshold=0.999).collect()}
    assert rows[0]['component'] == 0 and rows[0]['keep']
    assert rows[1]['component'] == 0 and not rows[1]['keep']
    assert rows[2]['component'] == 0 and not rows[2]['keep']
    assert rows[3]['component'] == 3 and rows[3]['keep']
    assert rows[4]['component'] == 4 and rows[4]['keep']
    assert rows[5]['component'] == 4 and not rows[5]['keep']
    # SemDeDup-ed corpus = keep filter
    kept = sorted(v for v, r in rows.items() if r['keep'])
    assert kept == [0, 3, 4]
