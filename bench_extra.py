"""Optimization-round profiling harness (guide §1.4: noop-sink isolation).

NOT part of the driver contract — bench.py is frozen; this file exists so
stage-level timings cited in OPTIMIZATION_r06.md are reproducible.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py [section]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format('noop').mode('overwrite').save()


def timed(spark, label, fn, n=2):
    best = float('inf')
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f'{label:45s} {best:7.3f}s')
    return best


def profile_spatial_join(spark, sf_dir):
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from geostructures_spark.operators import spatial_join as sj
    from geostructures_spark.operators.tiling import cover_shapes, with_cell

    q = em.queries()['spatial_join_circles']
    timed(spark, 'spatial_join_circles full (collect)',
          lambda: q(spark, sf_dir).collect())

    # rebuild the inputs exactly as the query does
    em._load(spark, sf_dir, 'customer', 'supplier')
    pts = (spark.sql(em._pts_customer_sql())
           .withColumnRenamed('pid', 'url'))
    sup = spark.sql(em._pts_supplier_sql())
    shapes = em._q_spatial_join_circles.__wrapped__(spark, sf_dir) \
        if hasattr(em._q_spatial_join_circles, '__wrapped__') else None
    # inline shape construction (copy of _q_spatial_join_circles)
    shapes = sup.select(
        F.col('qid').cast('long').alias('shape_id'),
        F.lit('circle').alias('kind'),
        F.struct(
            F.col('q_lon').alias('center_lon'), F.col('q_lat').alias('center_lat'),
            F.lit(500_000.0).alias('radius'),
            *[F.lit(None).cast('double').alias(c) for c in (
                'semi_major', 'semi_minor', 'rotation', 'inner_radius',
                'outer_radius', 'angle_min', 'angle_max',
                'min_lon', 'min_lat', 'max_lon', 'max_lat')],
        ).alias('params'),
        F.lit(None).cast('array<array<struct<lon:double,lat:double>>>').alias('rings'),
        F.lit(None).cast('timestamp').alias('dt_start'),
        F.lit(None).cast('timestamp').alias('dt_end'),
        F.lit(None).cast('map<string,string>').alias('properties'),
    )

    timed(spark, '  catalog_size agg', lambda: sj._catalog_size(shapes, 4, 16))
    n_shapes = sj._catalog_size(shapes, 4, 16)[0]
    cover_parts = min(64, max(4, n_shapes // 25 + 1))
    timed(spark, '  cover_shapes (noop)',
          lambda: noop(cover_shapes(shapes, 4, 16, n_partitions=cover_parts)))
    timed(spark, '  with_cell points (noop)',
          lambda: noop(with_cell(pts, 4, 16)))
    timed(spark, '  shape_broadcast collect',
          lambda: sj._shape_broadcast(spark, shapes))

    covers = cover_shapes(shapes, 4, 16, n_partitions=cover_parts)
    dt_map = shapes.select('shape_id', 'dt_start', 'dt_end')
    covers2 = covers.join(F.broadcast(dt_map), 'shape_id') \
        .withColumnRenamed('cell', 'cell')
    pc = with_cell(pts, 4, 16)
    cand = pc.join(F.broadcast(covers2.select('cell', 'shape_id')), 'cell')
    timed(spark, '  candidate join no-predicate (count)',
          lambda: cand.count())
    print('  candidate rows:', cand.count())

    joined = sj.spatial_join_points(pts, shapes, length=4, base=16,
                                    time_gated=False)
    timed(spark, '  spatial_join_points (noop)', lambda: noop(joined))


def profile_minhash(spark, sf_dir):
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from geostructures_spark.operators.dedup import (
        _shingle_rows, minhash_signature, minhash_lsh_pairs)

    q = em.queries()['minhash_lsh_pairs']
    timed(spark, 'minhash_lsh_pairs full (collect)',
          lambda: q(spark, sf_dir).collect())
    em._load(spark, sf_dir, 'documents')
    docs = spark.table('documents')
    timed(spark, '  shingle rows (noop)',
          lambda: noop(_shingle_rows(docs, 5, 'doc_id', 'text')))
    sh = _shingle_rows(docs, 5, 'doc_id', 'text')
    timed(spark, '  shingle+md5 (noop)',
          lambda: noop(sh.withColumn('h', F.md5('shingle')).drop('shingle')))
    timed(spark, '  signature (noop)',
          lambda: noop(minhash_signature(docs, 4, 5)))
    timed(spark, '  pairs (noop)',
          lambda: noop(minhash_lsh_pairs(docs, n_bands=4, shingle_k=5,
                                         max_bucket=512)))


def profile_headline_noop(spark, sf_dir):
    """Each headline query through the noop sink (strips the .collect +
    driver-side result cost) for comparison with bench.py timings."""
    import __spark_entry__ as em
    qs = em.queries()
    import bench
    for name in bench.HEADLINE:
        timed(spark, f'{name} (noop)', lambda: noop(qs[name](spark, sf_dir)),
              n=3)


def main():
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    from geostructures_spark.plans.session import get_session
    spark = get_session(app='bench_extra')
    section = sys.argv[1] if len(sys.argv) > 1 else 'all'
    if section in ('all', 'spatial'):
        profile_spatial_join(spark, sf_dir)
    if section in ('all', 'minhash'):
        profile_minhash(spark, sf_dir)
    if section in ('noop',):
        profile_headline_noop(spark, sf_dir)
    spark.stop()


if __name__ == '__main__':
    main()
