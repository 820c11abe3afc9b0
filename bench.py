"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures the web-scale pages pipeline (generate -> mine -> tile ->
aggregate) and reports its pages/sec throughput alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    'q1_pricing_summary',
    'niemeyer_cell_counts',
    'h3_cell_counts',
    'pip_triangle_counts',
    'spatial_join_circles',
    'knn_topk',
    'track_speed_stats',
    'minhash_lsh_pairs',
    'simhash_buckets',
    'text_stats',
    'cosine_topk',
    'events_windowed_agg',
]

PAGES_BENCH_ROWS = int(os.environ.get('SPARK_GRAFT_BENCH_PAGES', '200000'))


def main() -> None:
    sf_dir = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
    sf = sf_dir.rstrip('/').split('sf')[-1]

    import __spark_entry__ as em
    from geostructures_spark.operators.miner import mine_points
    from geostructures_spark.operators.tiling import hash_coordinates_agg, with_cell
    from geostructures_spark.plans.session import get_session
    from geostructures_spark.sources.pages import pages_df

    spark = get_session(app='bench')
    qs = em.queries()
    timings = {}

    # warm the JVM/Arrow path once (excluded from timings)
    qs['pip_triangle_counts'](spark, sf_dir).collect()

    for name in HEADLINE:
        # min of 2 runs: this sandbox shows bursty external CPU steal, and
        # min is the standard noise-robust point estimate
        best = float('inf')
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)

    # web-scale pages pipeline: generate -> mine+tile (fused) -> aggregate;
    # min of 2 runs (bursty external CPU steal on this host)
    from geostructures_spark.operators.miner import mine_cell_counts
    pages_sec = float('inf')
    n_cells = 0
    for _ in range(2):
        t0 = time.time()
        pages = pages_df(spark, PAGES_BENCH_ROWS)
        n_cells = mine_cell_counts(pages, cell_length=8, cell_base=16).count()
        pages_sec = min(pages_sec, time.time() - t0)
    pages_sec = round(pages_sec, 3)
    timings['pages_pipeline'] = pages_sec

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        'metric': 'headline_total',
        'value': total,
        'unit': 'sec',
        'queries': timings,
        'sf': float(sf) if sf.replace('.', '').isdigit() else sf,
        'pages_pipeline_rows': PAGES_BENCH_ROWS,
        'pages_per_sec': round(PAGES_BENCH_ROWS / pages_sec, 1),
        'pages_cells': n_cells,
    }))
    spark.stop()


if __name__ == '__main__':
    main()
