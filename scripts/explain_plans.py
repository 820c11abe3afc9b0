"""Dump and assert the physical-plan properties the engine relies on at
scale: column pruning (html never read), predicate pushdown to Parquet,
and broadcast of the shape-cover side of the spatial join.

Usage: python scripts/explain_plans.py  (exit 1 if any property regressed)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em
from geostructures_spark.operators.miner import mine_cell_counts
from geostructures_spark.plans.session import get_session
from geostructures_spark.sources.pages import pages_df


def formatted(df) -> str:
    je = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return je.explainString(mode.fromString('formatted'))


def main() -> int:
    spark = get_session(app='explain', cores=4)
    sf = '/root/testdata/sf0.01'
    ok = True

    d = tempfile.mkdtemp()
    p = os.path.join(d, 'pages.parquet')
    pages_df(spark, 2000).write.parquet(p)
    plan = formatted(mine_cell_counts(spark.read.parquet(p)))
    pruned = all('html' not in l for l in plan.splitlines() if 'ReadSchema' in l)
    print(f'[{"OK" if pruned else "FAIL"}] pages pipeline prunes html at the scan')
    ok &= pruned

    plan = formatted(em.queries()['spatial_join_circles'](spark, sf))
    bcast = 'BroadcastHashJoin' in plan
    print(f'[{"OK" if bcast else "FAIL"}] spatial join broadcasts the cover side')
    ok &= bcast

    plan = formatted(em.queries()['q1_pricing_summary'](spark, sf))
    pushed = any('PushedFilters: [IsNotNull' in l for l in plan.splitlines())
    print(f'[{"OK" if pushed else "FAIL"}] q1 pushes the shipdate filter to Parquet')
    ok &= pushed

    spark.stop()
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
