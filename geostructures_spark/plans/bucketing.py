"""Bucketed storage for co-located spatial joins.

At 100 TB the points side is joined on its cell key over and over (every
shape catalog, every kNN batch). Writing it bucketed by cell once makes
every subsequent equi-join on cell shuffle-free: both sides scan
pre-partitioned buckets and the join happens in place (no Exchange in the
plan — asserted in scripts/explain_plans.py and tests).

Spark's bucketing rides the session catalog (saveAsTable); buckets must
agree on count and key across the joined tables.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame, SparkSession

__all__ = ['write_bucketed', 'read_bucketed', 'bucketed_join']


def write_bucketed(df: DataFrame, table: str, bucket_col: str = 'cell',
                   buckets: int = 64,
                   sort_cols: Optional[List[str]] = None) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key."""
    w = (df.write.mode('overwrite').format('parquet')
         .bucketBy(buckets, bucket_col))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Union[str, List[str]] = 'cell') -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans with no
    Exchange on either input."""
    return spark.table(left_table).join(spark.table(right_table), on)
