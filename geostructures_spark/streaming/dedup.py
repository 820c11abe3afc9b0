"""Streaming exact deduplication over the documents stream.

Dedup-at-ingest is the streaming member of the dedup family
(operators/dedup.py): a 100 TB corpus is deduplicated once in batch, but
the feed that keeps growing it must drop repeats as they arrive.

Two forms:

- ``dedup_group_agg``: deterministic content-hash groups
  (content_hash -> canonical_id = min doc_id, n_docs) — the streaming
  twin of operators/dedup.exact_dedup's group table, and the form the
  contract oracle checks: group membership is arrival-order-independent,
  so batch and stream agree exactly.
- ``drop_seen``: ``dropDuplicates`` on the content hash — the
  append-mode pass-through filter a production ingest pipeline runs.
  WHICH row of a duplicate set survives depends on arrival order (Spark
  keeps the first seen), so this form is intentionally not oracle-value
  -checked; with ``watermark_col``/``delay`` the seen-hash state is
  pruned to the late-data horizon (dropDuplicatesWithinWatermark),
  which is what bounds state at corpus scale.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ['DOCS_SCHEMA', 'dedup_group_agg', 'drop_seen',
           'drop_seen_urls', 'minhash_bucket_groups',
           'run_dedup_groups_to_memory', 'run_stream_to_memory']

DOCS_SCHEMA = ('doc_id long, text string, lang string, source string, '
               'n_chars long')


def dedup_group_agg(docs: DataFrame, text_col: str = 'text',
                    id_col: str = 'doc_id') -> DataFrame:
    """(content_hash, canonical_id, n_docs) per distinct content — the
    same function on a batch or streaming frame (complete/update output
    mode when streaming). State is one row per DISTINCT content hash;
    the shuffle carries (hash, partial-min, partial-count) only."""
    return (docs
            .groupBy(F.md5(F.col(text_col)).alias('content_hash'))
            .agg(F.min(id_col).alias('canonical_id'),
                 F.count('*').alias('n_docs')))


def drop_seen(docs: DataFrame, text_col: str = 'text',
              watermark_col: str = None, delay: str = None) -> DataFrame:
    """Append-mode pass-through dedup: emit a document iff its content
    hash has not been seen. First-seen wins (arrival-order dependent).
    With ``watermark_col`` + ``delay`` the state is pruned to the
    watermark horizon instead of growing forever."""
    src = docs.withColumn('content_hash', F.md5(F.col(text_col)))
    if src.isStreaming and watermark_col and delay:
        src = src.withWatermark(watermark_col, delay)
        return src.dropDuplicatesWithinWatermark(['content_hash'])
    return src.dropDuplicates(['content_hash'])


def minhash_bucket_groups(docs: DataFrame, n_bands: int = 4,
                          shingle_k: int = 5, id_col: str = 'doc_id',
                          text_col: str = 'text') -> DataFrame:
    """Streaming MinHash-LSH near-dup state: one row per (band, minhash)
    bucket with its canonical (min) doc id and member count — the
    incremental-ingest twin of operators/dedup.minhash_lsh_pairs'
    bucket table. An arriving doc is a near-dup CANDIDATE iff any of
    its n_bands buckets already exists with a lower canonical id; the
    bucket table is a commutative aggregation, so batch and stream
    states are identical and arrival-order independent (the property
    the contract oracle checks, like dedup_group_agg).

    Streaming shape: chained stateful aggregations are unsupported, so
    the per-doc band signature CANNOT use the batch form's
    explode -> groupBy(doc, band).min. Instead it is computed
    ROW-LOCALLY — array_min over the shingle array's per-band hash
    slices, value-identical to minhash_signature (same md5 slices, same
    string total order) — leaving exactly ONE stateful aggregation over
    (band, minhash). State is one row per distinct bucket; the shuffle
    carries (band, minhash, partial-min, partial-count) only.

    Works identically on a batch frame (the oracle replay path).
    """
    from geostructures_spark.operators.dedup import (shingles_from_tokens,
                                                     tokens_expr)
    base = docs.select(F.col(id_col),
                       tokens_expr(F.col(text_col)).alias('_tk'))
    sh = base.select(id_col,
                     shingles_from_tokens(F.col('_tk'), shingle_k)
                     .alias('_shs'))
    bands = sh.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias('band'),
        '_shs')
    if n_bands <= 4:
        # four 32-bit band hashes are SLICES of one md5 per shingle —
        # same scheme as minhash_signature's n_bands <= 4 fast path
        mh = F.array_min(F.transform(
            '_shs',
            lambda s: F.substring(F.md5(s), F.col('band') * 8 + 1,
                                  F.lit(8))))
    else:
        mh = F.array_min(F.transform(
            '_shs',
            lambda s: F.md5(F.concat_ws(':', F.col('band').cast('string'),
                                        s))))
    rows = (bands.select(id_col, 'band', mh.alias('minhash'))
            .where(F.col('minhash').isNotNull()))
    return (rows.groupBy('band', 'minhash')
            .agg(F.min(id_col).alias('canonical_id'),
                 F.count('*').alias('n_docs')))


def drop_seen_urls(pages: DataFrame, url_col: str = 'url') -> DataFrame:
    """URL-level ingest dedup: emit a page iff its CANONICAL url
    (operators/urls.normalize_url_expr — tracking params, www, default
    ports, fragments folded) has not been seen. WHICH raw variant
    survives is arrival-order dependent, but the surviving canonical-url
    SET equals the distinct canonical urls — the order-independent
    projection the contract oracle checks."""
    from geostructures_spark.operators.urls import normalize_url_expr
    src = pages.withColumn('norm_url', normalize_url_expr(F.col(url_col)))
    return src.dropDuplicates(['norm_url'])


def _as_stream_dir(parquet_path: str) -> str:
    if os.path.isfile(parquet_path):
        d = tempfile.mkdtemp(prefix='gs_stream_')
        os.symlink(parquet_path, os.path.join(d, os.path.basename(parquet_path)))
        return d
    return parquet_path


def run_stream_to_memory(spark: SparkSession, parquet_path: str,
                         transform, query_name: str,
                         output_mode: str = 'complete') -> DataFrame:
    """Drive ``transform(streaming_df)`` over a parquet file source to
    completion (memory sink) and return the materialized result."""
    stream = spark.readStream.schema(DOCS_SCHEMA).parquet(
        _as_stream_dir(parquet_path))
    q = (transform(stream).writeStream.outputMode(output_mode)
         .format('memory').queryName(query_name).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f'SELECT * FROM {query_name}')


def run_dedup_groups_to_memory(spark: SparkSession, parquet_path: str,
                               query_name: str = 'dedup_groups') -> DataFrame:
    """Drive dedup_group_agg over a parquet file source to completion
    (memory sink, complete mode) and return the materialized result."""
    return run_stream_to_memory(spark, parquet_path, dedup_group_agg,
                                query_name)
