"""Streaming exact dedup (streaming/dedup.py): batch == stream group
equivalence and the append-mode pass-through invariants."""

import os

import pytest
from pyspark.sql import functions as F

from geostructures_spark.streaming.dedup import (
    dedup_group_agg, drop_seen, run_dedup_groups_to_memory)
from tests.test_spark_operators import spark  # shared session fixture


def test_dedup_groups_stream_matches_batch(spark):
    sf = '/root/testdata/sf0.001'
    batch = spark.read.parquet(os.path.join(sf, 'documents.parquet'))
    b = {(r.content_hash, r.canonical_id, r.n_docs)
         for r in dedup_group_agg(batch).collect()}
    s = {(r.content_hash, r.canonical_id, r.n_docs)
         for r in run_dedup_groups_to_memory(
             spark, os.path.join(sf, 'documents.parquet'),
             query_name='t_dedup_stream').collect()}
    assert b == s and len(b) > 10


def test_dedup_groups_counts_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, 'same'), (2, 'same'), (3, 'other'), (7, 'same')],
        'doc_id long, text string')
    rows = {r.canonical_id: r.n_docs for r in dedup_group_agg(docs).collect()}
    assert rows == {1: 3, 3: 1}  # min id is canonical, counts exact


def test_drop_seen_one_survivor_per_group(spark):
    docs = spark.createDataFrame(
        [(i, f'text{i % 5}') for i in range(40)],
        'doc_id long, text string')
    out = drop_seen(docs).collect()
    assert len(out) == 5
    assert len({r.content_hash for r in out}) == 5
    # every survivor is a member of its own group
    assert all(r.text == f'text{r.doc_id % 5}' for r in out)


def test_drop_seen_streaming_append(spark, tmp_path):
    """Append-mode streaming pass-through: one survivor per distinct
    content across micro-batches (state carries between files)."""
    import pandas as pd
    d = str(tmp_path / 'docs')
    os.makedirs(d)
    pd.DataFrame({'doc_id': [1, 2], 'text': ['a', 'b'],
                  'lang': ['en', 'en'], 'source': ['s', 's'],
                  'n_chars': [1, 1]}).to_parquet(os.path.join(d, 'p1.parquet'))
    pd.DataFrame({'doc_id': [3, 4], 'text': ['a', 'c'],
                  'lang': ['en', 'en'], 'source': ['s', 's'],
                  'n_chars': [1, 1]}).to_parquet(os.path.join(d, 'p2.parquet'))
    from geostructures_spark.streaming.dedup import DOCS_SCHEMA
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    q = (drop_seen(stream).writeStream.outputMode('append')
         .format('memory').queryName('t_drop_seen').start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql('SELECT * FROM t_drop_seen').collect()
    assert sorted(r.text for r in out) == ['a', 'b', 'c']


def test_drop_seen_urls_batch_survivor_set(spark):
    """drop_seen_urls: survivor canonical-url SET equals the distinct
    canonical urls regardless of which raw variant survives."""
    from geostructures_spark.streaming.dedup import drop_seen_urls
    rows = [(1, 'https://www.a.example/x/'),
            (2, 'HTTPS://A.EXAMPLE:443/x?utm_source=f'),
            (3, 'https://a.example/x#top'),
            (4, 'https://b.example/y')]
    df = spark.createDataFrame(rows, 'doc_id long, url string')
    out = drop_seen_urls(df).collect()
    assert sorted(r['norm_url'] for r in out) == [
        'https://a.example/x', 'https://b.example/y']


def test_minhash_bucket_groups_stream_equals_batch(spark):
    """Streaming MinHash-LSH bucket state == batch replay, including
    across multi-file triggers (arrival-order independence), and the
    row-local signature == the batch groupBy signature."""
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from geostructures_spark.operators.dedup import minhash_signature
    from geostructures_spark.streaming.dedup import (DOCS_SCHEMA,
                                                     minhash_bucket_groups)
    d = tempfile.mkdtemp(prefix='gs_mh_stream_')
    texts = ['the quick brown fox jumps over the lazy dog',
             'the quick brown fox jumps over the lazy cat',
             'completely different content here with many words',
             'the quick brown fox jumps over the lazy dog',  # exact dup
             'short doc']
    half = len(texts) // 2
    for i, sl in enumerate((slice(0, half), slice(half, None))):
        idx = range(len(texts))[sl]
        pd.DataFrame({'doc_id': list(idx),
                      'text': [texts[j] for j in idx],
                      'lang': ['en'] * len(idx), 'source': ['s'] * len(idx),
                      'n_chars': [len(texts[j]) for j in idx]}
                     ).to_parquet(os.path.join(d, f'p{i}.parquet'))
    stream = (spark.readStream.schema(DOCS_SCHEMA)
              .option('maxFilesPerTrigger', 1).parquet(d))
    q = (minhash_bucket_groups(stream).writeStream.outputMode('complete')
         .format('memory').queryName('t_mh_groups').start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql('SELECT * FROM t_mh_groups').collect()))
    batch = spark.read.parquet(d)
    expect = sorted(map(tuple, (
        minhash_signature(batch, n_bands=4)
        .groupBy('band', 'minhash')
        .agg(F.min('doc_id').alias('canonical_id'),
             F.count('*').alias('n_docs'))).collect()))
    assert got == expect
    # the exact dup pair (0, 3) shares ALL 4 buckets with canonical 0
    shared = [t for t in got if t[3] >= 2 and t[2] == 0]
    assert len(shared) >= 4
