"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The published recipe for selecting pretraining data that "looks like" a
target distribution: featurize every document as hashed n-gram counts,
fit bag-of-words bucket distributions on the TARGET corpus and the RAW
pool, weight each raw document by its importance log-ratio

    log w(x) = sum_b  c_b(x) * ( ln p_target(b) - ln p_raw(b) )

and resample the pool by those weights (compose with
operators/sampling.weighted_sample for the Gumbel-top-k draw).

Spark shape at 10^12 docs:
- featurize is a zero-shuffle row-local explode (words + bigrams,
  md5-hashed into ``m`` buckets — the same engine-portable hashing as
  the sketch family, so a SQL oracle replays everything bit-for-bit);
- each distribution fit is ONE map-side-combined groupBy bounded by
  ``m`` distinct keys per partition (Laplace add-1 smoothed, so no
  bucket has probability 0 and the log-ratio is total);
- the ratio table is ``m`` rows — broadcast onto the exploded doc
  features, then one per-doc sum. No corpus-sized shuffle anywhere:
  the doc-keyed aggregation is over (doc, bucket-count) rows that
  never leave their partition until the bounded per-doc combine.

Reference: the reference library has no data-selection surface; this
is a beyond-reference pipeline component (SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geostructures_spark.operators.bpe import words_expr

__all__ = ['dsir_features', 'dsir_bucket_probs', 'dsir_logweights']


def dsir_features(docs: DataFrame, id_col: str = 'doc_id',
                  text_col: str = 'text', m: int = 1024) -> DataFrame:
    """(id, bucket, c) hashed n-gram counts per document.

    Features are unigrams + bigrams of the normalized word stream
    (bpe.words_expr — lowercase, [a-z ] only, SQL-replayable), hashed
    with bucket = int(md5(feat)[0:8], 16) mod m. Row-local explode +
    one per-doc combine; empty docs contribute no rows.
    """
    toks = docs.select(
        F.col(id_col),
        F.filter(words_expr(F.col(text_col)), lambda w: w != '')
        .alias('_w'))
    grams = toks.select(
        id_col,
        F.explode(F.concat(
            F.col('_w'),
            F.when(F.size('_w') >= 2, F.transform(
                F.sequence(F.lit(0), F.size('_w') - 2),
                lambda i: F.concat_ws(' ', F.col('_w')[i],
                                      F.col('_w')[i + 1])))
            .otherwise(F.array()))).alias('feat'))
    bucket = (F.conv(F.substring(F.md5('feat'), 1, 8), 16, 10)
              .cast('long') % m)
    return (grams.select(id_col, bucket.alias('bucket'))
            .groupBy(id_col, 'bucket')
            .agg(F.count('*').cast('long').alias('c')))


def dsir_bucket_probs(features: DataFrame, m: int = 1024,
                      id_col: str = 'doc_id') -> DataFrame:
    """(bucket, p) Laplace-smoothed bucket distribution of a corpus:
    p(b) = (count(b) + 1) / (N + m). One bounded groupBy; the total N
    rides the same aggregate via a window-free cross join of the 1-row
    total (broadcast)."""
    counts = (features.groupBy('bucket')
              .agg(F.sum('c').cast('long').alias('cb')))
    total = features.agg(F.sum('c').cast('long').alias('n_total'))
    return (counts.crossJoin(F.broadcast(total))
            .select('bucket',
                    ((F.col('cb') + 1).cast('double')
                     / (F.col('n_total') + m).cast('double')).alias('p'),
                    'n_total'))


def dsir_logweights(raw_docs: DataFrame, target_docs: DataFrame,
                    id_col: str = 'doc_id', text_col: str = 'text',
                    m: int = 1024) -> DataFrame:
    """(id, n_feats, logweight) importance log-ratio per raw document.

    Buckets absent from a corpus still get Laplace mass, so the ratio
    is defined for every bucket; a raw doc with no features (empty
    text) gets logweight 0 (it carries no evidence either way).
    Downstream: join onto the corpus and feed
    sampling.weighted_sample(weight_col=exp-normalized weights) —
    or rank by logweight directly for top-k selection.
    """
    raw_f = dsir_features(raw_docs, id_col, text_col, m)
    tgt_f = dsir_features(target_docs, id_col, text_col, m)
    p_raw = dsir_bucket_probs(raw_f, m).select(
        'bucket', F.col('p').alias('p_raw'))
    p_tgt = dsir_bucket_probs(tgt_f, m).select(
        'bucket', F.col('p').alias('p_tgt'))
    # both tables are <= m rows: broadcast the ratio onto doc features.
    # Buckets never seen in EITHER corpus can still appear in a scored
    # doc's features only if that doc is outside raw_docs — callers
    # scoring external docs should union them into raw first; for raw
    # docs every feature bucket exists in p_raw by construction, and a
    # bucket missing from p_tgt takes the smoothed floor 1/(N_t + m).
    ratio = p_raw.join(p_tgt, 'bucket', 'left')
    floor_tgt = (tgt_f.agg(F.sum('c').cast('long').alias('n'))
                 .select((1.0 / (F.col('n') + m)).alias('p_floor')))
    ratio = (ratio.crossJoin(F.broadcast(floor_tgt))
             .select('bucket',
                     (F.log(F.coalesce('p_tgt', 'p_floor'))
                      - F.log('p_raw')).alias('log_ratio')))
    scored = (raw_f.join(F.broadcast(ratio), 'bucket')
              .groupBy(id_col)
              .agg(F.sum('c').cast('long').alias('n_feats'),
                   F.sum(F.col('c') * F.col('log_ratio'))
                   .alias('logweight')))
    base = raw_docs.select(id_col)
    return (base.join(scored, id_col, 'left')
            .select(id_col,
                    F.coalesce('n_feats', F.lit(0)).cast('long')
                    .alias('n_feats'),
                    F.round(F.coalesce('logweight', F.lit(0.0)), 6)
                    .alias('logweight')))
