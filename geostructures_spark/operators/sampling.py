"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled by HASH, not by RNG: a hash-derived bucket is
reproducible across runs/retries/engines (a killed stage that re-executes
keeps the same sample — Spark's ``df.sample`` does not guarantee that
under task retry), needs no coordination, and the identical arithmetic
runs in any SQL engine, which is what makes these operators
oracle-exact. The bucket is the first 8 hex digits of md5 parsed as an
integer in [0, 2^32) — pure JVM column expressions (md5/substring/conv),
whole-stage codegen, no Python.

Scale shapes:
- ``hash_sample``: scan-stage filter, zero shuffle, combines with any
  downstream plan.
- ``stratified_sample``: per-stratum rates via a broadcast map join +
  the same scan-stage filter; the rates table is tiny by construction.
- ``per_key_cap``: exact deterministic "keep at most k docs per key"
  (domain caps, source caps). A plain window puts every row of a key in
  one task — a mega-key (one domain with 10^9 pages) would straggle, so
  the two-phase form pre-reduces within (key, salt) sub-buckets first:
  each sub-bucket keeps its own top-k by hash order, then the final
  window ranks at most k * n_salt rows per key. Identical output to the
  single-window form (the global top-k is contained in the union of
  sub-bucket top-ks), same pattern as simsearch.cosine_topk_exact's
  batch-local partial top-k.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['hash_bucket_expr', 'hash_sample', 'stratified_sample',
           'per_key_cap', 'mixture_sample', 'assign_split', 'HASH_BUCKETS',
           'weighted_sample']

# bucket space: first 8 md5 hex digits = [0, 2^32)
HASH_BUCKETS = 1 << 32


def hash_bucket_expr(key: Column, salt: str = '') -> Column:
    """Deterministic bucket in [0, 2^32) from a key column (any type —
    cast to its canonical string form first). Same value in any engine
    with md5 + hex-parse, so oracles replay it exactly."""
    s = key.cast('string') if salt == '' else \
        F.concat(F.lit(salt), key.cast('string'))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast('long')


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f'rate must be in [0, 1], got {rate}')
    return int(rate * HASH_BUCKETS)


def hash_sample(df: DataFrame, rate: float, key_col: str,
                salt: str = '') -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, selected by the
    hash of ``key_col``. Different ``salt`` values draw independent
    samples; the same (key, salt) always makes the same keep/drop
    decision, so samples are stable across retries and compose
    consistently across tables sharing the key."""
    return df.filter(hash_bucket_expr(F.col(key_col), salt)
                     < F.lit(_threshold(rate)))


def stratified_sample(df: DataFrame, strata_col: str, rates: Dict[str, float],
                      key_col: str, default_rate: float = 0.0,
                      salt: str = '') -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-source / per-language
    quotas): stratum -> rate from ``rates``, strata not listed fall back
    to ``default_rate``. The rates ship as a broadcast map join (tiny by
    construction); the keep decision is the same scan-stage hash filter
    as hash_sample."""
    spark = df.sparkSession
    rows = [(k, _threshold(v)) for k, v in sorted(rates.items())]
    rmap = spark.createDataFrame(rows, f'{strata_col} string, _thr long')
    dflt = _threshold(default_rate)
    return (df.join(F.broadcast(rmap), strata_col, 'left')
            .filter(hash_bucket_expr(F.col(key_col), salt)
                    < F.coalesce(F.col('_thr'), F.lit(dflt)))
            .drop('_thr'))


def assign_split(df: DataFrame, fractions: Dict[str, float], key_col: str,
                 salt: str = '') -> DataFrame:
    """Leakage-safe train/valid/test assignment: a ``split`` column
    chosen by the hash bucket of ``key_col``. Split on a GROUP key (host,
    entity id) and every row of that group lands in the same split — the
    standard guard against train/test contamination by near-duplicates
    within a group. Fractions must sum to 1 (±1e-9); splits occupy
    adjacent bucket ranges in the given dict order. Pure scan-stage
    Column expression, zero shuffle."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f'fractions must sum to 1, got {total}')
    bucket = hash_bucket_expr(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for name, frac in fractions.items():
        if frac < 0:
            raise ValueError(f'fraction for {name!r} is negative')
        acc += frac
        hi = _threshold(min(acc, 1.0))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    # float accumulation can leave the last boundary a hair under 2^32
    last = list(fractions)[-1]
    return df.withColumn('split', expr.otherwise(F.lit(last)))


def mixture_sample(df: DataFrame, weights: Dict[str, float], source_col: str,
                   key_col: str, default_weight: float = 0.0,
                   salt: str = '') -> DataFrame:
    """Deterministic epoch-weighted source mixture — the "2.5 epochs of
    wikipedia, 0.3 of common-crawl" operator of LLM training recipes
    (Pile/LLaMA-style mixtures). Each row is emitted
    ``floor(w)`` times plus once more iff its hash bucket falls under
    ``frac(w)`` — so a weight of 2.5 yields exactly the deterministic
    half of keys 3 times and the rest 2 times, reproducibly across
    runs/engines. Adds an ``epoch`` column (0-based copy index) so
    downstream shuffles can decorrelate copies by (key, epoch).

    Plan shape: broadcast map join for the weights + a scan-stage
    ``explode(sequence)`` — row multiplication happens AFTER any pushed
    filters, no shuffle. Weights must be < ~100 (sanity bound: this is a
    mixture operator, not a replicator)."""
    for s, w in weights.items():
        if not 0.0 <= w < 100.0:
            raise ValueError(f'weight for {s!r} must be in [0, 100), got {w}')
    if not 0.0 <= default_weight < 100.0:
        raise ValueError(f'default_weight must be in [0, 100)')
    rows = [(s, int(w), _threshold(w - int(w))) for s, w in
            sorted(weights.items())]
    spark = df.sparkSession
    rmap = spark.createDataFrame(
        rows, f'{source_col} string, _full int, _thr long')
    d_full, d_thr = int(default_weight), _threshold(default_weight
                                                   - int(default_weight))
    extra = (hash_bucket_expr(F.col(key_col), salt)
             < F.coalesce(F.col('_thr'), F.lit(d_thr))).cast('int')
    n = F.coalesce(F.col('_full'), F.lit(d_full)) + extra
    reps = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast('array<int>'))
    return (df.join(F.broadcast(rmap), source_col, 'left')
            .withColumn('epoch', F.explode(reps))
            .drop('_full', '_thr'))


def per_key_cap(df: DataFrame, key_col: str, k: int, id_col: str,
                salt: str = '', n_salt: Optional[int] = None) -> DataFrame:
    """Keep at most ``k`` rows per key, chosen deterministically by hash
    order (ties broken by ``id_col``) — the domain-cap / source-cap
    operator. With ``n_salt``, a two-phase plan bounds the final
    per-key window to k * n_salt rows regardless of key skew (see module
    docstring); output is identical either way."""
    if k < 1:
        raise ValueError(f'k must be >= 1, got {k}')
    hv = hash_bucket_expr(F.col(id_col), salt).alias('_hv')
    d = df.withColumn('_hv', hv)
    if n_salt:
        sub = (F.col('_hv') % F.lit(int(n_salt))).alias('_sb')
        w1 = (Window.partitionBy(key_col, '_sb')
              .orderBy(F.col('_hv').asc(), F.col(id_col).asc()))
        d = (d.withColumn('_sb', sub)
             .withColumn('_r1', F.row_number().over(w1))
             .filter(F.col('_r1') <= k)
             .drop('_sb', '_r1'))
    w = Window.partitionBy(key_col).orderBy(F.col('_hv').asc(),
                                            F.col(id_col).asc())
    return (d.withColumn('_rank', F.row_number().over(w))
            .filter(F.col('_rank') <= k)
            .drop('_hv', '_rank'))


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    id_col: str = 'doc_id') -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res with md5-derived uniforms).

    Each row draws u in (0, 1] from the md5 of its id (52 bits) and
    gets key = -ln(u) / weight; the k smallest keys are the sample —
    inclusion probability proportional to weight, reproducible across
    runs and engines (the md5 uniforms replace the RNG). The standard
    quality-weighted corpus subsampling primitive (weight = quality
    score, length, dedup multiplicity...).

    Plan: one JVM-side key expression + distributed top-k
    (TakeOrderedAndProject — per-partition heads, single small merge;
    no global sort materializes). Non-positive weights are excluded.

    Returns (id_col, weight_col, samp_key) — the k sampled rows.
    """
    v = F.conv(F.substring(F.md5(F.col(id_col).cast('string')), 1, 13),
               16, 10).cast('double')
    u = (v + 1.0) / float(1 << 52)
    key = -F.log(u) / F.col(weight_col).cast('double')
    return (df.where(F.col(weight_col) > 0)
            .select(id_col, weight_col, key.alias('samp_key'))
            .orderBy('samp_key')
            .limit(k))
