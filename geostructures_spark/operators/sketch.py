"""Deterministic frequency/cardinality sketches (count-min + linear
counting).

Streaming-style sketches re-expressed as bounded aggregations — the
"novel sketch" slot of the pipeline family. Unlike Spark's built-in
count_min_sketch / approx_count_distinct (whose binary states and hash
seeds are not reproducible outside the JVM), these use md5-derived
hash rows, so a SQL oracle can replay the ENTIRE sketch bit-for-bit:

- ``cms_table``: a depth x width count-min sketch (Cormode &
  Muthukrishnan) built with ONE map-side-combined groupBy over
  (depth, bucket) — the output is <= depth*width rows no matter how
  many input rows, which is the whole point at 10^12 tokens;
- ``cms_estimate``: point-frequency estimates for an item column —
  min over depth of the joined counters (classic CMS upper bound:
  estimate >= true, overestimate bounded by eps*N w.h.p.);
- ``linear_count``: Whang et al. linear-counting distinct estimate
  -m * ln(empty_fraction) over m md5 buckets; exact-ish for
  cardinalities below the bucket count, one groupBy-free aggregate
  (count distinct buckets).

Hash rows: h_d(x) = int(hex(md5(d || ':' || x))[0:8]) % width —
Spark ``conv(substr(md5(..)), 16, 10)`` and DuckDB
``CAST('0x' || substr(md5(..)) AS BIGINT)`` produce the identical
integer (verified), so the sketch tables match across engines exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ['cms_hash_expr', 'cms_table', 'cms_estimate', 'linear_count',
           'bloom_bits', 'bloom_contains']


def cms_hash_expr(item: Column, d: int, width: int) -> Column:
    """Bucket of ``item`` in hash row ``d`` (deterministic, md5-based)."""
    hx = F.substring(F.md5(F.concat(F.lit(f'{d}:'), item)), 1, 8)
    return (F.conv(hx, 16, 10).cast('long') % width).alias(f'b{d}')


def cms_table(items: DataFrame, item_col: str = 'item', depth: int = 4,
              width: int = 256) -> DataFrame:
    """(d, bucket, cnt) sparse count-min sketch over an item column.

    One explode of depth hash rows (JVM codegen) + one map-side-combined
    groupBy: the shuffle carries at most depth*width distinct keys per
    partition regardless of input size.
    """
    rows = F.explode(F.array(*[
        F.struct(F.lit(d).alias('d'),
                 cms_hash_expr(F.col(item_col), d, width).alias('bucket'))
        for d in range(depth)]))
    return (items.select(rows.alias('r'))
            .select('r.d', 'r.bucket')
            .groupBy('d', 'bucket')
            .agg(F.count('*').alias('cnt')))


def cms_estimate(sketch: DataFrame, items: DataFrame,
                 item_col: str = 'item', depth: int = 4,
                 width: int = 256) -> DataFrame:
    """(item, est) CMS frequency estimate: min over hash rows.

    The sketch is depth*width rows at most — broadcast; absent buckets
    count 0 (an item never inserted estimates 0).
    """
    probes = items.select(
        item_col,
        F.explode(F.array(*[
            F.struct(F.lit(d).alias('d'),
                     cms_hash_expr(F.col(item_col), d, width).alias('bucket'))
            for d in range(depth)])).alias('p')
    ).select(item_col, 'p.d', 'p.bucket')
    joined = probes.join(F.broadcast(sketch), ['d', 'bucket'], 'left')
    return (joined.groupBy(item_col)
            .agg(F.min(F.coalesce('cnt', F.lit(0))).alias('est')))


def linear_count(items: DataFrame, item_col: str = 'item',
                 m: int = 4096) -> DataFrame:
    """One-row (n_buckets_hit, estimate) linear-counting sketch.

    estimate = -m * ln((m - hit) / m), NULL when every bucket is hit
    (cardinality >> m; raise m). The aggregate is a single
    count-distinct over md5 buckets — no sketch state to merge.
    """
    b = (F.conv(F.substring(F.md5(F.col(item_col)), 1, 8), 16, 10)
         .cast('long') % m)
    return (items.select(b.alias('b'))
            .agg(F.count_distinct('b').alias('n_buckets_hit'))
            .select('n_buckets_hit',
                    F.when(F.col('n_buckets_hit') < m,
                           -float(m) * F.log((F.lit(float(m))
                                              - F.col('n_buckets_hit'))
                                             / float(m)))
                    .alias('estimate')))


def bloom_bits(items: DataFrame, item_col: str = 'item', m_bits: int = 8192,
               n_hashes: int = 4) -> DataFrame:
    """(bit) — the set bit positions of an md5 Bloom filter over a key set.

    The classic join-pruning primitive (ship the filter, drop probe rows
    with a zero bit before the shuffle): built with one explode of
    n_hashes positions + one DISTINCT — output bounded by m_bits rows
    no matter the input. Spark's native BloomFilter aggregate is not
    reproducible outside the JVM; md5 hash rows make the bit set
    oracle-exact (same conv/CAST parity as cms_hash_expr).
    """
    rows = F.explode(F.array(*[
        cms_hash_expr(F.col(item_col), d, m_bits) for d in range(n_hashes)]))
    return (items.select(rows.alias('bit'))
            .distinct())


def bloom_contains(bits: DataFrame, probes: DataFrame,
                   item_col: str = 'item', m_bits: int = 8192,
                   n_hashes: int = 4) -> DataFrame:
    """(item, maybe_present) — Bloom membership for a probe column.

    maybe_present is True iff ALL n_hashes bit positions are set:
    no false negatives ever; false-positive rate ~ (1-e^{-kn/m})^k.
    The bit set (<= m_bits rows) broadcasts. Bit rows explode from the
    DISTINCT probe set, so a probe item appearing many times still
    contributes exactly n_hashes rows (a duplicate would otherwise make
    n_set a multiple of n_hashes and flip the equality test to a false
    negative).
    """
    base = probes.select(item_col).distinct()
    pr = base.select(
        item_col,
        F.explode(F.array(*[
            cms_hash_expr(F.col(item_col), d, m_bits)
            for d in range(n_hashes)])).alias('bit'))
    hit = pr.join(F.broadcast(bits), 'bit', 'left_semi') \
            .groupBy(item_col).agg(F.count('*').alias('n_set'))
    return (base.join(hit, item_col, 'left')
            .select(item_col,
                    (F.coalesce('n_set', F.lit(0)) == n_hashes)
                    .alias('maybe_present')))
