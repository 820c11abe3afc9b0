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
           'bloom_bits', 'bloom_contains', 'hll_registers', 'hll_estimate']


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


#: HLL geometry: p index bits over a 60-bit md5-derived hash (15 hex
#: chars — 60 bits keeps the value positive in BOTH engines' BIGINT).
_HLL_HASH_BITS = 60


def hll_registers(items: DataFrame, item_col: str = 'item',
                  p: int = 8) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): (idx, rho)
    with idx = top ``p`` hash bits and rho = max over items of
    (leading zeros of the remaining bits + 1).

    Same scale contract as cms_table: ONE map-side-combined groupBy
    whose shuffle carries at most 2^p distinct keys per partition no
    matter how many input rows — the canonical distributed-cardinality
    sketch (registers merge by max, so partial aggregation IS the
    sketch union). Registers never hit by any item are absent (their
    implied rho is 0); hll_estimate accounts for them.

    Hashing is md5-derived so a SQL oracle replays the table
    bit-for-bit (module docstring): h = int(md5(item)[0:15], 16) — 60
    bits; w = h mod 2^(60-p); rho = (60-p) - bitlength(w) + 1, with
    the w = 0 convention rho = 60-p+1.
    """
    wbits = _HLL_HASH_BITS - p
    hv = F.conv(F.substring(F.md5(F.col(item_col)), 1, 15), 16, 10) \
        .cast('long')
    w = hv.bitwiseAND(F.lit((1 << wbits) - 1))
    rho = (F.when(w == 0, F.lit(wbits + 1))
           .otherwise(F.lit(wbits) - F.length(F.bin(w)) + 1)
           .cast('int'))
    return (items.select(F.shiftright(hv, wbits).cast('int').alias('idx'),
                         rho.alias('rho'))
            .groupBy('idx')
            .agg(F.max('rho').alias('rho')))


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """One-row cardinality estimate from an hll_registers table.

    Raw estimate E = alpha_m * m^2 / sum_j 2^-M_j (absent registers
    contribute 2^0 = 1); small-range correction switches to linear
    counting m * ln(m / V) when E <= 2.5 m and V = #zero registers > 0
    (the published recipe; the 2^60 large-range branch is unreachable
    at any real cardinality). Returns (n_registers_hit, estimate)
    with estimate rounded to 6dp — the float formula is written
    operation-for-operation identically in the SQL oracle.
    """
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    agg = registers.agg(
        # coalesce: SUM over zero rows is NULL, which would propagate a
        # NULL estimate for an empty stream/corpus — with 0.0 the formula
        # degenerates to linear counting m*ln(m/m) = 0, the correct empty
        # cardinality (ADVICE r5). Non-empty inputs are unchanged.
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col('rho'))),
                   F.lit(0.0)).alias('s_seen'),
        F.count('*').cast('long').alias('cnt'))
    s = F.col('s_seen') + (F.lit(float(m)) - F.col('cnt'))
    raw = F.lit(alpha * m * m) / s
    v = F.lit(m) - F.col('cnt')
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)) \
        .otherwise(raw)
    return agg.select(F.col('cnt').alias('n_registers_hit'),
                      F.round(est, 6).alias('estimate'))
