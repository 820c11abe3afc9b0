"""Sequence packing: map documents into fixed-size token windows.

LLM training consumes fixed-length context windows, not documents: the
corpus is laid out as one long token stream (docs concatenated in a
deterministic order) and sliced every ``ctx_len`` tokens. The operator
computes, per document, its start offset in that stream and the range of
training sequences it lands in — the shuffle-side half of a training
data loader, and the part that needs a distributed engine.

The core is an exclusive prefix sum over the deterministic document
order. The naive Spark form — ``SUM() OVER (ORDER BY id)`` with no
PARTITION BY — collapses the whole table into ONE task and cannot scale;
this implements the textbook two-phase distributed scan instead:

1. ONE range shuffle: ``repartitionByRange(id)`` + in-partition sort,
   persisted so both passes read the same frozen partitioning.
2. A cheap pass computes per-partition token totals (P scalar rows are
   collected — same bounded-driver-data class as knn.suggest_ring's
   two-scalar agg; P = number of partitions, never data rows).
3. The exclusive partition offsets ship back in the task closure, and a
   mapInPandas pass does ``offset[pid] + cumsum`` per partition with
   NumPy — no second shuffle, no single-task bottleneck.

The output is deterministic for a given (id order, ctx_len) regardless
of parallelism: partition boundaries move the SPLIT of the prefix sum,
never its value, which is what the row-value oracle (a DuckDB
``SUM() OVER``) verifies.

The caller should materialize or write the result, then ``unpersist()``
the returned frame's source via ``PackResult.unpersist`` — packing is a
one-shot layout job in practice.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ['pack_sequences', 'PackResult']


class PackResult(NamedTuple):
    df: DataFrame
    source: DataFrame   # the persisted ranged frame backing df

    def unpersist(self) -> None:
        self.source.unpersist()


def pack_sequences(docs: DataFrame, ctx_len: int, id_col: str = 'doc_id',
                   text_col: str = 'text',
                   n_tokens_col: Optional[str] = None,
                   num_partitions: Optional[int] = None) -> PackResult:
    """Per-document placement in the packed token stream:
    (id, n_tokens, start_off, first_seq, last_seq) with
    ``first_seq = start_off // ctx_len`` and
    ``last_seq = (start_off + n_tokens - 1) // ctx_len`` (== first_seq - 1
    sentinel never occurs: zero-token docs get last_seq = first_seq - 1,
    i.e. an empty span, which is the honest answer).

    Token counts come from ``n_tokens_col`` if given, else whitespace
    tokens of ``text_col`` (same ' +' split rule as the rest of the text
    family)."""
    if ctx_len < 1:
        raise ValueError(f'ctx_len must be >= 1, got {ctx_len}')
    n_tok = (F.col(n_tokens_col) if n_tokens_col else
             F.size(F.split(F.trim(F.col(text_col)), ' +')))
    base = docs.select(F.col(id_col).alias('_id'),
                       n_tok.cast('long').alias('_n'))
    p = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    ranged = (base.repartitionByRange(p, '_id')
              .sortWithinPartitions('_id')
              .persist())

    partials = (ranged.withColumn('_pid', F.spark_partition_id())
                .groupBy('_pid').agg(F.sum('_n').alias('_t'))
                .collect())
    totals = {r['_pid']: r['_t'] for r in partials}
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    def scan(batches):
        import numpy as np
        from pyspark import TaskContext
        off = offsets.get(TaskContext.get().partitionId(), 0)
        for pdf in batches:
            if not len(pdf):
                continue
            n = pdf['_n'].to_numpy()
            start = off + np.cumsum(n) - n
            off = int(start[-1] + n[-1])
            pdf = pdf.assign(_start=start)
            yield pdf

    scanned = ranged.mapInPandas(scan, '_id long, _n long, _start long')
    out = scanned.select(
        F.col('_id').alias(id_col),
        F.col('_n').alias('n_tokens'),
        F.col('_start').alias('start_off'),
        (F.col('_start') / ctx_len).cast('long').alias('first_seq'),
        F.floor((F.col('_start') + F.col('_n') - 1) / ctx_len)
        .cast('long').alias('last_seq'))
    return PackResult(out, ranged)
