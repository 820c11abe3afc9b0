"""Gopher-style intra-document repetition metrics (training-data quality).

Rae et al. 2021 (Gopher, §A1.1) filter web documents by how repetitive
they are: the character fraction of the single most frequent word n-gram,
and the character fraction contained in duplicated longer n-grams. These
are the standard repetition gates in open pipelines (DataTrove, NeMo
Curator); none exist in the reference (a pure geometry library) — this is
an engine addition per SURVEY.md §2.9.

Metrics (all per document, 0.0 for documents shorter than the n-gram):

- ``top{n}_char_frac`` (n = 2, 3): ``cnt * chars(g) / length(text)`` for
  the most frequent word n-gram ``g`` (ties broken by larger character
  length — the tied value is identical either way, so the tie-break never
  changes the output, which is what makes the three independent
  implementations below agree bit-for-bit).
- ``dup{n}_char_frac`` (n = 5): fraction of n-gram-occurrence characters
  that belong to n-grams occurring more than once —
  ``sum(cnt*chars | cnt>1) / sum(cnt*chars)`` (gram-char accounting; the
  overlapping-span de-duplication of the original paper is not
  SQL-replayable, so this engine pins the replayable definition).
- ``dup_word_frac``: fraction of word occurrences that are repeats,
  ``(n_words - n_distinct_words) / n_words``.

Tokenization matches operators/dedup.tokens_expr: ``split(trim(text),
' +')`` — identical in Spark, DuckDB, and the NumPy kernel.

Scale shapes — the metrics are row-local, so the right 100 TB plan has no
shuffle at all:

- ``repetition_stats`` (primary): one Arrow batch in, one out
  (mapInPandas, column-pruned); inside the batch everything is factorized
  NumPy (explode -> codes -> unique (doc, gram-code-tuple) rows ->
  bincount) — the same batch-vectorization pattern as dedup.py's simhash
  kernel (its 3.1x rewrite precedent). ZERO shuffle, embarrassingly
  parallel.
- ``repetition_stats_df``: a zero-Python alternative for clusters where
  Python workers are the bottleneck: posexplode + whole-stage-codegen
  ``lead`` windows build the n-grams JVM-side, then groupBy aggregates.
  Costs two shuffles on doc_id (window + groupBy) for the same answer —
  use the kernel form unless Python is unavailable. No interpreted HOF
  lambdas in either form.
"""

from __future__ import annotations

from typing import Iterator, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['repetition_stats', 'repetition_stats_df', 'REP_COLS']

REP_COLS = ['top2_char_frac', 'top3_char_frac', 'dup5_char_frac',
            'dup_word_frac']

_TOP_NS = (2, 3)
_DUP_N = 5


def _gram_rows(codes: np.ndarray, doc_of: np.ndarray, starts: np.ndarray,
               lens: np.ndarray, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """All word n-gram occurrences as rows (doc, c_0..c_{n-1}) of token
    codes. Returns (rows int64 (M, n+1), nothing) — vectorized over the
    whole batch: a start position s is valid iff s+n-1 stays inside its
    document."""
    total = codes.shape[0]
    pos = np.arange(total, dtype=np.int64)
    within = pos - starts[doc_of]
    valid = within <= (lens[doc_of] - n)
    s = pos[valid]
    rows = np.empty((s.shape[0], n + 1), dtype=np.int64)
    rows[:, 0] = doc_of[valid]
    for j in range(n):
        rows[:, j + 1] = codes[s + j]
    return rows, s


def _per_doc_gram_stats(rows: np.ndarray, tok_chars: np.ndarray, n: int,
                        n_docs: int):
    """From n-gram occurrence rows -> per-doc (best_cnt*best_chars under
    lexicographic (cnt, chars) max, sum cnt*chars, sum cnt*chars where
    cnt>1). Grouping is np.unique over the integer rows (exact — no
    hashing)."""
    if rows.shape[0] == 0:
        z = np.zeros(n_docs, dtype=np.float64)
        return z, z.copy(), z.copy()
    uniq, counts = np.unique(rows, axis=0, return_counts=True)
    docs = uniq[:, 0]
    gchars = tok_chars[uniq[:, 1:]].sum(axis=1) + (n - 1)
    occ_chars = counts * gchars
    tot = np.bincount(docs, weights=occ_chars, minlength=n_docs)
    dup = np.bincount(docs, weights=np.where(counts > 1, occ_chars, 0),
                      minlength=n_docs)
    # lexicographic (cnt, chars) max per doc: chars < 2^32 by batch
    # construction, so pack into one int64 key
    key = counts.astype(np.int64) * (1 << 32) + gchars
    best = np.full(n_docs, -1, dtype=np.int64)
    np.maximum.at(best, docs, key)
    hit = best >= 0
    top = np.zeros(n_docs, dtype=np.float64)
    bc = best[hit] >> 32
    top[hit] = bc * (best[hit] - (bc << 32))
    return top, tot, dup


def _rep_kernel(doc_ids: pd.Series, texts: pd.Series) -> pd.DataFrame:
    """Batch kernel: all metrics for one Arrow batch, fully vectorized."""
    n_docs = len(texts)
    n_chars = texts.str.len().to_numpy(dtype=np.float64)
    toks = texts.str.strip().str.split(r' +', regex=True)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = toks.explode()
    codes, uniques = pd.factorize(flat.to_numpy(), use_na_sentinel=False)
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    starts = np.cumsum(lens) - lens
    tok_chars = pd.Index(uniques).str.len().to_numpy(dtype=np.int64)

    out = {'doc_id': doc_ids.to_numpy()}
    denom_chars = np.maximum(n_chars, 1.0)
    for n in _TOP_NS:
        rows, _ = _gram_rows(codes, doc_of, starts, lens, n)
        top, _, _ = _per_doc_gram_stats(rows, tok_chars, n, n_docs)
        out[f'top{n}_char_frac'] = top / denom_chars
    rows, _ = _gram_rows(codes, doc_of, starts, lens, _DUP_N)
    _, tot, dup = _per_doc_gram_stats(rows, tok_chars, _DUP_N, n_docs)
    out[f'dup{_DUP_N}_char_frac'] = dup / np.maximum(tot, 1.0)

    wrows = np.stack([doc_of, codes], axis=1)
    udocs = np.unique(wrows, axis=0)[:, 0]
    distinct = np.bincount(udocs, minlength=n_docs)
    out['dup_word_frac'] = (lens - distinct) / np.maximum(lens, 1)
    return pd.DataFrame(out)


def repetition_stats(docs: DataFrame, id_col: str = 'doc_id',
                     text_col: str = 'text',
                     passthrough: Sequence[str] = ()) -> DataFrame:
    """(id, top2/top3/dup5/dup_word fractions) per document — the Arrow
    kernel form (zero shuffle; see module docstring). ``passthrough``
    columns are carried through the kernel unchanged, so composites
    (quality_gate) can stack more per-doc signals without a re-join
    shuffle on the id."""
    src = docs.select(F.col(id_col).alias('doc_id'),
                      F.col(text_col).alias('text'),
                      *[F.col(c) for c in passthrough])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                out = _rep_kernel(pdf['doc_id'], pdf['text'])
                for c in passthrough:
                    out[c] = pdf[c].to_numpy()
                yield out

    fields = dict(zip(src.schema.names, src.schema))
    extra = ''.join(f', {c} {fields[c].dataType.simpleString()}'
                    for c in passthrough)
    schema = ('doc_id long, top2_char_frac double, top3_char_frac double, '
              f'dup5_char_frac double, dup_word_frac double{extra}')
    return src.mapInPandas(gen, schema)


def _gram_col(n: int):
    """Window-lead n-gram at each token position (NULL when the window
    runs off the document) — codegen'd, no HOF lambdas."""
    w = Window.partitionBy('doc_id').orderBy('pos')
    parts = [F.col('w')] + [F.lead('w', j).over(w) for j in range(1, n)]
    g = F.concat_ws(' ', *parts)
    return F.when(F.lead('w', n - 1).over(w).isNotNull(), g)


def repetition_stats_df(docs: DataFrame, id_col: str = 'doc_id',
                        text_col: str = 'text') -> DataFrame:
    """Pure-JVM alternative (posexplode + lead windows + groupBy),
    bit-identical to repetition_stats; two shuffles on doc_id."""
    toks = F.split(F.trim(F.col(text_col)), ' +')
    base = (docs.select(F.col(id_col).alias('doc_id'),
                        F.greatest(F.length(text_col), F.lit(1))
                        .cast('double').alias('n_chars'),
                        F.posexplode(toks).alias('pos', 'w')))
    grams = base.select(
        'doc_id', 'n_chars', 'pos', 'w',
        *[_gram_col(n).alias(f'g{n}') for n in (*_TOP_NS, _DUP_N)])

    def _gram_agg(n: int, out_name: str, dup: bool) -> DataFrame:
        cnt = (grams.filter(F.col(f'g{n}').isNotNull())
               .groupBy('doc_id', 'n_chars', f'g{n}')
               .agg(F.count('*').alias('cnt'))
               .withColumn('gchars', F.length(f'g{n}').cast('double')))
        occ = F.col('cnt') * F.col('gchars')
        if dup:
            agg = cnt.groupBy('doc_id').agg(
                (F.sum(F.when(F.col('cnt') > 1, occ).otherwise(0.0)) /
                 F.greatest(F.sum(occ), F.lit(1.0))).alias(out_name))
        else:
            best = F.max(F.struct(F.col('cnt'), F.col('gchars'))).alias('b')
            agg = (cnt.groupBy('doc_id', 'n_chars').agg(best)
                   .select('doc_id', (F.col('b.cnt') * F.col('b.gchars') /
                                      F.col('n_chars')).alias(out_name)))
        return agg

    words = (base.groupBy('doc_id').agg(
        ((F.count('*') - F.count_distinct('w')) /
         F.count('*')).alias('dup_word_frac')))

    out = words
    for n in _TOP_NS:
        out = out.join(_gram_agg(n, f'top{n}_char_frac', dup=False),
                       'doc_id', 'left')
    out = out.join(_gram_agg(_DUP_N, f'dup{_DUP_N}_char_frac', dup=True),
                   'doc_id', 'left')
    return out.select('doc_id',
                      *[F.coalesce(F.col(c), F.lit(0.0)).alias(c)
                        for c in REP_COLS])
