"""N-gram language-model quality scoring (stupid-backoff perplexity).

The CCNet / Gopher-style pipelines rank web documents by the perplexity
of a small n-gram LM; low-quality boilerplate and gibberish score badly.
No reference counterpart — geostructures is a geometry library; the
algorithm is the published stupid-backoff score (Brants et al. 2007):

    S(w_i | w_{i-1}) = c(w_{i-1} w_i) / c(w_{i-1})          if seen
                     = alpha * c(w_i) / N                    otherwise
    S(w_0)           = c(w_0) / N

(not a normalized probability — hence "score" — but monotone enough to
rank documents, which is all a quality filter needs).

Scale shape (10^12 docs):

- ``lm_counts`` is one explode + map-side-combined groupBy per order —
  the model tables are vocabulary-sized (10^6-10^8 rows for web text),
  thousands of times smaller than the corpus.
- ``score_docs`` never shuffles the corpus rows themselves: the bigram
  stream is produced by a JVM ``transform`` over each document's token
  array (no window, no lag shuffle), the count tables join via
  ``F.broadcast`` (they are the small side by construction), and the
  only Exchange is the final map-side-combined groupBy(doc_id) that
  reduces each document to a single score row. For LMs too big to
  broadcast, drop the hint and the same plan degrades to two hash
  joins keyed on the (already exploded) token columns.
- Training corpus == scoring corpus here for oracle determinism; a real
  pipeline trains the counts on a held-out high-quality corpus and
  broadcasts exactly the same tables.

Scores are rounded to 6 dp in the contract projection (house style for
cross-engine double comparison; per-doc sums span <=~40 terms of
magnitude <=~20, so order-dependent error ~1e-12 << 5e-7).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostructures_spark.operators.bpe import words_expr

__all__ = ['ALPHA', 'doc_tokens', 'lm_counts', 'perplexity_filter', 'score_docs']

#: stupid-backoff discount for unseen bigrams (the published constant).
ALPHA = 0.4


def doc_tokens(docs: DataFrame, text_col: str = 'text',
               max_chars: int = 150) -> DataFrame:
    """(doc_id, toks array<string>) — normalized non-empty tokens.

    Same normalization as the BPE family (bpe.words_expr) so every
    text operator in the engine tokenizes identically.
    """
    return docs.select(
        'doc_id',
        F.filter(words_expr(F.col(text_col), max_chars),
                 lambda w: w != '').alias('toks'))


def lm_counts(toks: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train the LM: (unigrams(w, c1), bigrams(w1, w2, c2)).

    One explode + groupBy per order — both map-side combined, both
    vocabulary-sized outputs.
    """
    uni = (toks.select(F.explode('toks').alias('w'))
           .groupBy('w').agg(F.count('*').alias('c1')))
    pairs = F.expr(
        "transform(slice(toks, 1, greatest(size(toks) - 1, 0)),"
        " (w, i) -> struct(w AS w1, toks[i + 1] AS w2))")
    bi = (toks.select(F.explode(pairs).alias('p'))
          .select('p.w1', 'p.w2')
          .groupBy('w1', 'w2').agg(F.count('*').alias('c2')))
    return uni, bi


def score_docs(toks: DataFrame, uni: DataFrame, bi: DataFrame,
               alpha: float = ALPHA) -> DataFrame:
    """Stupid-backoff log-score + perplexity per document.

    Returns (doc_id, n_tokens, n_hits, logscore, ppl) where n_hits
    counts tokens scored from a seen bigram, logscore = sum of ln(S),
    and ppl = exp(-logscore / n_tokens). Empty documents keep
    n_tokens = 0 with NULL logscore/ppl.
    """
    total = uni.agg(F.sum('c1').alias('n')).select(
        F.col('n').cast('double').alias('lm_total'))
    # (tpos, wp, w) per token, built inside codegen: wp is NULL for the
    # first token (CASE, not toks[i-1] — ANSI mode rejects index -1).
    grams = F.expr(
        "transform(toks, (w, i) -> struct("
        " i AS tpos,"
        " CASE WHEN i = 0 THEN CAST(NULL AS STRING) ELSE toks[i - 1] END AS wp,"
        " w AS w))")
    # explode_outer keeps empty documents as one null-gram row, so the
    # final per-doc aggregate covers EVERY document and no join back
    # against the corpus is needed (count/sum ignore the null row).
    g = (toks.select('doc_id', F.explode_outer(grams).alias('g'))
         .select('doc_id', 'g.tpos', 'g.wp', 'g.w')
         .crossJoin(F.broadcast(total)))
    g = (g.join(F.broadcast(uni.select(F.col('w').alias('wp'),
                                       F.col('c1').alias('c1_prev'))),
                'wp', 'left')
         .join(F.broadcast(uni), 'w', 'left')
         .join(F.broadcast(bi.select(F.col('w1').alias('wp'),
                                     F.col('w2').alias('w'), 'c2')),
               ['wp', 'w'], 'left'))
    hit = F.col('c2').isNotNull() & F.col('c1_prev').isNotNull()
    backoff = F.log(F.lit(float(alpha)) * F.col('c1') / F.col('lm_total'))
    lp = (F.when(F.col('tpos') == 0,
                 F.log(F.col('c1') / F.col('lm_total')))
          .when(hit, F.log(F.col('c2') / F.col('c1_prev')))
          .otherwise(backoff))
    per_doc = (g.groupBy('doc_id')
               .agg(F.count('w').alias('n_tokens'),
                    F.coalesce(F.sum(hit.cast('long')), F.lit(0))
                    .alias('n_hits'),
                    F.sum(F.when(F.col('w').isNotNull(), lp))
                    .alias('logscore')))
    return per_doc.select(
        'doc_id', 'n_tokens', 'n_hits', 'logscore',
        F.when(F.col('n_tokens') > 0,
               F.exp(-F.col('logscore') / F.col('n_tokens'))).alias('ppl'))


def perplexity_filter(docs: DataFrame, max_ppl: float,
                      text_col: str = 'text',
                      max_chars: int = 150) -> DataFrame:
    """End-to-end convenience: keep documents with ppl <= max_ppl.

    Composition of the three stages above; survives documents whose
    perplexity under the corpus-trained LM is at or below the cut
    (empty documents are dropped — they carry no signal).
    """
    toks = doc_tokens(docs, text_col, max_chars)
    uni, bi = lm_counts(toks)
    scored = score_docs(toks, uni, bi)
    if not (max_ppl > 0 and math.isfinite(max_ppl)):
        raise ValueError(f'max_ppl must be positive/finite, got {max_ppl!r}')
    return (docs.join(scored.where(F.col('ppl') <= max_ppl)
                      .select('doc_id', 'ppl'), 'doc_id'))
