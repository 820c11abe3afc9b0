"""BM25 ranked keyword retrieval (Robertson & Zaragoza).

The lexical-search complement to the embedding family (simsearch/pq):
score(q, d) = sum over query terms t of

    idf(t) * tf(t,d) * (k1 + 1) / (tf(t,d) + k1 * (1 - b + b * dl/avgdl))

with the Lucene idf form ln(1 + (N - df + 0.5)/(df + 0.5)), which is
always positive. Tokenization is the engine-wide words_expr.

Scale shape (10^12 docs):

- the corpus-side explode is FILTERED to query terms by a broadcast
  join before anything shuffles — non-matching tokens die map-side, so
  the tf shuffle carries only (doc, query, term) hit rows;
- df/idf are computed over the same hits (documents with zero query
  terms can't affect df of a query term... they can't contain it), so
  no full-vocabulary pass is needed — the statistics tables are
  query-sized and broadcast back;
- N and avgdl are one scalar aggregate over the token-length column
  (computed WITHOUT exploding: size() per row);
- top-k ranks per query over per-doc scores; ranking uses the ROUNDED
  (6 dp) score with doc-id tie-break so exact-duplicate documents
  order identically in Spark and the SQL oracle (a grouped float SUM
  may differ by one ulp between two equal-score docs and split the
  tie differently per engine otherwise).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from geostructures_spark.operators.bpe import words_expr

__all__ = ['bm25_topk', 'rrf_fuse']


def bm25_topk(docs: DataFrame, queries: Sequence[tuple[int, Sequence[str]]],
              k: int, k1: float = 1.2, b: float = 0.75,
              id_col: str = 'doc_id', text_col: str = 'text',
              max_chars: int = 150) -> DataFrame:
    """Top-k BM25 documents per query.

    ``queries`` is a driver-side list of (query_id, [terms]) — the
    query workload, inherently small next to the corpus. Returns
    (query_id, doc_id, score, rank) with score rounded to 6 dp and
    rank 1..k by (score DESC, doc_id ASC).
    """
    spark = docs.sparkSession
    qrows = [(int(qid), t) for qid, terms in queries for t in set(terms)]
    qdf = spark.createDataFrame(qrows, 'query_id long, term string')

    toks = docs.select(
        id_col,
        F.filter(words_expr(F.col(text_col), max_chars),
                 lambda w: w != '').alias('_t'))
    toks = toks.select(id_col, '_t',
                       F.size('_t').cast('double').alias('dl'))

    stats = toks.agg(
        F.count('*').cast('double').alias('n_docs'),
        F.avg('dl').alias('avgdl'))

    hits = (toks.select(id_col, 'dl', F.explode('_t').alias('term'))
            .join(F.broadcast(qdf), 'term'))
    tf = (hits.groupBy('query_id', id_col, 'term', 'dl')
          .agg(F.count('*').cast('double').alias('tf')))

    df_t = (tf.select('term', id_col).distinct()
            .groupBy('term').agg(F.count('*').cast('double').alias('df')))
    idf = (df_t.crossJoin(F.broadcast(stats))
           .select('term', 'n_docs', 'avgdl',
                   F.log(F.lit(1.0)
                         + (F.col('n_docs') - F.col('df') + 0.5)
                         / (F.col('df') + 0.5)).alias('idf')))

    term_score = (tf.join(F.broadcast(idf), 'term')
                  .select('query_id', id_col,
                          (F.col('idf') * F.col('tf') * (k1 + 1.0)
                           / (F.col('tf')
                              + k1 * (1.0 - b
                                      + b * F.col('dl') / F.col('avgdl'))))
                          .alias('s')))
    scores = (term_score.groupBy('query_id', id_col)
              .agg(F.round(F.sum('s'), 6).alias('score')))
    w = Window.partitionBy('query_id').orderBy(F.col('score').desc(),
                                               F.col(id_col).asc())
    return (scores.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))


def rrf_fuse(rankings, k: int, rrf_k: int = 60,
             query_col: str = 'query_id', id_col: str = 'doc_id') -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of ranked lists.

    ``rankings`` is a list of DataFrames each carrying
    (query_col, id_col, rank); the fused score is
    sum over systems of 1 / (rrf_k + rank) — the standard hybrid
    lexical+vector retrieval combiner (BM25 list + ANN list in,
    one list out). A document absent from a system contributes 0.

    Fused ranking is deterministic cross-engine: the per-system
    reciprocal terms are summed by a groupBy (commutative-exact for
    two systems; for 3+ the score is rounded to 12 dp before ranking
    so association order cannot split a tie), tie-break on id.

    Returns (query_col, id_col, rrf_score, rank), rank 1..k.
    """
    from functools import reduce

    terms = [r.select(query_col, id_col,
                      (1.0 / (F.lit(float(rrf_k)) + F.col('rank')))
                      .alias('term'))
             for r in rankings]
    unioned = reduce(lambda a, b: a.unionByName(b), terms)
    scores = (unioned.groupBy(query_col, id_col)
              .agg(F.round(F.sum('term'), 12).alias('rrf_score')))
    w = Window.partitionBy(query_col).orderBy(F.col('rrf_score').desc(),
                                              F.col(id_col).asc())
    return (scores.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))
