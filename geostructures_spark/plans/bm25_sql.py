"""DuckDB SQL replay of BM25 retrieval + hybrid RRF fusion
(operators/bm25.py).

Constants are embedded via Python repr with an ``e0`` suffix so both
engines evaluate the *identical doubles*: the operator computes
``k1 + 1`` and ``1 - b`` in Python before they become Column literals,
and a bare ``2.2`` in SQL would be DECIMAL (exact), not the double the
Spark side used. Scores are rounded to 6 dp BEFORE ranking in both
engines (grouped float sums may differ by an ulp between equal-score
docs and split the doc-id tie differently otherwise — same reasoning
as pq_sql's pivoted ADC fold). The RRF sum of TWO reciprocal terms is
commutative-exact in IEEE, and is rounded to 12 dp before ranking to
mirror the operator's 3+-system guard.
"""

from __future__ import annotations

from typing import Sequence

__all__ = ['bm25_topk_duckdb', 'hybrid_rrf_duckdb']


def _bm25_ctes(queries: Sequence[tuple[int, Sequence[str]]],
               k1: float = 1.2, b: float = 0.75,
               max_chars: int = 150) -> str:
    """The shared chain, ending at rk(query_id, doc_id, score, rank)."""
    vals = ', '.join(f"({int(qid)}, '{t}')"
                     for qid, terms in queries for t in sorted(set(terms)))
    num_c = f'{k1 + 1.0!r}e0'          # matches Spark's Python-computed k1+1
    one_minus_b = f'{1.0 - b!r}e0'
    k1_c, b_c = f'{k1!r}e0', f'{b!r}e0'
    return f"""
  q(query_id, term) AS (VALUES {vals}),
  toks AS MATERIALIZED (
    SELECT doc_id,
           list_filter(string_split(regexp_replace(
             lower(substr(text, 1, {max_chars})), '[^a-z ]', ' ', 'g'), ' '),
             w -> w <> '') AS t
    FROM documents),
  tl AS MATERIALIZED (
    SELECT doc_id, t, CAST(len(t) AS DOUBLE) AS dl FROM toks),
  stats AS (
    SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM tl),
  hits AS (
    SELECT q.query_id, tl.doc_id, q.term, tl.dl
    FROM tl, UNNEST(tl.t) AS u(tok), q
    WHERE q.term = u.tok),
  tf AS MATERIALIZED (
    SELECT query_id, doc_id, term, dl, CAST(count(*) AS DOUBLE) AS tf
    FROM hits GROUP BY 1, 2, 3, 4),
  dft AS (
    SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
    FROM tf GROUP BY 1),
  idf AS (
    SELECT term, ln(1.0e0 + (s.n_docs - df + 0.5e0) / (df + 0.5e0)) AS idf,
           s.avgdl
    FROM dft, stats s),
  ts AS (
    SELECT tf.query_id, tf.doc_id,
           idf.idf * tf.tf * {num_c}
           / (tf.tf + {k1_c} * ({one_minus_b}
                                + ({b_c} * tf.dl) / idf.avgdl)) AS s
    FROM tf JOIN idf USING (term)),
  sc AS (
    SELECT query_id, doc_id, ROUND(SUM(s), 6) AS score
    FROM ts GROUP BY 1, 2),
  rk AS (
    SELECT query_id, doc_id, score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY score DESC, doc_id ASC) AS INT) AS rank
    FROM sc)"""


def bm25_topk_duckdb(queries: Sequence[tuple[int, Sequence[str]]], k: int,
                     k1: float = 1.2, b: float = 0.75,
                     max_chars: int = 150) -> str:
    return f"""
WITH {_bm25_ctes(queries, k1, b, max_chars)}
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id, score, rank
  FROM rk WHERE rank <= {k} ORDER BY query_id, rank"""


def hybrid_rrf_duckdb(queries: Sequence[tuple[int, Sequence[str]]],
                      k: int, rrf_k: int = 60, k1: float = 1.2,
                      b: float = 0.75, max_chars: int = 150) -> str:
    """RRF fusion of the BM25 list with an exact-cosine list whose
    query embedding is embeddings[vec_id = query_id] (self excluded),
    both cut at k before fusing — mirroring the Spark composition
    bm25_topk + cosine_topk_exact + rrf_fuse."""
    qids = ', '.join(str(int(qid)) for qid, _ in queries)
    return f"""
WITH {_bm25_ctes(queries, k1, b, max_chars)},
  bmk AS (SELECT query_id, doc_id, rank FROM rk WHERE rank <= {k}),
  qv AS (SELECT vec_id AS query_id, embedding FROM embeddings
         WHERE vec_id IN ({qids})),
  cos AS (
    SELECT q.query_id, e.vec_id AS doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                      e.vec_id ASC) AS INT) AS rank
    FROM embeddings e, qv q WHERE e.vec_id <> q.query_id),
  cok AS (SELECT query_id, doc_id, rank FROM cos WHERE rank <= {k}),
  terms AS (
    SELECT query_id, doc_id, 1.0e0 / ({rrf_k}.0e0 + rank) AS term FROM bmk
    UNION ALL
    SELECT query_id, doc_id, 1.0e0 / ({rrf_k}.0e0 + rank) AS term FROM cok),
  fused AS (
    SELECT query_id, doc_id, ROUND(SUM(term), 12) AS rrf_score
    FROM terms GROUP BY 1, 2),
  frk AS (
    SELECT query_id, doc_id, rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY rrf_score DESC, doc_id ASC) AS INT) AS rank
    FROM fused)
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(doc_id AS BIGINT) AS doc_id, rrf_score, rank
  FROM frk WHERE rank <= {k} ORDER BY query_id, rank"""
