"""DuckDB SQL replay of the PQ pipeline (operators/pq.py).

Re-derives codebook training (unrolled Lloyd, per-subspace argmin by
``list_distance`` with code-id tie-break), encoding, and ADC top-k from
the raw embeddings table — nothing fed from Spark. Chain CTEs are
MATERIALIZED (multi-referenced; see bpe_sql).

The ADC sum is written as a PIVOTED four-way join with explicit
left-fold parentheses — NOT ``SUM() GROUP BY`` — so two candidates that
share a code path evaluate the identical expression and get the
identical double: the (dist ASC, neighbor_id ASC) tie-break then
resolves equal-code candidates the same way in both engines. A grouped
SUM may add the four subspace terms in any order, which can split an
exact tie by one ulp and flip a rank against the Spark side.
"""

from __future__ import annotations

__all__ = ['pq_chain_ctes', 'pq_encode_duckdb', 'pq_adc_duckdb',
           'ivfpq_topk_duckdb']


def pq_chain_ctes(m: int = 4, dsub: int = 16, ksub: int = 8,
                  n_iter: int = 1) -> str:
    """Shared CTE chain: sub / cb0 / (asn,mu,new,cb)xN — final codebook
    is cb{n_iter}, encode table is enc."""
    ctes = [f"""
  sub AS MATERIALIZED (
    SELECT vec_id, CAST(s AS INT) AS sub_id,
           list_transform(
             list_slice(embedding, CAST(s AS INT) * {dsub} + 1,
                        CAST(s AS INT) * {dsub} + {dsub}),
             x -> CAST(x AS DOUBLE)) AS sv
    FROM embeddings, UNNEST(range({m})) AS r(s))""", f"""
  init AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {ksub})""", """
  cb0 AS MATERIALIZED (
    SELECT sub_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY sub_id ORDER BY vec_id)
                - 1 AS INT) AS code_id,
           sv AS c
    FROM sub WHERE vec_id IN (SELECT vec_id FROM init))"""]
    for i in range(1, n_iter + 1):
        p = i - 1
        ctes.append(f"""
  asn{i} AS (
    SELECT vec_id, sub_id, sv, code_id FROM (
      SELECT v.vec_id, v.sub_id, v.sv, c.code_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub_id
               ORDER BY list_distance(v.sv, c.c) ASC, c.code_id ASC) AS rnk
      FROM sub v JOIN cb{p} c USING (sub_id)) z WHERE rnk = 1)""")
        ctes.append(f"""
  mu{i} AS (
    SELECT sub_id, code_id, pos, AVG(val) AS mu FROM (
      SELECT sub_id, code_id, unnest(sv) AS val,
             unnest(range(1, len(sv) + 1)) AS pos
      FROM asn{i}) u GROUP BY 1, 2, 3)""")
        ctes.append(f"""
  new{i} AS (
    SELECT sub_id, code_id, list(mu ORDER BY pos) AS c
    FROM mu{i} GROUP BY 1, 2)""")
        ctes.append(f"""
  cb{i} AS MATERIALIZED (
    SELECT b.sub_id, b.code_id, COALESCE(n.c, b.c) AS c
    FROM cb{p} b LEFT JOIN new{i} n USING (sub_id, code_id))""")
    ctes.append(f"""
  enc AS MATERIALIZED (
    SELECT vec_id, sub_id, code_id FROM (
      SELECT v.vec_id, v.sub_id, c.code_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id, v.sub_id
               ORDER BY list_distance(v.sv, c.c) ASC, c.code_id ASC) AS rnk
      FROM sub v JOIN cb{n_iter} c USING (sub_id)) z WHERE rnk = 1)""")
    return ','.join(s.rstrip() for s in ctes)


def pq_encode_duckdb(m: int = 4, dsub: int = 16, ksub: int = 8,
                     n_iter: int = 1) -> str:
    """(vec_id, codes_str) — comma-joined per-subspace code ids."""
    return (f"WITH {pq_chain_ctes(m, dsub, ksub, n_iter)}\n"
            "  SELECT vec_id,\n"
            "         string_agg(CAST(code_id AS VARCHAR), ','"
            " ORDER BY sub_id) AS codes_str\n"
            "  FROM enc GROUP BY vec_id ORDER BY vec_id")


def pq_adc_duckdb(k: int = 5, query_mod: int = 83, m: int = 4,
                  dsub: int = 16, ksub: int = 8, n_iter: int = 1) -> str:
    """(query_id, neighbor_id, adc_dist, rank) — squared-L2 ADC top-k."""
    assert m == 4, 'the pivoted ADC replay is written for m=4'
    cb = f'cb{n_iter}'
    return f"""
WITH {pq_chain_ctes(m, dsub, ksub, n_iter)},
  codes_w AS (
    SELECT vec_id,
           max(CASE WHEN sub_id = 0 THEN code_id END) AS c0,
           max(CASE WHEN sub_id = 1 THEN code_id END) AS c1,
           max(CASE WHEN sub_id = 2 THEN code_id END) AS c2,
           max(CASE WHEN sub_id = 3 THEN code_id END) AS c3
    FROM enc GROUP BY vec_id),
  q AS (
    SELECT vec_id AS query_id, sub_id, sv FROM sub
    WHERE vec_id % {query_mod} = 0),
  lut AS MATERIALIZED (
    SELECT q.query_id, c.sub_id, c.code_id,
           list_distance(q.sv, c.c) ** 2 AS d
    FROM q JOIN {cb} c USING (sub_id)),
  cand AS (
    SELECT l0.query_id, w.vec_id AS neighbor_id,
           (((l0.d + l1.d) + l2.d) + l3.d) AS adc_dist
    FROM codes_w w
    JOIN lut l0 ON l0.sub_id = 0 AND l0.code_id = w.c0
    JOIN lut l1 ON l1.sub_id = 1 AND l1.code_id = w.c1
                AND l1.query_id = l0.query_id
    JOIN lut l2 ON l2.sub_id = 2 AND l2.code_id = w.c2
                AND l2.query_id = l0.query_id
    JOIN lut l3 ON l3.sub_id = 3 AND l3.code_id = w.c3
                AND l3.query_id = l0.query_id
    WHERE w.vec_id <> l0.query_id),
  rk AS (
    SELECT query_id, neighbor_id, adc_dist,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
    FROM cand)
  SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank
  FROM rk WHERE rank <= {k} ORDER BY query_id, rank"""


def ivfpq_topk_duckdb(k: int = 5, n_probe: int = 2, query_mod: int = 83,
                      n_cents: int = 8, m: int = 4, dsub: int = 16,
                      ksub: int = 8, n_iter: int = 1) -> str:
    """(query_id, neighbor_id, adc_dist, rank) — IVF-probed PQ ADC top-k.

    Composes the proven replay pieces: cosine IVF assignment (the
    _EMB_NEARDUP_DUCK pattern: list_cosine_similarity ROW_NUMBER with
    centroid-id tie-break) restricts candidates to the probed buckets;
    the PQ chain + pivoted left-fold ADC ranks them."""
    assert m == 4, 'the pivoted ADC replay is written for m=4'
    cb = f'cb{n_iter}'
    return f"""
WITH {pq_chain_ctes(m, dsub, ksub, n_iter)},
  codes_w AS (
    SELECT vec_id,
           max(CASE WHEN sub_id = 0 THEN code_id END) AS c0,
           max(CASE WHEN sub_id = 1 THEN code_id END) AS c1,
           max(CASE WHEN sub_id = 2 THEN code_id END) AS c2,
           max(CASE WHEN sub_id = 3 THEN code_id END) AS c3
    FROM enc GROUP BY vec_id),
  cents AS (
    SELECT vec_id AS centroid_id, embedding AS c_emb
    FROM embeddings WHERE vec_id < {n_cents}),
  inv AS MATERIALIZED (
    SELECT vec_id, centroid_id FROM (
      SELECT v.vec_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY v.vec_id
               ORDER BY list_cosine_similarity(v.embedding, c.c_emb) DESC,
                        c.centroid_id ASC) AS r
      FROM embeddings v, cents c) z WHERE r = 1),
  qraw AS (
    SELECT vec_id AS query_id, embedding FROM embeddings
    WHERE vec_id % {query_mod} = 0),
  probe AS (
    SELECT query_id, centroid_id FROM (
      SELECT q.query_id, c.centroid_id,
             ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY list_cosine_similarity(q.embedding, c.c_emb) DESC,
                        c.centroid_id ASC) AS r
      FROM qraw q, cents c) z WHERE r <= {n_probe}),
  candpairs AS (
    SELECT DISTINCT p.query_id, i.vec_id
    FROM probe p JOIN inv i USING (centroid_id)
    WHERE i.vec_id <> p.query_id),
  qsub AS (
    SELECT vec_id AS query_id, sub_id, sv FROM sub
    WHERE vec_id % {query_mod} = 0),
  lut AS MATERIALIZED (
    SELECT q.query_id, c.sub_id, c.code_id,
           list_distance(q.sv, c.c) ** 2 AS d
    FROM qsub q JOIN {cb} c USING (sub_id)),
  cand AS (
    SELECT cp.query_id, w.vec_id AS neighbor_id,
           (((l0.d + l1.d) + l2.d) + l3.d) AS adc_dist
    FROM candpairs cp
    JOIN codes_w w ON w.vec_id = cp.vec_id
    JOIN lut l0 ON l0.query_id = cp.query_id AND l0.sub_id = 0
                AND l0.code_id = w.c0
    JOIN lut l1 ON l1.query_id = cp.query_id AND l1.sub_id = 1
                AND l1.code_id = w.c1
    JOIN lut l2 ON l2.query_id = cp.query_id AND l2.sub_id = 2
                AND l2.code_id = w.c2
    JOIN lut l3 ON l3.query_id = cp.query_id AND l3.sub_id = 3
                AND l3.code_id = w.c3),
  rk AS (
    SELECT query_id, neighbor_id, adc_dist,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY adc_dist ASC, neighbor_id ASC) AS INT) AS rank
    FROM cand)
  SELECT query_id, neighbor_id, ROUND(adc_dist, 6) AS adc_dist, rank
  FROM rk WHERE rank <= {k} ORDER BY query_id, rank"""
