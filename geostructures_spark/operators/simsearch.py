"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_exact``: brute-force cosine top-k — the correctness
  baseline. Dot products via F.aggregate/zip_with (JVM-side, no Python).
- ``ivf_assign`` / ``ivf_topk``: IVF-style scale path — k-means-free
  inverted file using a fixed centroid sample: vectors are bucketed to
  their nearest centroid once (one shuffle), queries probe ``n_probe``
  nearest centroid buckets only.

Multimodal note (task brief): image/audio/video decode plumbing lives in
operators/multimodal.py with the same pattern — binary column + typed
metadata + batch UDF; the decode kernel itself is stubbed in this
environment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ['cosine_sim_expr', 'cosine_topk_exact', 'ivf_assign', 'ivf_topk',
           'kmeans_train', 'embedding_neardup_pairs']


def cosine_sim_expr(a, b):
    """cos(a,b) as a Column expression over two array<float/double> columns."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast('double')),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast('double')))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast('double')))
    return dot / (na * nb)


def cosine_topk_exact(vectors: DataFrame, queries: DataFrame, k: int,
                      id_col: str = 'vec_id', vec_col: str = 'embedding',
                      q_id: str = 'query_id', q_vec: str = 'q_embedding') -> DataFrame:
    """For each query vector: top-k most-cosine-similar vectors.
    broadcast(queries) x vectors; excludes self-matches on equal ids.
    Output: (query_id, neighbor_id, cos_sim, rank)."""
    cand = (vectors
            .crossJoin(F.broadcast(queries.select(q_id, q_vec)))
            .filter(F.col(id_col) != F.col(q_id))
            .withColumn('cos_sim', cosine_sim_expr(F.col(vec_col), F.col(q_vec)))
            .select(F.col(q_id).alias('query_id'),
                    F.col(id_col).alias('neighbor_id'), 'cos_sim'))
    w = Window.partitionBy('query_id').orderBy(F.col('cos_sim').desc(),
                                               F.col('neighbor_id').asc())
    return cand.withColumn('rank', F.row_number().over(w)).filter(F.col('rank') <= k)


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = 'vec_id', vec_col: str = 'embedding',
               c_id: str = 'centroid_id', c_vec: str = 'c_embedding') -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine). One
    broadcast join + window; the result is the inverted file, typically
    written out bucketed by centroid_id."""
    scored = (vectors
              .crossJoin(F.broadcast(centroids.select(c_id, c_vec)))
              .withColumn('cos_sim', cosine_sim_expr(F.col(vec_col), F.col(c_vec))))
    w = Window.partitionBy(id_col).orderBy(F.col('cos_sim').desc(), F.col(c_id).asc())
    return (scored.withColumn('r', F.row_number().over(w)).filter(F.col('r') == 1)
            .select(id_col, vec_col, c_id))


def kmeans_train(vectors: DataFrame, k: int, n_iter: int = 2,
                 id_col: str = 'vec_id', vec_col: str = 'embedding') -> DataFrame:
    """Lloyd k-means with cosine assignment (IVF centroid training).

    Deterministic init: the k lowest-id vectors. Each iteration: broadcast
    assign (ivf_assign) -> positional explode -> per-(centroid, position)
    mean -> rebuilt centroid arrays; empty clusters keep their previous
    centroid via a left join against the previous round's table.

    The centroid table stays a DataFrame for the whole loop — no
    per-iteration driver collect — so k can grow to ANN-realistic
    10^4-10^5 without serializing Lloyd rounds through the driver.
    ``localCheckpoint`` truncates the lineage each round (the plan would
    otherwise double per iteration); a cluster deployment that needs
    executor-loss resilience points ``spark.sparkContext.setCheckpointDir``
    at durable storage and swaps in ``checkpoint()``.
    Returns (centroid_id, c_embedding)."""
    # constant partition key: the k init rows already sit in one partition
    # after limit(k); this just silences the global-window warning
    w_init = Window.partitionBy(F.lit(0)).orderBy(F.col(id_col).asc())
    cents = (vectors.orderBy(id_col).limit(k)
             .select((F.row_number().over(w_init) - 1).cast('int')
                     .alias('centroid_id'),
                     F.transform(vec_col, lambda x: x.cast('double'))
                     .alias('c_embedding'))
             .localCheckpoint(eager=True))

    for _ in range(n_iter):
        inv = ivf_assign(vectors, cents, id_col, vec_col)
        means = (inv.select('centroid_id',
                            F.posexplode(vec_col).alias('pos', 'v'))
                 .groupBy('centroid_id', 'pos')
                 .agg(F.avg(F.col('v').cast('double')).alias('m')))
        new = (means.groupBy('centroid_id')
               .agg(F.array_sort(F.collect_list(F.struct('pos', 'm'))).alias('s'))
               .select('centroid_id',
                       F.transform('s', lambda x: x.getField('m')).alias('new_emb')))
        cents = (cents.join(new, 'centroid_id', 'left')
                 .select('centroid_id',
                         F.coalesce('new_emb', 'c_embedding').alias('c_embedding'))
                 .localCheckpoint(eager=True))
    return cents


def embedding_neardup_pairs(vectors: DataFrame, centroids: DataFrame,
                            threshold: float, n_assign: int = 2,
                            id_col: str = 'vec_id', vec_col: str = 'embedding',
                            c_id: str = 'centroid_id',
                            c_vec: str = 'c_embedding') -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed (the LLM-pipeline
    dedup missing from the minhash/simhash family: near-dups in embedding
    space rather than token space).

    Scale shape: each vector is multi-assigned to its ``n_assign`` nearest
    centroid buckets (broadcast centroids, one shuffle on the bucket key),
    then candidate pairs come from a within-bucket equi-self-join — never
    an all-pairs cross join. Exact cosine filters candidates at
    ``threshold``; pairs co-bucketed more than once collapse via groupBy.
    Multi-assignment is the recall lever (a pair is found iff the two
    vectors share at least one of their n_assign buckets); at 100 TB you
    raise the centroid count to keep buckets bounded and this stays a
    bucket-local quadratic, exactly like the reference LSH pipelines.

    Output: (doc_a, doc_b) with doc_a < doc_b."""
    scored = (vectors
              .crossJoin(F.broadcast(centroids.select(c_id, c_vec)))
              .withColumn('c_sim', cosine_sim_expr(F.col(vec_col), F.col(c_vec))))
    w = Window.partitionBy(id_col).orderBy(F.col('c_sim').desc(), F.col(c_id).asc())
    assign = (scored.withColumn('r', F.row_number().over(w))
              .filter(F.col('r') <= n_assign).select(id_col, vec_col, c_id))
    a = assign.select(F.col(id_col).alias('doc_a'),
                      F.col(vec_col).alias('vec_a'), c_id)
    b = assign.select(F.col(id_col).alias('doc_b'),
                      F.col(vec_col).alias('vec_b'), c_id)
    return (a.join(b, c_id)
            .filter(F.col('doc_a') < F.col('doc_b'))
            .withColumn('cos_sim', cosine_sim_expr(F.col('vec_a'), F.col('vec_b')))
            .filter(F.col('cos_sim') >= threshold)
            .groupBy('doc_a', 'doc_b')
            .agg(F.max('cos_sim').alias('cos_sim')))


def ivf_topk(inverted: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int, n_probe: int = 2,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             c_id: str = 'centroid_id', c_vec: str = 'c_embedding',
             q_id: str = 'query_id', q_vec: str = 'q_embedding') -> DataFrame:
    """ANN top-k: probe the n_probe nearest centroid buckets per query,
    exact cosine within the probed buckets. Recall < 1 by design; the
    exact baseline is cosine_topk_exact."""
    q_probe = (queries
               .crossJoin(F.broadcast(centroids.select(c_id, c_vec)))
               .withColumn('c_sim', cosine_sim_expr(F.col(q_vec), F.col(c_vec))))
    w = Window.partitionBy(q_id).orderBy(F.col('c_sim').desc(), F.col(c_id).asc())
    q_probe = (q_probe.withColumn('r', F.row_number().over(w))
               .filter(F.col('r') <= n_probe)
               .select(q_id, q_vec, c_id))

    cand = (inverted.join(q_probe, c_id)
            .filter(F.col(id_col) != F.col(q_id))
            .withColumn('cos_sim', cosine_sim_expr(F.col(vec_col), F.col(q_vec)))
            .select(F.col(q_id).alias('query_id'),
                    F.col(id_col).alias('neighbor_id'), 'cos_sim'))
    w2 = Window.partitionBy('query_id').orderBy(F.col('cos_sim').desc(),
                                                F.col('neighbor_id').asc())
    return cand.withColumn('rank', F.row_number().over(w2)).filter(F.col('rank') <= k)
