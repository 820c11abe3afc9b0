"""Similarity search over embedding columns (array<float|double>).

- ``cosine_topk_exact``: brute-force cosine top-k — the correctness
  baseline. GEMM kernel with batch-local partial top-k: each Arrow batch
  computes X @ Q.T against the broadcast query matrix and emits only its
  own top-(k+1) rows per query, so the final per-query window ranks
  (batches x (k+1)) candidates instead of the full corpus.
- ``ivf_assign`` / ``ivf_topk``: IVF-style scale path — inverted file
  over a centroid table: vectors are bucketed to their nearest centroid
  once (one NumPy GEMM per Arrow batch against the broadcast centroid
  matrix, no row expansion, no shuffle), queries probe ``n_probe``
  nearest centroid buckets only.
- ``kmeans_train``: Lloyd training for the centroid table.
- ``embedding_neardup_pairs``: IVF-bucketed near-duplicate pairs with a
  ``max_bucket`` cap + observable drop metrics (same hardening as
  dedup.minhash_lsh_pairs).

Why GEMM and not Column expressions: Catalyst interprets higher-order-
function lambdas (F.aggregate / F.zip_with) per ELEMENT, so a d-dim
cosine is d interpreted ops per pair — at 768-d embeddings x 10^4
centroids that interpreted loop dominates the job (the same failure mode
dedup.simhash_expr documents and fixed the same way). One float64
``X @ C.T`` per Arrow batch is a single BLAS call; the centroid matrix
ships to executors exactly once as a broadcast variable — the identical
k x d floats the broadcast-hash-join it replaces would have shipped —
and the argmax/top-n_assign comes out of the kernel directly, so the
old k-times row expansion and the Window-on-vec_id shuffle disappear
entirely. ``ivf_assign_hof`` keeps the old expression form for A/B
benchmarking.

Tie-breaks match the SQL oracles: centroids are sorted by id before the
matrix is built, so ``argmax`` / stable ``argsort`` resolve equal
similarities to the lowest centroid id (= ROW_NUMBER ... ORDER BY cos
DESC, id ASC).

Multimodal note (task brief): image/audio/video decode plumbing lives in
operators/multimodal.py with the same pattern — binary column + typed
metadata + batch UDF; the decode kernel itself is stubbed in this
environment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ['ann_recall', 'cosine_sim_expr', 'cosine_pairs_col',
           'cosine_topk_exact', 'ivf_assign', 'ivf_assign_hof', 'ivf_topk',
           'kmeans_train', 'embedding_neardup_pairs']


def cosine_sim_expr(a, b):
    """cos(a,b) as a pure Column expression over two array columns.

    Reference form only: Catalyst interprets the HOF lambdas per element,
    so this is O(dim) interpreted ops per row — use ``cosine_pairs_col``
    (one NumPy call per Arrow batch) in any hot path."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: (x * y).cast('double')),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast('double')))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + (v * v).cast('double')))
    return dot / (na * nb)


def _stack(series: pd.Series) -> np.ndarray:
    """Arrow list column -> (n, dim) float64 matrix."""
    return np.asarray(series.tolist(), dtype=np.float64)


def cosine_pairs_col(a, b):
    """Pairwise cos(a,b) as a vectorized Arrow column (double).

    One einsum + two norms per batch — the fast path for cosine between
    two embedding COLUMNS (candidate verification), where no fixed matrix
    can be broadcast."""
    @F.pandas_udf('double')
    def _cos(xa: pd.Series, xb: pd.Series) -> pd.Series:
        if len(xa) == 0:
            return pd.Series(np.zeros(0))
        A, B = _stack(xa), _stack(xb)
        num = np.einsum('ij,ij->i', A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(invalid='ignore', divide='ignore'):
            return pd.Series(num / den)
    return _cos(a, b)


def _centroid_broadcast(centroids: DataFrame, c_id: str, c_vec: str):
    """(ids[int64] sorted asc, row-normalized float64 matrix) broadcast.

    The collect here ships exactly the k x d floats the broadcast-hash
    join it replaces would have collected to build its broadcast
    relation; the rows never re-enter a Spark plan."""
    rows = centroids.select(c_id, c_vec).collect()
    rows.sort(key=lambda r: r[0])
    ids = np.asarray([r[0] for r in rows], dtype=np.int64)
    C = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    norms = np.linalg.norm(C, axis=1)
    norms[norms == 0.0] = 1.0  # zero centroid -> sims 0, never wins a tie
    Cn = C / norms[:, None]
    return centroids.sparkSession.sparkContext.broadcast((ids, Cn))


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = 'vec_id', vec_col: str = 'embedding',
               c_id: str = 'centroid_id', c_vec: str = 'c_embedding',
               n_assign: int = 1) -> DataFrame:
    """Assign each vector to its ``n_assign`` nearest centroids (max
    cosine, ties to lowest centroid id).

    Plan shape: a single mapInPandas stage — one float64 GEMM per Arrow
    batch against the broadcast normalized-centroid matrix; the row norm
    is constant per row so argmax over ``X @ Cn.T`` IS argmax cosine. No
    crossJoin row expansion, no Window shuffle; the output keeps the
    input partitioning. The result is the inverted file, typically
    written out bucketed by centroid_id."""
    bc = _centroid_broadcast(centroids, c_id, c_vec)
    in_schema = vectors.select(id_col, vec_col).schema
    schema = T.StructType(list(in_schema.fields) +
                          [T.StructField(c_id, T.LongType())])

    def gen(batches):
        ids, Cn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            sims = _stack(pdf[vec_col]) @ Cn.T
            if n_assign == 1:
                sel = np.argmax(sims, axis=1)[:, None]
            else:
                # stable sort on -sims: equal sims keep ascending id order
                sel = np.argsort(-sims, axis=1, kind='stable')[:, :n_assign]
            n, m = sel.shape
            rep = np.repeat(np.arange(n), m)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy()[rep],
                vec_col: pdf[vec_col].to_numpy()[rep],
                c_id: ids[sel.ravel()],
            })

    return vectors.select(id_col, vec_col).mapInPandas(gen, schema)


def ivf_assign_hof(vectors: DataFrame, centroids: DataFrame,
                   id_col: str = 'vec_id', vec_col: str = 'embedding',
                   c_id: str = 'centroid_id', c_vec: str = 'c_embedding') -> DataFrame:
    """The pre-GEMM expression form of ``ivf_assign`` (broadcast crossJoin
    + interpreted HOF cosine + Window on vec_id). Kept ONLY as the A/B
    baseline for the bench stress row — O(dim) interpreted ops per
    (vector, centroid) pair plus a k-times row expansion."""
    scored = (vectors
              .crossJoin(F.broadcast(centroids.select(c_id, c_vec)))
              .withColumn('cos_sim', cosine_sim_expr(F.col(vec_col), F.col(c_vec))))
    w = Window.partitionBy(id_col).orderBy(F.col('cos_sim').desc(), F.col(c_id).asc())
    return (scored.withColumn('r', F.row_number().over(w)).filter(F.col('r') == 1)
            .select(id_col, vec_col, c_id))


def cosine_topk_exact(vectors: DataFrame, queries: DataFrame, k: int,
                      id_col: str = 'vec_id', vec_col: str = 'embedding',
                      q_id: str = 'query_id', q_vec: str = 'q_embedding') -> DataFrame:
    """For each query vector: top-k most-cosine-similar vectors (exact).

    GEMM + batch-local partial top-k: every Arrow batch computes
    ``Xn @ Qn.T`` against the broadcast normalized-query matrix and emits
    only its own top-(k+1) rows per query (k+1 so a self-match never
    displaces a real candidate; batch-local ties resolved by neighbor id
    via lexsort, matching the global tie-break). The global top-k of a
    union of per-batch top-(k+1) sets is exact, so the final window ranks
    O(n_batches x (k+1)) rows per query instead of the whole corpus.
    Excludes self-matches on equal ids.
    Output: (query_id, neighbor_id, cos_sim, rank)."""
    bc = _centroid_broadcast(queries, q_id, q_vec)
    id_type = vectors.schema[id_col].dataType
    schema = T.StructType([
        T.StructField(q_id, T.LongType()),
        T.StructField('neighbor_id', id_type),
        T.StructField('cos_sim', T.DoubleType()),
    ])

    def gen(batches):
        q_ids, Qn = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _stack(pdf[vec_col])
            nx = np.linalg.norm(X, axis=1)
            nx[nx == 0.0] = 1.0
            sims = (X / nx[:, None]) @ Qn.T          # true cosine
            ids = pdf[id_col].to_numpy()
            take = min(k + 1, len(pdf))
            out_q, out_n, out_s = [], [], []
            for j in range(Qn.shape[0]):
                col = sims[:, j]
                if take < len(pdf):
                    # argpartition is NOT tie-stable at the boundary: a
                    # candidate whose cosine equals the cut value can be
                    # dropped in favor of a higher id, breaking the
                    # exact-union argument (caught live by the PQ ADC
                    # oracle — same kernel shape). Include every
                    # boundary tie, then cut by the true order.
                    part = np.argpartition(-col, take - 1)[:take]
                    cand = np.flatnonzero(col >= col[part].min())
                else:
                    cand = np.arange(len(pdf))
                # exact batch-local order: cos desc, neighbor id asc
                order = cand[np.lexsort((ids[cand], -col[cand]))][:take]
                out_q.append(np.full(len(order), q_ids[j]))
                out_n.append(ids[order])
                out_s.append(col[order])
            yield pd.DataFrame({
                q_id: np.concatenate(out_q),
                'neighbor_id': np.concatenate(out_n),
                'cos_sim': np.concatenate(out_s),
            })

    cand = (vectors.select(id_col, vec_col).mapInPandas(gen, schema)
            .filter(F.col('neighbor_id') != F.col(q_id))
            .withColumnRenamed(q_id, 'query_id'))
    w = Window.partitionBy('query_id').orderBy(F.col('cos_sim').desc(),
                                               F.col('neighbor_id').asc())
    return cand.withColumn('rank', F.row_number().over(w)).filter(F.col('rank') <= k)


def kmeans_train(vectors: DataFrame, k: int, n_iter: int = 2,
                 id_col: str = 'vec_id', vec_col: str = 'embedding') -> DataFrame:
    """Lloyd k-means with cosine assignment (IVF centroid training).

    Deterministic init: the k lowest-id vectors. Each iteration: GEMM
    assign (ivf_assign) -> positional explode -> per-(centroid, position)
    mean -> rebuilt centroid arrays; empty clusters keep their previous
    centroid via a left join against the previous round's table.

    The centroid table stays a checkpointed DataFrame across rounds
    (``localCheckpoint`` truncates the lineage — the plan would otherwise
    double per iteration); each round's GEMM assign materializes the
    k x d centroid matrix into a broadcast variable, which is the same
    data movement per iteration as the broadcast-hash join it replaced
    (a broadcast join also collects its build side), so k still scales to
    ANN-realistic 10^4-10^5 — at k=10^5, d=768 the float64 matrix is
    ~600 MB; switch executors to that budget or drop the kernel to
    float32 when similarity parity with a float64 oracle isn't needed.
    A cluster deployment that needs executor-loss resilience points
    ``spark.sparkContext.setCheckpointDir`` at durable storage and swaps
    in ``checkpoint()``.
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
               .select(F.col('centroid_id').cast('int').alias('centroid_id'),
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
                            c_vec: str = 'c_embedding',
                            max_bucket: int = 8192,
                            observation=None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, IVF-bucketed (the LLM-pipeline
    dedup missing from the minhash/simhash family: near-dups in embedding
    space rather than token space).

    Scale shape: each vector is multi-assigned to its ``n_assign`` nearest
    centroid buckets (one GEMM per Arrow batch, see ivf_assign), then
    candidate pairs come from a within-bucket equi-self-join — never an
    all-pairs cross join. Exact cosine (vectorized Arrow pairs kernel)
    filters candidates at ``threshold``; pairs co-bucketed more than once
    collapse via groupBy. Multi-assignment is the recall lever (a pair is
    found iff the two vectors share at least one of their n_assign
    buckets); at 100 TB you raise the centroid count to keep buckets
    bounded and this stays a bucket-local quadratic, exactly like the
    reference LSH pipelines.

    The within-bucket join is quadratic in bucket size, so buckets whose
    assignment count exceeds ``max_bucket`` are DROPPED — a skewed
    centroid (near-duplicate-heavy corpus, undertrained k-means) would
    otherwise go quadratic on one executor. The drop is observable, not
    silent: the bucket-size stage carries observed metrics
    (dropped_buckets / dropped_docs / max_bucket_size) named
    ``embedding_neardup_buckets`` — pass a ``pyspark.sql.Observation`` as
    ``observation`` to read them after an action. ``max_bucket=None``
    disables the cap (and, as in minhash_lsh_pairs, refuses a dangling
    ``observation``). The escape hatch for real drops is raising the
    centroid count k (smaller buckets), not raising the cap.

    Same AQE caveat as minhash_lsh_pairs: a COMPLETELY empty final result
    lets AQE's empty-relation propagation erase the metrics node before
    it executes, so Observation.get would hang/raise — audit all-dropped
    runs with AQE off.

    Output: (doc_a, doc_b, cos_sim) with doc_a < doc_b."""
    if observation is not None and max_bucket is None:
        raise ValueError('observation given but max_bucket is None — '
                         'no metrics would ever be attached')
    assign = ivf_assign(vectors, centroids, id_col, vec_col, c_id, c_vec,
                        n_assign=n_assign)
    # The assignment feeds THREE consumers (the bucket-size scan and both
    # sides of the self-join); without a materialization point Spark
    # re-runs the GEMM mapInPandas stage once per consumer (4 MapInPandas
    # nodes in the executed plan, since the capped size-scan rides into
    # both join branches). A lazy localCheckpoint computes it exactly once.
    # On a production cluster the equivalent (and executor-loss-safe) move
    # is writing the inverted file out bucketed by centroid_id and reading
    # it back — see ivf_assign's docstring.
    assign = assign.localCheckpoint(eager=False)
    if max_bucket is not None:
        sizes = assign.groupBy(c_id).agg(F.count('*').alias('bsz'))
        over = F.col('bsz') > max_bucket
        metrics = [
            F.sum(F.when(over, 1).otherwise(0)).alias('dropped_buckets'),
            F.sum(F.when(over, F.col('bsz')).otherwise(0)).alias('dropped_docs'),
            F.max('bsz').alias('max_bucket_size'),
        ]
        if observation is None:
            import uuid
            sizes = sizes.observe(
                f'embedding_neardup_buckets_{uuid.uuid4().hex[:8]}', *metrics)
        else:
            sizes = sizes.observe(observation, *metrics)
        kept = sizes.filter(~over).select(c_id)
        assign = assign.join(F.broadcast(kept), c_id)
    a = assign.select(F.col(id_col).alias('doc_a'),
                      F.col(vec_col).alias('vec_a'), c_id)
    b = assign.select(F.col(id_col).alias('doc_b'),
                      F.col(vec_col).alias('vec_b'), c_id)
    # cos_sim is referenced exactly ONCE (by the aggregate): a pre-groupBy
    # threshold filter would add a second reference and Catalyst then
    # evaluates the Arrow UDF twice (two ArrowEvalPython nodes — observed).
    # Thresholding after the max-agg is value-identical (a pair's cosine is
    # the same in every bucket it co-occurs in, so max == the value) and
    # the partial_max map-side combine collapses duplicate co-bucketed
    # pairs before the shuffle, which carries only (doc_a, doc_b, cos).
    return (a.join(b, c_id)
            .filter(F.col('doc_a') < F.col('doc_b'))
            .select('doc_a', 'doc_b',
                    cosine_pairs_col(F.col('vec_a'), F.col('vec_b'))
                    .alias('cos_sim'))
            .groupBy('doc_a', 'doc_b')
            .agg(F.max('cos_sim').alias('cos_sim'))
            .filter(F.col('cos_sim') >= threshold))


def ivf_topk(inverted: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int, n_probe: int = 2,
             id_col: str = 'vec_id', vec_col: str = 'embedding',
             c_id: str = 'centroid_id', c_vec: str = 'c_embedding',
             q_id: str = 'query_id', q_vec: str = 'q_embedding') -> DataFrame:
    """ANN top-k: probe the n_probe nearest centroid buckets per query
    (GEMM assign on the query side), exact cosine within the probed
    buckets (vectorized Arrow pairs kernel). Recall < 1 by design; the
    exact baseline is cosine_topk_exact."""
    q_probe = ivf_assign(queries, centroids, id_col=q_id, vec_col=q_vec,
                         c_id=c_id, c_vec=c_vec, n_assign=n_probe)

    cand = (inverted.join(q_probe, c_id)
            .filter(F.col(id_col) != F.col(q_id))
            .withColumn('cos_sim', cosine_pairs_col(F.col(vec_col), F.col(q_vec)))
            .select(F.col(q_id).alias('query_id'),
                    F.col(id_col).alias('neighbor_id'), 'cos_sim'))
    w2 = Window.partitionBy('query_id').orderBy(F.col('cos_sim').desc(),
                                                F.col('neighbor_id').asc())
    return cand.withColumn('rank', F.row_number().over(w2)).filter(F.col('rank') <= k)


def ann_recall(approx: DataFrame, exact: DataFrame, k: int,
               q_id: str = 'query_id',
               n_id: str = 'neighbor_id') -> DataFrame:
    """Per-query recall@k of an approximate top-k against the exact one
    — the standard ANN quality gate (what "n_probe=2 reaches 0.95
    recall" means), run as a composition over any two (query_id,
    neighbor_id, rank) results (ivf_topk vs cosine_topk_exact,
    ivfpq_topk vs pq_adc_topk, ...).

    recall@k = |approx top-k  intersect  exact top-k| / |exact top-k|
    per query (the denominator is the EXACT result's row count, which
    can be < k for tiny corpora). Plan: one left-semi equi-join on
    (query, neighbor) + two bounded groupBys — O(queries x k) rows
    everywhere, independent of corpus size.

    Returns (query_id, n_true, n_hit, recall) with recall rounded to
    6dp.
    """
    e = exact.filter(F.col('rank') <= k).select(q_id, n_id)
    a = approx.filter(F.col('rank') <= k).select(q_id, n_id)
    truth = e.groupBy(q_id).agg(F.count('*').cast('long').alias('n_true'))
    hits = (e.join(a, [q_id, n_id], 'left_semi')
            .groupBy(q_id).agg(F.count('*').cast('long').alias('n_hit')))
    return (truth.join(hits, q_id, 'left')
            .select(q_id,
                    'n_true',
                    F.coalesce('n_hit', F.lit(0)).cast('long').alias('n_hit'),
                    F.round(F.coalesce('n_hit', F.lit(0)).cast('double')
                            / F.col('n_true'), 6).alias('recall')))
