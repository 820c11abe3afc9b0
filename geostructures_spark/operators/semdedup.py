"""SemDeDup-style semantic deduplication (Abbas et al. 2023).

The published recipe: cluster embeddings with k-means, call two
documents semantic duplicates when their cosine similarity inside a
cluster clears a threshold, and keep ONE representative per duplicate
group. This module is the survivor-selection composition of the
engine's verified pieces:

  embedding_neardup_pairs (IVF-bucketed candidate pairs, capped, exact
  cosine)  ->  connected_components (min-label propagation)  ->
  lowest-id winner per component.

The paper keeps the point with the lowest similarity to the centroid;
any deterministic representative serves the dedup goal — the engine
uses the lowest vec_id, the same winner rule as c4.span_dedup, so the
SQL oracle can state it exactly.

Scale shape: inherited — the pair stage is bucket-local and capped
(never all-pairs), component propagation is a checkpointed DataFrame
loop shuffling (node, label) pairs only, and the final survivor join
keys on vec_id. Nothing here adds a new scale hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from geostructures_spark.operators.dedup import connected_components
from geostructures_spark.operators.simsearch import embedding_neardup_pairs

__all__ = ['semantic_dedup']


def semantic_dedup(vectors: DataFrame, centroids: DataFrame,
                   threshold: float, n_assign: int = 2,
                   id_col: str = 'vec_id', vec_col: str = 'embedding',
                   max_bucket: int = 8192, n_partitions: int = 8) -> DataFrame:
    """Assign every vector a duplicate-component id and a keep flag.

    Returns (id_col, component, keep): component is the lowest id
    reachable through the near-duplicate graph (a vector in no pair is
    its own component), keep is True exactly for the component winner —
    filtering on keep yields the SemDeDup-ed corpus.
    """
    pairs = embedding_neardup_pairs(
        vectors, centroids, threshold, n_assign=n_assign,
        id_col=id_col, vec_col=vec_col, max_bucket=max_bucket)
    comp = connected_components(pairs.select('doc_a', 'doc_b'),
                                n_partitions=n_partitions)
    out = (vectors.select(id_col)
           .join(comp.withColumnRenamed('node', id_col), id_col, 'left'))
    return out.select(
        id_col,
        F.coalesce('component', F.col(id_col)).alias('component'),
        (F.coalesce('component', F.col(id_col)) == F.col(id_col))
        .alias('keep'))
