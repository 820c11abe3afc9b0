"""Composite document quality gate (Gopher-style rule battery).

Rae et al. 2021 §A1.1 / C4 (Raffel et al. 2020) keep a web document only
if it passes a battery of cheap signal thresholds. The signals all exist
in this engine (operators/textstats.py, operators/repetition.py); the
gate composes them into a keep/drop decision with an auditable
per-rule failure bitmask — the form a pipeline actually materializes,
because the bitmask is what you aggregate to answer "why are we dropping
20% of source X".

Every signal is an exact ratio of integers (counts / lengths), so rule
comparisons against literal thresholds evaluate identically in Spark and
the DuckDB oracle — the bitmask is value-exact cross-engine.

Scale shape: textstats signals are pure Column exprs stacked at scan
stage; repetition signals ride the zero-shuffle Arrow kernel with the
textstats columns passed through (no re-join on doc_id). The whole gate
is one mapInPandas stage over the scan — nothing shuffles.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ['quality_gate', 'DEFAULT_RULES', 'rule_names']

# (name, signal column, lo, hi) — rule passes iff lo <= signal <= hi.
# Bounds are inclusive; None means unbounded on that side. Bit i of
# fail_mask corresponds to DEFAULT_RULES[i].
DEFAULT_RULES: List[Tuple[str, str, float, float]] = [
    ('n_tokens', 'n_tokens', 10, 100000),
    ('avg_token_len', 'avg_token_len', 2.0, 12.0),
    ('punct_ratio', 'punct_ratio', None, 0.3),
    ('stopword_ratio', 'stopword_ratio', 0.01, None),
    ('dup_word_frac', 'dup_word_frac', None, 0.6),
    ('top2_char_frac', 'top2_char_frac', None, 0.30),
    ('dup5_char_frac', 'dup5_char_frac', None, 0.30),
]


def rule_names() -> List[str]:
    return [r[0] for r in DEFAULT_RULES]


def _fails(col: Column, lo, hi) -> Column:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (col < F.lit(lo))
    if hi is not None:
        cond = cond | (col > F.lit(hi))
    return cond


def quality_gate(docs: DataFrame, id_col: str = 'doc_id',
                 text_col: str = 'text',
                 rules: List[Tuple[str, str, float, float]] = None
                 ) -> DataFrame:
    """(id, every signal, fail_mask, n_failed, keep) per document.
    ``fail_mask`` bit i set == rule i failed; ``keep == (fail_mask ==
    0)``. See module docstring for the zero-shuffle plan shape."""
    from geostructures_spark.operators.repetition import repetition_stats
    from geostructures_spark.operators.textstats import with_text_stats
    rules = DEFAULT_RULES if rules is None else rules
    stats_cols = ['n_tokens', 'avg_token_len', 'punct_ratio',
                  'stopword_ratio']
    staged = with_text_stats(docs, text_col=text_col).select(
        F.col(id_col), F.col(text_col), *stats_cols)
    full = repetition_stats(staged, id_col=id_col, text_col=text_col,
                            passthrough=stats_cols)
    mask = F.lit(0)
    for i, (name, sig, lo, hi) in enumerate(rules):
        mask = mask + F.when(_fails(F.col(sig), lo, hi),
                             F.lit(1 << i)).otherwise(0)
    out = full.withColumn('fail_mask', mask.cast('long'))
    return (out.withColumn('n_failed', F.bit_count('fail_mask'))
            .withColumn('keep', F.col('fail_mask') == 0))
