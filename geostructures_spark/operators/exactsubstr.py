"""ExactSubstr-style duplicated-span removal (Lee et al. 2022).

"Deduplicating Training Data Makes Language Models Better" removes long
token substrings that occur more than once in the corpus. The exact
method is a monolithic suffix array — inherently single-machine; the
distributed re-expression here is the standard WINDOW-HASH form: a
token position is duplicated-coverage when some ``L``-token window
containing it occurs >= 2 times corpus-wide, and maximal runs of
covered positions form the removable spans. Every true shared substring
of length >= L is found (all its L-windows repeat); windows that repeat
with DIFFERENT partners can stitch two shorter matches into one span —
the documented over-approximation every hash-based variant (including
the paper's released alternative modes) accepts.

All occurrences of a duplicated window are removed (the paper's
default), unlike c4.span_dedup which keeps a winner — both policies are
published; the pair covers both.

Scale shape (10^12 docs):

- window hashes are generated JVM-side (transform/sequence/md5 inside
  whole-stage codegen) — the gram strings never materialize;
- the duplicate-count shuffle carries (md5, doc_id, position) only;
- the dup-hash set joins back as a plain hash join on the 32-char key
  (AQE broadcasts it when boilerplate is light); salting is NOT needed
  because the build side is pre-aggregated to distinct hashes;
- span assembly + text reassembly shuffle each doc's positions once —
  inherent, the output is per-document text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from geostructures_spark.operators.bpe import words_expr

__all__ = ['window_hashes_expr', 'exactsubstr_spans']


def window_hashes_expr(toks: Column, L: int) -> Column:
    """array<string>: md5 of each L-token window of a token array.

    Fewer than L tokens -> empty array (the sequence(0, negative) guard,
    same as corpus.ngram_md5_expr).
    """
    k = F.size(toks) - F.lit(L)
    grams = F.transform(
        F.sequence(F.lit(0), k),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, L), ' ')))
    return F.when(k >= 0, grams).otherwise(F.array().cast('array<string>'))


def exactsubstr_spans(docs: DataFrame, L: int = 8, min_dup: int = 2,
                      id_col: str = 'doc_id', text_col: str = 'text',
                      max_chars: int = 150) -> DataFrame:
    """Find + strip duplicated token spans; one row per input document.

    Tokenization is the engine-wide words_expr normalization. Returns
    (id_col, n_tokens, n_dup_tokens, n_spans, spans_str, kept_text):
    spans_str lists the maximal covered [start-end] token ranges
    (0-based inclusive) in order, kept_text joins surviving tokens with
    a single space.
    """
    toks_arr = F.filter(words_expr(F.col(text_col), max_chars),
                        lambda w: w != '')
    base = docs.select(id_col, toks_arr.alias('_t'))

    wins = (base.select(id_col,
                        F.posexplode(window_hashes_expr(F.col('_t'), L))
                        .alias('i', 'h')))
    dup = (wins.groupBy('h').agg(F.count('*').alias('c'))
           .where(F.col('c') >= min_dup).select('h'))
    covered = (wins.join(dup, 'h')
               .select(id_col,
                       F.explode(F.sequence('i', F.col('i') + F.lit(L - 1)))
                       .alias('j'))
               .distinct())

    # maximal runs of covered positions: island id = j - dense position
    w = Window.partitionBy(id_col).orderBy('j')
    isl = covered.withColumn('isl', F.col('j') - F.row_number().over(w))
    spans = (isl.groupBy(id_col, 'isl')
             .agg(F.min('j').alias('s'), F.max('j').alias('e'))
             .groupBy(id_col)
             .agg(F.count('*').cast('long').alias('n_spans'),
                  (F.sum(F.col('e') - F.col('s') + 1)).cast('long')
                  .alias('n_dup_tokens'),
                  F.array_join(
                      F.transform(
                          F.array_sort(F.collect_list(F.struct('s', 'e'))),
                          lambda x: F.concat(x['s'].cast('string'),
                                             F.lit('-'),
                                             x['e'].cast('string'))),
                      ',').alias('spans_str')))

    sents = base.select(id_col, F.posexplode('_t').alias('j', 'tok'))
    kept = sents.join(covered, [id_col, 'j'], 'left_anti')
    agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct('j', 'tok'))),
                        lambda x: x['tok']), ' ').alias('kept_text'))

    totals = base.select(id_col, F.size('_t').cast('long').alias('n_tokens'))
    out = totals.join(spans, id_col, 'left').join(agg, id_col, 'left')
    return out.select(
        id_col, 'n_tokens',
        F.coalesce('n_dup_tokens', F.lit(0)).cast('long')
        .alias('n_dup_tokens'),
        F.coalesce('n_spans', F.lit(0)).cast('long').alias('n_spans'),
        F.coalesce('spans_str', F.lit('')).alias('spans_str'),
        F.coalesce('kept_text', F.lit('')).alias('kept_text'))
