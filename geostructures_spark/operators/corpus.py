"""Corpus-level text cleaning: duplicate-line removal + eval-set
decontamination.

Two standard web-corpus stages the LLM-pipeline family was missing
(no reference counterpart — geostructures is a geometry library; these
follow the published CCNet / GPT-3-appendix recipes):

- ``remove_duplicate_lines``: CCNet-style boilerplate stripping. A line
  whose normalized (trimmed) form appears >= ``min_dup`` times across the
  WHOLE corpus (cookie banners, nav menus, "subscribe" footers) is removed
  from every document.
- ``flag_contaminated``: GPT-3-style benchmark decontamination. A document
  is flagged when any of its word n-grams appears in the eval-set n-gram
  table.

Both are pure Column-expression pipelines (zero Python in the data path).

Scale (10^12 docs):
- duplicate-line counting shuffles (md5, partial count) pairs only —
  map-side combine collapses each partition to its distinct line hashes;
  the line TEXT itself is never shuffled for counting. The reassembly
  groupBy(doc_id) shuffles kept lines once — inherent, the output is text.
- the dup-line set is usually tiny relative to the corpus (boilerplate is
  heavy-tailed); Spark's AQE broadcasts the anti-join side when it fits,
  otherwise it stays a hash join on the 32-char md5 key.
- decontamination broadcasts the EVAL n-gram hash set (eval suites are
  ~10^5-10^7 n-grams — megabytes), so the exploded document n-grams are
  filtered map-side with NO shuffle; only (doc_id, hit) survivors reach
  the per-doc aggregate. Document n-grams are generated JVM-side with
  transform(sequence(...)) inside whole-stage codegen — never collected,
  never in Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ['remove_duplicate_lines', 'flag_contaminated', 'ngram_md5_expr',
           'ngram_novelty']


def remove_duplicate_lines(docs: DataFrame, text_col: str = 'text',
                           id_col: str = 'doc_id',
                           min_dup: int = 2) -> DataFrame:
    """Remove corpus-frequent lines from every document (CCNet recipe).

    A line is removed when trim(line) is non-empty and its md5 appears
    >= min_dup times corpus-wide. Whitespace-only lines always survive
    (they carry document structure, and counting them would make every
    blank line "boilerplate"). Line order is preserved.

    Returns (id_col, kept_text, n_lines, n_removed) — one row per input
    document; kept_text == '' when every line was boilerplate.
    """
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), '\n')).alias('pos', 'line'),
    ).withColumn('h', F.md5(F.trim('line')))
    nonempty = F.trim('line') != ''

    dup = (lines.where(nonempty)
           .groupBy('h').agg(F.count('*').alias('c'))
           .where(F.col('c') >= min_dup)
           .select('h'))

    kept = lines.join(dup, 'h', 'left_anti')
    reassembled = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct('pos', 'line'))),
                        lambda s: s['line']),
            '\n').alias('kept_text'),
        F.count('*').alias('n_kept'))

    totals = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), '\n')).cast('long').alias('n_lines'))
    out = totals.join(reassembled, id_col, 'left')
    return out.select(
        id_col,
        F.coalesce('kept_text', F.lit('')).alias('kept_text'),
        'n_lines',
        (F.col('n_lines') - F.coalesce(F.col('n_kept'), F.lit(0)))
        .cast('long').alias('n_removed'))


def ngram_md5_expr(text_col: Column, n: int) -> Column:
    """array<string> of md5(word n-gram) for a single-space-tokenized text.

    Pure JVM expression (split/transform/sequence/slice/array_join/md5 all
    codegen) — the n-gram strings exist only transiently inside the
    expression. Texts with fewer than n tokens yield an empty array (the
    guard matters: sequence(0, negative) would generate a DESCENDING range).
    """
    toks = F.split(text_col, ' ')
    k = F.size(toks) - F.lit(n)
    grams = F.transform(
        F.sequence(F.lit(0), k),
        lambda i: F.md5(F.array_join(F.slice(toks, i + 1, n), ' ')))
    return F.when(k >= 0, grams).otherwise(
        F.array().cast('array<string>'))


def flag_contaminated(docs: DataFrame, eval_texts: DataFrame, n: int = 5,
                      id_col: str = 'doc_id', text_col: str = 'text',
                      eval_text_col: str = 'etext') -> DataFrame:
    """Flag documents sharing any word n-gram with an eval set.

    Returns (id_col, n_hits) for contaminated documents only, where
    n_hits counts the DISTINCT eval n-grams found in that document
    (GPT-3 appendix-C style 13-gram check; n is a parameter because
    published pipelines range 8-13 and tests want shorter texts).

    The eval side is deduplicated and explicitly broadcast: the exploded
    document n-grams never shuffle — they die map-side unless they hit.
    """
    evn = (eval_texts
           .select(F.explode(ngram_md5_expr(F.col(eval_text_col), n))
                   .alias('h'))
           .distinct())
    doc_grams = docs.select(
        id_col,
        F.explode(ngram_md5_expr(F.col(text_col), n)).alias('h'))
    hits = doc_grams.join(F.broadcast(evn), 'h', 'inner')
    return (hits.groupBy(id_col)
            .agg(F.count_distinct('h').cast('long').alias('n_hits')))


def ngram_novelty(docs: DataFrame, n: int = 3, id_col: str = 'doc_id',
                  text_col: str = 'text') -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's word
    n-grams that occur nowhere else in the corpus.

    The memorization-risk / boilerplate-pressure metric: near-zero
    novelty marks templated or heavily duplicated text (its n-grams all
    recur elsewhere), near-one marks unique prose. Distinct from the
    Gopher repetition metrics (operators/repetition.py), which are
    WITHIN-document; this is the cross-corpus complement.

    Scale shape: n-grams are generated JVM-side (ngram_md5_expr — the
    gram strings never materialize), the corpus-frequency table is one
    map-side-combined groupBy over the md5s, and the join back keys on
    the 32-char hash. Per-doc DISTINCT n-grams are the unit (a gram
    repeated inside one doc but nowhere else is still novel).

    Returns (id_col, n_grams, n_novel, novelty) with novelty rounded
    to 6 dp; documents shorter than n tokens report 0 grams and NULL
    novelty.
    """
    grams = docs.select(
        id_col,
        F.explode(ngram_md5_expr(F.col(text_col), n)).alias('h')
    ).distinct()
    freq = grams.groupBy('h').agg(F.count('*').alias('ndocs'))
    per_doc = (grams.join(freq, 'h')
               .groupBy(id_col)
               .agg(F.count('*').cast('long').alias('n_grams'),
                    F.sum(F.when(F.col('ndocs') == 1, 1).otherwise(0))
                    .cast('long').alias('n_novel')))
    base = docs.select(id_col)
    out = base.join(per_doc, id_col, 'left')
    return out.select(
        id_col,
        F.coalesce('n_grams', F.lit(0)).alias('n_grams'),
        F.coalesce('n_novel', F.lit(0)).alias('n_novel'),
        F.when(F.col('n_grams') > 0,
               F.round(F.col('n_novel') / F.col('n_grams'), 6))
        .alias('novelty'))
