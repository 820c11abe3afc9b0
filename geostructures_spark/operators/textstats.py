"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All pure Column expressions (JVM-side codegen) —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geostructures_spark.operators.dedup import tokens_expr

__all__ = ['with_text_stats', 'with_quality_score', 'lang_id_scores',
           'fingerprint_expr', 'with_fingerprint', 'BPE_TOKEN_PATTERN',
           'with_token_counts', 'SCRUB_PATTERNS', 'with_scrubbed_text',
           'tfidf_top_terms']

# GPT-2-style pretokenizer reduced to lookahead-free alternatives so the
# same pattern runs identically under Java regex (Spark) and RE2 (DuckDB):
# a token is an optionally-space-prefixed letter run, digit run, or
# punctuation run, else a whitespace run. Leftmost-first (Java) and
# leftmost-longest (RE2) agree here because the alternatives are disjoint
# by first character class.
BPE_TOKEN_PATTERN = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"

# tiny per-language stopword marker lists for the n-gram/stopword heuristic
LANG_MARKERS = {
    'en': ['the', 'and', 'of'],
    'de': ['der', 'und', 'die'],
    'fr': ['le', 'et', 'les'],
    'es': ['el', 'los', 'de'],
    'pt': ['o', 'os', 'de'],
    'zh': ['的', '是', '在'],
}


def with_text_stats(docs: DataFrame, text_col: str = 'text') -> DataFrame:
    """Adds n_tokens, n_chars_calc, avg_token_len, punct_ratio,
    stopword_ratio ('the/a/of/and/in' as the English stopword probe)."""
    toks = tokens_expr(F.col(text_col))
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r'[^\w\s]', ''))
    stop = F.size(F.filter(toks, lambda t: t.isin('the', 'a', 'of', 'and', 'in')))
    return (docs
            .withColumn('n_tokens', n_tokens)
            .withColumn('n_chars_calc', n_chars)
            .withColumn('avg_token_len',
                        (n_chars - (n_tokens - 1)) / n_tokens)
            .withColumn('punct_ratio', n_punct / F.greatest(n_chars, F.lit(1)))
            .withColumn('stopword_ratio', stop / F.greatest(n_tokens, F.lit(1))))


def with_token_counts(docs: DataFrame, text_col: str = 'text') -> DataFrame:
    """Token counting for training-data budgeting: whitespace tokens
    (n_ws_tokens) and BPE-ish pretokenizer tokens (n_bpe_tokens, whitespace
    runs excluded) plus chars-per-token. Pure JVM-side expressions — the
    regex runs inside whole-stage codegen, no Python."""
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_PATTERN), 0)
    n_bpe = F.size(F.filter(pieces, lambda p: p.rlike(r'\S')))
    n_ws = F.size(tokens_expr(F.col(text_col)))
    return (docs
            .withColumn('n_ws_tokens', n_ws)
            .withColumn('n_bpe_tokens', n_bpe)
            .withColumn('chars_per_token',
                        F.length(F.col(text_col)) / F.greatest(n_bpe, F.lit(1))))


# PII/noise scrubbing for webtext training corpora. Patterns are ordered
# (URLs first so emails/IPs inside them are not double-counted) and
# lookahead/backref-free so Java regex (Spark) and RE2 (DuckDB) agree.
SCRUB_PATTERNS = [
    ('url', r"https?://[^\s]+", '<URL>'),
    ('email', r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", '<EMAIL>'),
    ('ip', r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", '<IP>'),
    ('longnum', r"\d{6,}", '<NUM>'),
]


def with_scrubbed_text(docs: DataFrame, text_col: str = 'text',
                       out_col: str = 'scrubbed') -> DataFrame:
    """Masks URLs, emails, IPv4s, and long digit runs with placeholder
    tokens, adding an ``n_<category>`` count per pattern (counted on the
    progressively-scrubbed text, so a match inside an earlier category is
    not double-counted). Pure JVM regexp expressions — whole-stage codegen,
    no Python."""
    cur = F.col(text_col)
    d = docs
    for name, pat, repl in SCRUB_PATTERNS:
        d = d.withColumn(f'n_{name}', F.regexp_count(cur, F.lit(pat)))
        cur = F.regexp_replace(cur, pat, repl)
    return d.withColumn(out_col, cur)


def with_quality_score(docs: DataFrame, text_col: str = 'text') -> DataFrame:
    """Composite quality score in [0,1]: length band + stopword presence -
    punctuation excess. Deterministic column math (a Gopher-style rule set
    reduced to the available signals)."""
    d = with_text_stats(docs, text_col)
    len_ok = F.when((F.col('n_tokens') >= 5) & (F.col('n_tokens') <= 100000), 0.4).otherwise(0.0)
    stop_ok = F.when(F.col('stopword_ratio') > 0.01, 0.3).otherwise(0.0)
    punct_ok = F.when(F.col('punct_ratio') < 0.2, 0.3).otherwise(0.0)
    return d.withColumn('quality_score', len_ok + stop_ok + punct_ok)


def lang_id_scores(docs: DataFrame, text_col: str = 'text',
                   id_col: str = 'doc_id') -> DataFrame:
    """Marker-token language scores: for each language, the count of its
    marker tokens in the doc; predicted language = argmax (ties -> lexical
    order). A deterministic n-gram-heuristic language ID."""
    toks = tokens_expr(F.col(text_col))
    out = docs.select(id_col, text_col)
    for lang, markers in LANG_MARKERS.items():
        cnt = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        out = out.withColumn(f'score_{lang}', cnt)
    score_struct = F.array(*[
        F.struct(F.col(f'score_{lang}').alias('s'), F.lit(lang).alias('l'))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.array_max(score_struct)
    return out.withColumn('pred_lang', best.getField('l')) \
              .withColumn('pred_score', best.getField('s'))


def fingerprint_expr(text_col, window: int = 8):
    """Document fingerprint: md5 of the lexicographically-min window-gram
    (a winnowing-style rolling fingerprint reduced to one representative
    gram; deterministic and portable). Prefer with_fingerprint — the
    single-expression form re-splits the text per shingle element inside
    the HOF lambda (see dedup.shingles_from_tokens)."""
    from geostructures_spark.operators.dedup import shingles_expr
    grams = shingles_expr(text_col, window)
    return F.md5(F.array_min(grams))


def with_fingerprint(docs: DataFrame, text_col: str = 'text',
                     window: int = 8, out_col: str = 'fingerprint') -> DataFrame:
    """fingerprint_expr with the token array materialized in its own
    projection (the multi-reference alias blocks projection collapse, so
    the text splits once per row, not once per shingle)."""
    from geostructures_spark.operators.dedup import shingles_from_tokens
    base = docs.withColumn('_tk', tokens_expr(F.col(text_col)))
    return (base.withColumn(
        out_col, F.md5(F.array_min(shingles_from_tokens(F.col('_tk'), window))))
        .drop('_tk'))


def tfidf_top_terms(docs: DataFrame, k: int = 3, id_col: str = 'doc_id',
                    text_col: str = 'text', max_chars: int = 150) -> DataFrame:
    """Per-document top-k terms by tf-idf (keyword extraction).

    The corpus-analytics twin of bm25.bm25_topk (which ranks DOCUMENTS
    for a query; this ranks TERMS for a document — labeling, corpus
    drift dashboards, domain clustering features). idf = ln(N / df)
    with no smoothing: a term present in every document scores exactly
    0 — informative, since such a term can never characterize one doc.

    Scale shape: tf is one map-side-combined groupBy over the exploded
    tokens; df is a second over (term, doc) distinct pairs; the
    (doc, term) <- (term, df) join keys on the term — both sides hash-
    partition, no fan-out. Ranking uses the 6dp-ROUNDED score with a
    term tie-break (same cross-engine determinism rule as bm25).

    Returns (id_col, term, score, rank), rank 1..k by
    (score DESC, term ASC).
    """
    from pyspark.sql import Window

    from geostructures_spark.operators.bpe import words_expr

    toks = docs.select(
        id_col,
        F.explode(words_expr(F.col(text_col), max_chars)).alias('term')
    ).where(F.col('term') != '')
    tf = toks.groupBy(id_col, 'term').agg(F.count('*').alias('tf'))
    df_t = (tf.groupBy('term')
            .agg(F.count('*').cast('double').alias('df')))
    n_docs = docs.select(F.count('*').cast('double').alias('n_docs'))
    idf = (df_t.crossJoin(F.broadcast(n_docs))
           .select('term', F.log(F.col('n_docs') / F.col('df')).alias('idf')))
    scored = (tf.join(idf, 'term')
              .select(id_col, 'term',
                      F.round(F.col('tf') * F.col('idf'), 6).alias('score')))
    w = Window.partitionBy(id_col).orderBy(F.col('score').desc(),
                                           F.col('term').asc())
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))
