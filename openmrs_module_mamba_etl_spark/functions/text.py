"""Text-analysis functions for large-scale corpus pipelines.

All JVM-side Column expressions (no Python UDFs): language-ID by stopword
evidence, quality scoring, token counting (whitespace + BPE-ish regex), and
document fingerprinting. Each has an ANSI-SQL-expressible definition so the
DuckDB oracle can verify it value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from openmrs_module_mamba_etl_spark.functions.similarity import (
    bind,
    tokens,
    word_shingles,
)

#: Tiny per-language stopword evidence sets for the n-gram/stopword
#: language-ID heuristic. Deliberately small + disjoint where possible.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "es": ("el", "los", "las", "de", "y", "un", "una", "es", "que", "para"),
    "de": ("der", "die", "das", "und", "ein", "eine", "ist", "dass", "zu", "mit"),
}

#: BPE-ish tokenizer regex: words, single digits, or single punctuation —
#: the shape (not the vocab) of a byte-pair pretokenizer split.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def _in_list(col: Column, values: tuple[str, ...]) -> Column:
    return col.isin(*values)


def _stopword_ratio_of(toks: Column, lang: str) -> Column:
    """stopword ratio over an already-bound token array (see ``bind``)."""
    hits = F.size(F.filter(toks, lambda t: _in_list(t, STOPWORDS[lang])))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    # bind(): tokenize once — the ratio references the token array thrice.
    return bind(tokens(text), lambda toks: _stopword_ratio_of(toks, lang))


def lang_id(text: Column, min_ratio: float = 0.05) -> Column:
    """Pick the language whose stopword evidence is strongest; 'und' if no
    language reaches ``min_ratio``. Ties broken by language-code order so the
    result is deterministic."""
    codes = sorted(STOPWORDS)

    def from_toks(toks: Column) -> Column:
        # bind() twice more: each ratio is an O(tokens) filter referenced
        # from every CASE arm AND from greatest(); `best` is referenced
        # 2× per arm. Unbound, the tokenizer ran ~3 × |codes|² times per
        # row; bound, once, with the folds once per code.
        ratios_arr = F.array(*[_stopword_ratio_of(toks, c) for c in codes])

        def from_ratios(rs: Column) -> Column:
            best = F.greatest(*[rs[i] for i in range(len(codes))])

            def from_best(b: Column) -> Column:
                expr = F.lit("und")
                # Build the CASE from last to first so earlier codes win ties.
                for i, code in reversed(list(enumerate(codes))):
                    expr = F.when(
                        (rs[i] == b) & (b >= min_ratio), code
                    ).otherwise(expr)
                return expr

            return bind(best, from_best)

        return bind(ratios_arr, from_ratios)

    return bind(tokens(text), from_toks)


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pretokens (regexp-extracted, JVM-side)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_count(text: Column) -> Column:
    """Punctuation characters (counted by strip-punct-and-diff so the same
    SQL works verbatim in the DuckDB oracle)."""
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?'\"()\-]", ""))


def _mean_word_length_of(toks: Column) -> Column:
    """mean word length over an already-bound token array (see ``bind``)."""
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def mean_word_length(text: Column) -> Column:
    return bind(tokens(text), _mean_word_length_of)  # tokenize once, not 3×


def quality_score_of(toks: Column, text: Column) -> Column:
    """quality score over an already-bound token array (see ``bind``) —
    single-scan composites tokenize once and derive every per-doc value
    from the same bound array."""
    n_tok = F.size(toks)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(0.4)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(
        _stopword_ratio_of(toks, "en") >= 0.01, F.lit(0.3)
    ).otherwise(F.lit(0.0))
    # mwl is an O(tokens) fold referenced from both band bounds — bind
    # it too so the fold runs once.
    shape_ok = bind(
        _mean_word_length_of(toks),
        lambda mwl: F.when(
            (mwl >= 2.0) & (mwl <= 12.0), F.lit(0.2)
        ).otherwise(F.lit(0.0)),
    )
    punct_ok = F.when(
        punct_count(text) <= F.length(text) * 0.1, F.lit(0.1)
    ).otherwise(F.lit(0.0))
    return F.round(len_ok + stop_ok + shape_ok + punct_ok, 2)


def quality_score(text: Column) -> Column:
    """Heuristic [0,1] quality score: length band + stopword evidence +
    word-shape sanity − punctuation noise. The exact formula matters less
    than determinism + SQL-expressibility; weights follow common web-corpus
    filters (Gopher/C4-style length & symbol heuristics)."""
    # bind(): the four score terms previously re-ran the whitespace
    # tokenizer ~8× per row (HOFs are CodegenFallback — no subexpression
    # elimination). Measured 2-3× faster on text_quality at sf0.1 with
    # identical values (r13 prototype: 0 differing rows).
    return bind(tokens(text), lambda toks: quality_score_of(toks, text))


def fingerprint(text: Column, shingle_len: int = 4) -> Column:
    """Winnowing-style document fingerprint: min md5 over word shingles.

    Rolling-hash selection reduced to its scale-stable core — a content
    fingerprint that is invariant to document chunk order joins and equal
    for near-identical prefixes/suffixes manipulations only when shingles
    coincide. md5 is available identically in Spark and DuckDB.
    """
    return F.array_min(
        F.transform(word_shingles(text, shingle_len), lambda s: F.md5(s))
    )


def content_hash_of(toks: Column) -> Column:
    """content hash over an already-bound token array (see ``bind``)."""
    return F.md5(F.array_join(toks, " "))


def content_hash(text: Column) -> Column:
    """Exact-dup key: md5 of the canonicalized (lowercased, space-joined)
    token stream — whitespace-normalization-invariant exact hashing."""
    return content_hash_of(tokens(text))
