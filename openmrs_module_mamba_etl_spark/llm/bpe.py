"""BPE tokenizer induction over a corpus — the Sennrich et al. (2016)
byte-pair-encoding recipe, Spark-shaped.

Classic BPE never iterates over the corpus: it iterates over the WORD
VOCABULARY (distinct words + frequencies), which is orders of magnitude
smaller — the corpus is touched exactly once to build the vocab. Each merge
round is then:

1. adjacent symbol-pair counts, frequency-weighted (explode + hash agg
   over the vocab — a contracted table);
2. the argmax pair (count desc, pair asc — deterministic) collected to the
   driver as ONE row (the same bounded-collect pattern as the IVF Lloyd
   step);
3. the merge applied to every word representation as a codegen string
   rewrite.

The merge rewrite uses the double-space trick so left-to-right non-
overlapping ``replace`` implements greedy BPE application exactly: spacing
is doubled (every adjacency owns two separators, so consecutive matches
never share a character), the pair pattern replaced, spacing collapsed.
``replace`` semantics (left-to-right, non-overlapping, replace-all) agree
between Spark and DuckDB, so the whole loop — unrolled to chained CTEs —
replays in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the corpus — BPE's only full-corpus pass."""
    from openmrs_module_mamba_etl_spark.functions.similarity import tokens

    return (
        docs.where(F.col(text_col).isNotNull())
        .select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_rep(w) -> F.Column:
    """'abc' → 'a b c' (one symbol per character)."""
    return F.trim(F.regexp_replace(w, "(.)", "$1 "))


def _pair_counts(rep_df: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-symbol-pair counts over the vocab.
    Single-symbol words produce an empty transform and drop at explode."""
    # CASE guard: Spark's sequence(1, 0) is DESCENDING [1, 0], so a
    # single-symbol word must yield an explicit empty array instead
    pairs = F.expr(
        "CASE WHEN size(split(rep, ' ')) > 1 THEN"
        " transform(sequence(1, size(split(rep, ' ')) - 1),"
        " i -> concat(split(rep, ' ')[i-1], ' ', split(rep, ' ')[i]))"
        " ELSE array() END"
    )
    return (
        rep_df.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("freq"))
    )


def _apply_merge(rep_df: DataFrame, pair: str) -> DataFrame:
    """Greedy left-to-right merge of ``pair`` in every representation."""
    doubled_pair = F.lit(" " + pair.replace(" ", "  ") + " ")
    merged = F.lit(" " + pair.replace(" ", "") + " ")
    doubled = F.concat(
        F.lit(" "), F.replace(F.col("rep"), F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    return rep_df.withColumn(
        "rep",
        F.trim(
            F.replace(
                F.replace(doubled, doubled_pair, merged),
                F.lit("  "),
                F.lit(" "),
            )
        ),
    )


def apply_merges_col(word, pairs: list[str]):
    """Column expression re-tokenizing one word with a learned merge list.

    Starts at the char-split representation and replays each merge with
    the identical double-space rewrite ``_apply_merge`` uses during
    training — all literal (non-regex) replaces, so merge pairs may
    contain any non-whitespace characters (tokens are whitespace-split,
    so the space separators the trick relies on can never occur inside a
    symbol). Pure codegen: applying a trained tokenizer to a 100 TB
    corpus is a map-only pass, no shuffle, no Python.
    """
    rep = F.trim(F.regexp_replace(word, "(.)", "$1 "))
    for pair in pairs:
        doubled = F.concat(
            F.lit(" "), F.replace(rep, F.lit(" "), F.lit("  ")), F.lit(" ")
        )
        rep = F.trim(
            F.replace(
                F.replace(
                    doubled,
                    F.lit(" " + pair.replace(" ", "  ") + " "),
                    F.lit(" " + pair.replace(" ", "") + " "),
                ),
                F.lit("  "),
                F.lit(" "),
            )
        )
    return rep


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int = 3
) -> list[tuple[int, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, pair, freq), ...].

    The driver loop runs over the contracted vocab table (localCheckpoint
    per round caps lineage exactly like the CC loop); per round the driver
    sees one argmax row, nothing else.
    """
    rep = (
        word_vocab(docs, text_col)
        .select(_initial_rep(F.col("w")).alias("rep"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[int, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(rep)
            .orderBy(F.col("freq").desc(), F.col("pair").asc())
            .first()
        )
        if top is None:
            break
        merges.append((rank, top["pair"], top["freq"]))
        rep = _apply_merge(rep, top["pair"]).localCheckpoint()
    return merges
