"""Distributed BPE (byte-pair encoding) tokenizer training.

A training-data pipeline at 10^12 documents trains its tokenizer on
the corpus it just cleaned; BPE (Sennrich et al. 2016) is the
standard algorithm. The classical formulation is a driver-side loop
over a word-frequency dictionary — this module keeps that loop
structure (merge decisions are inherently sequential) but makes each
iteration's work distributed and JVM-side:

* the corpus collapses ONCE to a word-TYPE frame (word, n) — at web
  scale ~10^7-10^8 types from 10^12 tokens, the classic
  heavy-aggregation-then-small-loop shape;
* each iteration counts adjacent symbol pairs weighted by type
  frequency with one narrow groupBy shuffle (arrays_zip of two
  slices, explode — no Python);
* the argmax pair (ONE row) is collected to the driver — the only
  driver data movement per merge;
* the merge is applied to every type's symbol array as a pure-Column
  greedy left-to-right fold (F.aggregate), matching the reference
  algorithm's in-place merge semantics.

Determinism: ties break on (-freq, left, right) so the merge table
is a pure function of the corpus. Certified in tests against an
independent pure-python reference implementation (exact merge-table
equality), the LSH-recall-style certification used for the other
iterative operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_type_counts", "train_bpe", "apply_merges"]

_EOW = "</w>"


def word_type_counts(docs: DataFrame, text_col: str = "text"
                     ) -> DataFrame:
    """(word, n): whitespace-token types with occurrence counts —
    the one corpus-sized aggregation of BPE training."""
    return (docs
            .select(F.explode(F.split(F.lower(F.col(text_col)),
                                      r"\s+")).alias("word"))
            .filter(F.col("word") != "")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n")))


def _initial_symbols(word_col: F.Column) -> F.Column:
    """Character symbols plus a terminal end-of-word marker symbol."""
    chars = F.filter(F.split(word_col, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(_EOW)))


def _merge_expr(col: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol, as a Column fold — the exact semantics of the reference
    implementation's scan (post-merge symbols participate in later
    matches, so 'aaa' under (a,a) becomes [aa, a])."""
    merged = left + right
    return F.aggregate(
        col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x))))


def _pair_counts(types: DataFrame) -> DataFrame:
    s = F.col("syms")
    pairs = F.arrays_zip(
        F.slice(s, 1, F.size(s) - 1),
        F.slice(s, 2, F.size(s) - 1)).alias("p")
    return (types
            .filter(F.size(s) >= 2)
            .select("n", F.explode(pairs).alias("p"))
            .select("n",
                    F.col("p")["0"].alias("left"),
                    F.col("p")["1"].alias("right"))
            .groupBy("left", "right")
            .agg(F.sum("n").alias("freq")))


def train_bpe(word_counts: DataFrame, n_merges: int = 10,
              min_freq: int = 2) -> list[tuple[str, str, int]]:
    """Learn up to `n_merges` merges; returns [(left, right, freq)]
    in merge order. Stops early when the best pair drops below
    `min_freq`."""
    types = word_counts.select(
        "n", _initial_symbols(F.col("word")).alias("syms")).persist()
    # every round's frame is persisted and kept until the end: the
    # next round's argmax job is what materializes it (into cache, on
    # top of the already-cached parent — lineage stays one level
    # deep), so no extra count() job per round; the frames are
    # word-TYPE sized, far below executor memory even at web scale
    persisted = [types]
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            best = (_pair_counts(types)
                    .orderBy(F.desc("freq"), "left", "right")
                    .limit(1)
                    .collect())
            if not best or best[0]["freq"] < min_freq:
                break
            left, right, freq = (best[0]["left"], best[0]["right"],
                                 int(best[0]["freq"]))
            merges.append((left, right, freq))
            types = types.select(
                "n", _merge_expr(F.col("syms"), left, right)
                .alias("syms")).persist()
            persisted.append(types)
    finally:
        for f in persisted:
            f.unpersist()
    return merges


def apply_merges(docs: DataFrame, merges: list[tuple[str, str, int]],
                 text_col: str = "text") -> DataFrame:
    """Segment every document under a learned merge table:
    -> (token, n) corpus token counts. The merge sequence is applied
    as chained Column folds — k merges = k expressions in ONE
    projection, no Python, no extra passes.

    The fold runs over DISTINCT WORD TYPES, not occurrences (same
    collapse the trainer uses): segmentation is a pure function of
    the word, so the corpus first reduces to (word, n_words) and the
    k-merge expression chain touches each type once, with per-type
    counts summed back per emitted symbol — on real corpora types
    are orders of magnitude fewer than tokens (measured 16.1 s ->
    0.9 s warm at sf0.1 for a 10-merge table)."""
    types = (docs
             .select(F.explode(F.split(F.lower(F.col(text_col)),
                                       r"\s+")).alias("word"))
             .filter(F.col("word") != "")
             .groupBy("word").agg(F.count(F.lit(1)).alias("n_words")))
    syms = _initial_symbols(F.col("word"))
    for left, right, _ in merges:
        syms = _merge_expr(syms, left, right)
    return (types.select(F.col("n_words"), F.explode(syms).alias("token"))
            .groupBy("token")
            .agg(F.sum("n_words").alias("n")))
