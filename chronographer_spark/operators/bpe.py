"""Distributed BPE tokenizer training and segmentation.

Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") re-expressed as DataFrame
algebra — the tokenizer-training step of an LLM data pipeline. Beyond the
reference (no tokenizer exists in /root/reference); included because a
training-data engine that counts tokens (operators/text.py token_counts)
should also be able to LEARN the subword vocabulary those counts assume.

Scale design:
- The corpus collapses to a distinct-word frequency table after ONE
  explode+groupBy shuffle (`word_freqs`); Zipf makes |vocab| orders of
  magnitude smaller than the corpus, so every merge round runs on the
  small table, never the raw text.
- Each round is one map-side adjacent-pair explode + sum agg +
  TakeOrdered(1); only the single argmax row crosses the driver (the same
  k-rows-cross-driver discipline as k-means centroids / IVF probes).
  Driver-collected values are STRINGS — exact, none of the float-grid
  discipline applies.
- Merge application is a map-side `replace()` on the space-joined symbol
  string. Spark's and DuckDB's replace() are both single-pass,
  left-to-right, non-overlapping — the merge semantics are DEFINED as that
  scan, so the DuckDB oracle replays training bit-for-bit (a run of k
  identical symbols pairs as that scan pairs it, which for runs >= 4
  differs from per-array greedy folding; both engines agree with each
  other, which is the property the gate needs).
- Pair COUNTING is the standard overlapping adjacent count ("aaa" counts
  (a,a) twice), weighted by word frequency.
- Per-round eager localCheckpoint keeps the lineage O(1) instead of
  re-running the whole replace chain each round (the shared-subtree rule
  from the minhash-bands / tf-idf family).

Boundary encoding: a word "hi" becomes " h i " (single-space-joined symbols
with single-space sentinels); a merge (l, r) is replace(" l r " -> " lr ").
Symbols never contain spaces (words come from whitespace splitting), so the
sentinel spaces are unambiguous token boundaries. In `bpe_segment`,
word-internal gaps are single spaces and word boundaries are DOUBLE spaces,
so no merge can ever cross a word boundary. No explicit end-of-word marker
is appended (documented deviation from Sennrich's `</w>`; merges therefore
never distinguish word-final position).

Ties in the argmax are broken by (count DESC, left ASC, right ASC) — binary
string order, identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_freqs", "bpe_train", "bpe_segment"]

# ' h e l l o ' — single-space-joined characters with sentinel spaces.
_SYM_STR = (
    "concat(' ', array_join(transform(sequence(1, char_length({w})),"
    " i -> substring({w}, i, 1)), ' '), ' ')"
)

# adjacent (left, right) symbol pairs of a symbol array `a`; empty for
# single-symbol words (slice length 0 -> []), never calls sequence(1, 0).
_PAIRS = (
    "zip_with(slice(a, 1, size(a)-1), slice(a, 2, size(a)-1),"
    " (x, y) -> struct(x AS l, y AS r))"
)


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split tokens — the one corpus-wide
    shuffle; everything after runs on the distinct-word table."""
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merge rules from a (word, freq) table.

    Returns (merges, merges_df) where merges is the driver-side list of
    (merge_round, left_sym, right_sym, pair_count) — needed as literals by
    `bpe_segment` — and merges_df is the same as a DataFrame. Stops early
    if no adjacent pair remains (every word fully merged).
    """
    spark = words.sparkSession
    w = words.select(
        F.expr(_SYM_STR.format(w=word_col)).alias("s"),
        F.col(freq_col).cast("long").alias("freq"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        top = (
            w.select(F.split(F.trim(F.col("s")), " ").alias("a"), "freq")
            .select(F.explode(F.expr(_PAIRS)).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rnd, left, right, cnt))
        w = w.select(
            F.replace(
                F.col("s"),
                F.lit(f" {left} {right} "),
                F.lit(f" {left}{right} "),
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(
        merges,
        "merge_round INT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )
    return merges, merges_df


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "n_tokens_bpe",
) -> DataFrame:
    """Apply learned merges to whole documents, map-side only.

    Encodes each document as per-word single-space symbol runs joined by
    DOUBLE spaces (merge patterns carry exactly one space, so they cannot
    match across the 2-space word boundary), replays the merge replaces in
    training order, and appends the resulting subword-token count. Adds no
    shuffle: segmentation is a pure projection, so it composes with any
    downstream plan the way token_counts does.
    """
    word_syms = (
        "array_join(transform(sequence(1, char_length(x)),"
        " i -> substring(x, i, 1)), ' ')"
    )
    doc_sym = F.expr(
        f"concat(' ', array_join(transform(filter(split({text_col}, ' '),"
        f" x -> x <> ''), x -> {word_syms}), '  '), ' ')"
    )
    for _, left, right, _ in merges:
        doc_sym = F.replace(
            doc_sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        )
    return df.withColumn(
        out_col,
        F.size(F.split(F.trim(doc_sym), " +")).cast("long"),
    )
