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

__all__ = ["word_freqs", "bpe_train", "bpe_train_batched", "bpe_segment"]

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


def bpe_train_batched(
    words: DataFrame,
    n_rounds: int,
    batch_k: int,
    word_col: str = "word",
    freq_col: str = "freq",
    target_merges: int | None = None,
    stats_out: dict | None = None,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn BPE merges in BATCHED rounds: exactly ``n_rounds`` driver
    rounds, each keeping up to ``batch_k`` pairwise-symbol-disjoint merges
    — the fix for sequential BPE's one-driver-round-per-merge latency wall
    (a 32k-merge production vocabulary means 32k synchronized rounds no
    cluster size can hide; batching divides the round count by the
    per-round yield).

    Batch rule, chosen to be NON-RECURSIVE so the DuckDB oracle replays it
    with one window + NOT EXISTS: rank the round's pair counts by
    (count DESC, left, right); a candidate in the top-``batch_k`` window is
    KEPT iff it shares no symbol (left or right) with ANY higher-ranked
    candidate in the window — kept or not. (Greedy-vs-kept-only would keep
    slightly more per round but is a sequential recurrence; the
    conservative rule loses a little yield for exact cross-engine replay.)
    Kept merges have pairwise-disjoint symbol sets, so their patterns
    cannot create or consume each other's match sites; they are applied in
    rank order inside ONE projection with ONE lineage checkpoint per
    round. Recorded pair_count is the count measured at the START of the
    round (the batched-BPE spec — the 2nd+ merge of a batch reports its
    pre-batch count); ``batch_k=1`` degenerates to exact sequential
    Sennrich training. merge_round numbers merges cumulatively across
    rounds in application order, so `bpe_segment` replays them unchanged.

    ``target_merges`` (bench/ad-hoc use, not oracle-replayed): stop as
    soon as the cumulative merge count reaches it, truncating the last
    batch — round count then adapts to per-round yield instead of being
    fixed. Stops early in all modes when no adjacent pair remains.

    Returns (merges, merges_df) with merges the driver-side list of
    (merge_round, left_sym, right_sym, pair_count).
    """
    spark = words.sparkSession
    w = words.select(
        F.expr(_SYM_STR.format(w=word_col)).alias("s"),
        F.col(freq_col).cast("long").alias("freq"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    rounds_used = 0
    for _ in range(n_rounds):
        rounds_used += 1
        cand = (
            w.select(F.split(F.trim(F.col("s")), " ").alias("a"), "freq")
            .select(F.explode(F.expr(_PAIRS)).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(batch_k)
            .collect()
        )
        if not cand:
            break
        kept: list[tuple[str, str, int]] = []
        for i, row in enumerate(cand):
            syms = {row["l"], row["r"]}
            if all(
                syms.isdisjoint({h["l"], h["r"]}) for h in cand[:i]
            ):
                kept.append((row["l"], row["r"], int(row["cnt"])))
        if target_merges is not None:
            kept = kept[: target_merges - len(merges)]
        col = F.col("s")
        for left, right, cnt in kept:
            merges.append((len(merges) + 1, left, right, cnt))
            col = F.replace(
                col, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            )
        w = w.select(col.alias("s"), "freq").localCheckpoint(eager=True)
        if target_merges is not None and len(merges) >= target_merges:
            break
    if stats_out is not None:
        stats_out["rounds"] = rounds_used
        stats_out["merges"] = len(merges)
    merges_df = spark.createDataFrame(
        merges,
        "merge_round INT, left_sym STRING, right_sym STRING, pair_count BIGINT",
    )
    return merges, merges_df


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "word",
    freq_col: str = "freq",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn `n_merges` BPE merge rules from a (word, freq) table —
    classic SEQUENTIAL training (one argmax merge per round), i.e.
    `bpe_train_batched` with batch_k=1: the top-1 candidate is always
    kept (no higher-ranked candidate exists), so the batched loop
    reproduces Sennrich's semantics bit-for-bit.

    Returns (merges, merges_df) where merges is the driver-side list of
    (merge_round, left_sym, right_sym, pair_count) — needed as literals by
    `bpe_segment` — and merges_df is the same as a DataFrame. Stops early
    if no adjacent pair remains (every word fully merged).
    """
    return bpe_train_batched(
        words, n_rounds=n_merges, batch_k=1,
        word_col=word_col, freq_col=freq_col,
    )


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
