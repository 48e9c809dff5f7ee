"""Gazetteer phrase matching: dictionary-driven entity spotting.

The reference links mentions to KB entities through a remote annotator
(reference: src/dbpedia_spotlight.py:25-44 — per-text HTTP calls to a
Spotlight service). The classic scalable alternative when a surface-form
dictionary exists (DBpedia labels, a product catalog, a vocabulary of
canonical event names) is gazetteer matching: find every token-aligned
occurrence of every dictionary phrase in every document — Aho-Corasick
semantics, re-expressed as DataFrame joins instead of a per-row automaton.

Plan shape (the one you'd want at 100 TB):
  1. tokens: one posexplode projection of the corpus (id, pos, tok) —
     map-only, no shuffle;
  2. the dictionary is dimension-table-small: its per-phrase token list and
     the chosen ANCHOR token are broadcast;
  3. candidates: tokens ⋈ BROADCAST(anchors) on the anchor token. The
     anchor is the LONGEST token of the phrase (ties -> smallest offset):
     on a Zipf vocabulary the longest token is the rarest, so candidate
     volume is bounded by occurrences of rare tokens, not of stopwords —
     anchoring "the University of X" on "University", never on "the";
  4. verify: candidates expand to one expected (pos, token) row per phrase
     token (broadcast join again) and meet the token table ONCE on the
     (id, pos) key; a phrase occurrence is a candidate whose match count
     equals its phrase length.

Total cost: one wide shuffle of expected-vs-actual token rows keyed by
(id, pos) — linear in candidate volume x phrase length. No Python, no
windows, no per-row automata; overlapping occurrences all surface (one row
per aligned start), exactly like Aho-Corasick with all-matches output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(toks).alias("pos", "tok"),
    )


def gazetteer_match(
    docs: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """All token-aligned occurrences of dictionary phrases in a corpus.

    docs: (id_col, text_col) corpus; phrases: one row per dictionary phrase
    (whitespace-tokenized the same way as the text; matching is
    case-insensitive via lower() on both sides).

    Returns (doc_id, phrase, start) — one row per occurrence, `start` the
    0-based token position of the phrase's first token. Overlapping and
    repeated occurrences each get a row.
    """
    toks = _tokens(docs, id_col, text_col)
    pdist = phrases.select(F.col(phrase_col).alias(phrase_col)).distinct()
    ptoks = pdist.select(
        F.col(phrase_col).alias("phrase"),
        F.posexplode(
            F.filter(
                F.split(F.lower(F.col(phrase_col)), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("j", "ptok"),
    )
    # anchor: longest token, ties -> smallest offset (pinned, engine-free)
    anchors = ptoks.groupBy("phrase").agg(
        F.max_by(
            F.struct("j", "ptok"),
            F.struct(
                F.length("ptok").alias("l"), (-F.col("j")).alias("nj")
            ),
        ).alias("a"),
        F.count(F.lit(1)).alias("n"),
    ).select("phrase", F.col("a.j").alias("aj"), F.col("a.ptok").alias("atok"), "n")

    cands = toks.join(
        F.broadcast(anchors), toks["tok"] == anchors["atok"]
    ).select(
        "id", "phrase", (F.col("pos") - F.col("aj")).alias("start"), "n"
    ).filter(F.col("start") >= 0)

    expected = cands.join(F.broadcast(ptoks), "phrase").select(
        "id", "phrase", "start", (F.col("start") + F.col("j")).alias("pos"),
        "ptok", "n",
    )
    hits = (
        expected.join(toks, ["id", "pos"])
        .filter(F.col("tok") == F.col("ptok"))
        .groupBy("id", "phrase", "start", "n")
        .agg(F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") == F.col("n"))
    )
    return hits.select(
        F.col("id").alias("doc_id"), "phrase", "start"
    )
