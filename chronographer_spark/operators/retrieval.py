"""Inverted index + positional phrase search.

The retrieval leg of a training-data pipeline: corpus-scale term lookup
(which documents contain X, where) without re-scanning raw text per query.

Index layout is one row per (term, doc) with the in-document position list
— NOT one giant postings array per term: a stopword's term-level posting
row would hold millions of entries (the same skew trap as the 1-gram LSH
degeneracy, BENCH/BASELINE.md "scale trap"), while per-(term, doc) rows are
bounded by document length. Production layout: write the index bucketed by
`term` (io/catalog.py `write_bucketed`) so per-term lookups are
partition-pruned and the phrase join is co-located on doc_id after one
bucket read per phrase term.

Phrase search joins adjacent terms' postings per doc and intersects
position lists shifted by one — k-1 equi-joins for a k-term phrase, no
Python, no regex over raw text. Positions are raw offsets into the
`[^a-z]+` split array; consecutive words always occupy consecutive slots
(delimiter runs collapse), so adjacency is split-representation-invariant
and the emitted match COUNT is identical under 0- or 1-based indexing —
the DuckDB oracle uses the same token algebra.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, positions array<int> sorted, tf)."""
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("positions"),
        F.count("*").alias("tf"),
    )


def phrase_search(
    index: DataFrame, phrase: str, id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing `phrase` as a consecutive token sequence ->
    (doc_id, n_matches). Raises on an empty phrase."""
    terms = [t for t in re.split(r"[^a-z]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase must contain at least one alphabetic token")
    cur = index.filter(F.col("term") == terms[0]).select(
        id_col, F.col("positions").alias("p")
    )
    for t in terms[1:]:
        nxt = index.filter(F.col("term") == t).select(
            id_col, F.col("positions").alias("np")
        )
        cur = (
            cur.join(nxt, id_col)
            .select(
                id_col,
                F.array_intersect(
                    F.transform("p", lambda x: x + 1), F.col("np")
                ).alias("p"),
            )
            .filter(F.size("p") > 0)
        )
    return cur.select(id_col, F.size("p").cast("long").alias("n_matches"))
