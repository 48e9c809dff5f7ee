"""Distant-supervision relation extraction (Mintz et al. 2009): label
textual entity-pair co-occurrences with relations from an existing KB, then
profile the textual patterns between the mentions — the bootstrap loop that
turns a seed KB plus raw text into new relation-extraction rules.

The reference enriches its narrative graph by looking up each spotted
entity in an external KB one HDT call at a time
(/root/reference/src/build_ng/generic_kb_to_ng.py:31-36 — per-entity
`get_outgoing` against a local HDT snapshot, inside a pandas row loop).
At 10^12 turns that per-mention lookup becomes a bulk join: spot all
mentions once, form bounded-gap co-occurrence pairs, and join the pair
table against the KB triple table in one pass.

Plan shape (all joins keyed on the document id or the entity pair —
nothing quadratic in the corpus):
- tokenize once (map-only, whole-stage codegen), keep 1-BASED positions;
- the dictionary filter runs BEFORE the self-join, so the pair join's
  input is the mention table (|mentions| << |tokens|), keyed by doc id
  with a bounded position gap — fan-out <= max_gap per mention;
- the between-text pattern is recovered by ONE join back to the doc's
  token array (same doc-id key as the pair join, so the exchange is
  reused), sliced map-side — never an ordered re-aggregation of tokens;
- the KB is deduplicated on (subj, obj) and broadcast (a seed KB is
  dimension-sized by definition; pass broadcast_kb=False if yours is not);
- the final profile is one map-side-combinable groupBy on the pattern.

Determinism: pair = (earlier mention, later mention) by position; the
reported relation per pattern is max(pred) over its KB-labeled pairs
(NULL-ignoring max in both engines), so ties are pinned lexicographically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distant_supervision_patterns(
    docs: DataFrame,
    entities: list[str],
    kb: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gap: int = 4,
    min_pairs: int = 2,
    broadcast_kb: bool = True,
) -> DataFrame:
    """Per-pattern distant-supervision profile.

    docs: (id_col, text_col) corpus.
    entities: dictionary of surface forms to spot (exact lowercase token
      match; swap in extraction/gazetteer.py for multi-token phrases).
    kb: (subj, pred, obj) seed triples over the same surface forms; rows
      are deduplicated on (subj, pred, obj) and (subj, obj) is assumed
      functional for the precision readout (multiple preds per pair would
      double-count the pair).
    max_gap: max token distance between the two mentions (pattern length
      is max_gap - 1 tokens or fewer).
    min_pairs: drop patterns seen fewer times (noise floor).

    Returns (pattern, n_pairs, n_docs, n_kb, top_pred, kb_precision_x1e6):
    one row per between-text pattern, with the count of co-occurrence
    pairs carrying it, distinct docs, how many of those pairs the KB
    labels, the (pinned) relation, and the exact integer precision
    n_kb * 10^6 DIV n_pairs — the Mintz pattern-reliability score.
    """
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    arr = docs.select(F.col(id_col).alias("id"), toks.alias("l"))
    ment = (
        arr.select("id", F.posexplode("l").alias("pos0", "tok"))
        .filter(F.col("tok").isin(entities))
        .select("id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    m2 = ment.select(
        F.col("id").alias("id2"),
        F.col("pos").alias("pos2"),
        F.col("tok").alias("tok2"),
    )
    pairs = ment.join(
        m2,
        (F.col("id") == F.col("id2"))
        & (F.col("pos2") > F.col("pos"))
        & (F.col("pos2") - F.col("pos") <= max_gap)
        & (F.col("tok2") != F.col("tok")),
    ).select("id", "pos", "pos2", F.col("tok").alias("e1"), F.col("tok2").alias("e2"))
    # recover the between-text by re-joining the doc's token array (same
    # doc-id key as the pair join) and slicing map-side
    pat = pairs.join(arr, "id").select(
        "id",
        "e1",
        "e2",
        F.array_join(
            F.slice(F.col("l"), F.col("pos") + 1, F.col("pos2") - F.col("pos") - 1),
            " ",
        ).alias("pattern"),
    )
    kb_d = kb.select(
        F.col("subj").alias("e1"), F.col("pred"), F.col("obj").alias("e2")
    ).dropDuplicates(["e1", "pred", "e2"])
    if broadcast_kb:
        kb_d = F.broadcast(kb_d)
    labeled = pat.join(kb_d, ["e1", "e2"], "left")
    return (
        labeled.groupBy("pattern")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("id").alias("n_docs"),
            F.sum(F.col("pred").isNotNull().cast("long")).alias("n_kb"),
            F.max("pred").alias("top_pred"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
        .select(
            "pattern",
            "n_pairs",
            "n_docs",
            "n_kb",
            "top_pred",
            F.expr("n_kb * 1000000 DIV n_pairs").alias("kb_precision_x1e6"),
        )
    )
