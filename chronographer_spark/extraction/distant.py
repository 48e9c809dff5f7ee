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


def cooccurrence_pairs(
    docs: DataFrame,
    entities: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gap: int = 4,
) -> DataFrame:
    """(id, e1, e2, pattern) — one row per bounded-gap ordered mention
    pair, with the between-text pattern. The shared front half of
    distant_supervision_patterns and snowball_extract."""
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
    return pairs.join(arr, "id").select(
        "id",
        "e1",
        "e2",
        F.array_join(
            F.slice(F.col("l"), F.col("pos") + 1, F.col("pos2") - F.col("pos") - 1),
            " ",
        ).alias("pattern"),
    )


def distant_supervision_patterns(
    docs: DataFrame,
    entities: list[str],
    kb: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gap: int = 4,
    min_pairs: int = 2,
    broadcast_kb: bool = True,
    pairs: DataFrame | None = None,
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

    pairs: pass a precomputed cooccurrence_pairs() result (e.g. a
    checkpointed one shared with snowball_extract) to skip rebuilding it.
    """
    pat = (
        pairs
        if pairs is not None
        else cooccurrence_pairs(docs, entities, id_col, text_col, max_gap)
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


def snowball_extract(
    docs: DataFrame,
    entities: list[str],
    kb: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_gap: int = 4,
    min_pattern_pairs: int = 2,
    min_precision_x1e6: int = 500000,
    broadcast_kb: bool = True,
) -> DataFrame:
    """One bootstrap round of pattern-based triple extraction (the
    Snowball/Mintz loop closed): profile patterns against the seed KB,
    keep the reliable ones (support >= min_pattern_pairs AND exact
    integer precision >= min_precision_x1e6), then apply them back to the
    corpus and emit the entity pairs they cover that the KB does NOT
    already contain — the engine's new (subj, pred, obj) triples, each
    with corpus support. This is the scalable version of the reference's
    enrich-graph-from-KB step (build_ng/generic_kb_to_ng.py) run in the
    opposite direction: text plus seed KB => new KB triples.

    Plan shape: the corpus-scale pair table feeds BOTH the pattern
    profile and the extraction join, so it is eagerly localCheckpoint-ed
    once (shared-subtree rule); the reliable-pattern table and the KB are
    dimension-sized and broadcast; the final support count is one
    combinable groupBy.

    Returns (subj, pred, obj, support, n_docs), pred = the reliable
    pattern's pinned top_pred.
    """
    pairs = cooccurrence_pairs(docs, entities, id_col, text_col, max_gap)
    pairs = pairs.localCheckpoint(eager=True)
    profile = distant_supervision_patterns(
        docs,
        entities,
        kb,
        id_col=id_col,
        text_col=text_col,
        max_gap=max_gap,
        min_pairs=min_pattern_pairs,
        broadcast_kb=broadcast_kb,
        pairs=pairs,
    )
    reliable = profile.filter(
        (F.col("kb_precision_x1e6") >= min_precision_x1e6)
        & F.col("top_pred").isNotNull()
    ).select("pattern", F.col("top_pred").alias("pred"))
    kb_pairs = kb.select(
        F.col("subj").alias("e1"), F.col("obj").alias("e2")
    ).dropDuplicates(["e1", "e2"])
    if broadcast_kb:
        reliable = F.broadcast(reliable)
        kb_pairs = F.broadcast(kb_pairs)
    return (
        pairs.join(reliable, "pattern")
        .join(kb_pairs, ["e1", "e2"], "left_anti")
        .groupBy("e1", "pred", "e2")
        .agg(
            F.count(F.lit(1)).alias("support"),
            F.countDistinct("id").alias("n_docs"),
        )
        .select(
            F.col("e1").alias("subj"),
            "pred",
            F.col("e2").alias("obj"),
            "support",
            "n_docs",
        )
    )
