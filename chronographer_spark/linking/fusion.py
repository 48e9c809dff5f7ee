"""Attribute fusion: post-ER knowledge consolidation.

After canonicalization (connected components -> referent dictionary,
canonicalize.py) every canonical entity carries the attribute assertions of
all its merged aliases/mentions, and those assertions conflict: three
mentions say an entity's type is Person, one says Organization. The
reference resolves this implicitly by last-writer-wins on a driver-side
dict during graph assembly (reference: src/make_narrative_graph.py builds
per-URI property dicts; the dict update order picks the survivor). That is
neither deterministic nor distributed. Here fusion is an explicit operator:
truth discovery by majority vote with a pinned tie-break, expressed as two
cascaded aggregations so the heavy pass is map-side combinable.

Plan shape (the one you'd want at 100 TB):
  1. optional alias->canonical rewrite (apply_referents: broadcast join),
  2. groupBy(canonical, attr, value) count  -- partial agg, ONE shuffle on
     the fused key; hot entities are spread because value participates,
  3. groupBy(canonical, attr) min_by(..., struct(-cnt, value)) -- second
     shuffle is over the already-collapsed (entity, attr, value) triples,
     orders of magnitude smaller than the assertion input.

No windows: a window over (canonical, attr) would sort whole partitions;
min_by is an O(1)-state aggregate and survives hub entities with millions
of assertions. Tie-break is pinned: highest vote count, then
lexicographically smallest value — re-runs and engine changes fuse
identically.

Confidence is emitted as an exact integer quotient votes*1e6 DIV total
(no floats anywhere, so DuckDB replays it bit-exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import apply_referents


def fuse_attributes(
    assertions: DataFrame,
    referents: DataFrame | None = None,
    entity_col: str = "entity",
    attr_col: str = "attr",
    value_col: str = "value",
) -> DataFrame:
    """Fuse conflicting attribute assertions per canonical entity.

    assertions: one row per (entity, attr, value) claim (duplicates allowed —
      each row is one vote). value must be a string (cast upstream; the
      tie-break is lexicographic).
    referents: optional (alias, canonical) dictionary from
      canonical_dictionary(); when given, entity_col is rewritten through it
      before voting so all aliases of an entity pool their votes.

    Returns one row per (canonical entity, attr):
      entity, attr, fused_value  (majority value; ties -> smallest value),
      votes (winner's count), total (all votes), n_values (distinct values),
      confidence_x1e6 (votes*1e6 DIV total, exact integer).
    """
    a = assertions.select(
        F.col(entity_col).alias("entity"),
        F.col(attr_col).alias("attr"),
        F.col(value_col).alias("value"),
    )
    if referents is not None:
        a = apply_referents(a, referents, "entity")

    counted = a.groupBy("entity", "attr", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # min over struct(-cnt, value): max votes first, then smallest value.
    return counted.groupBy("entity", "attr").agg(
        F.expr(
            "min_by(value, struct(-cnt, value))"
        ).alias("fused_value"),
        F.expr("max(cnt)").alias("votes"),
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_values"),
        F.expr(
            "CAST(max(cnt) * 1000000L DIV sum(cnt) AS BIGINT)"
        ).alias("confidence_x1e6"),
    )


def truth_discovery(
    claims: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    entity_col: str = "entity",
    attr_col: str = "attr",
    value_col: str = "value",
) -> DataFrame:
    """Iterative truth discovery (the Sums / TruthFinder family, Yin et
    al. 2008; Dong et al.'s knowledge-fusion survey): majority voting is
    wrong when sources differ in reliability, so alternate

        value score(e, a, v)  = Σ trust(s) over sources claiming v
        trust(s)              = (#claims of s backing a current winner)
                                  · 10^6 DIV (#claims of s)

    for a FIXED ``rounds`` count, starting from uniform trust 10^6.
    Round 1 therefore reproduces plain majority voting; round 2 re-votes
    with agreement-derived trust — sources that sided with consensus
    count more. Everything is exact integer arithmetic (trust is scaled
    by 10^6, scores are long sums, the trust update is an integer
    quotient), so an unrolled SQL oracle replays it bit-exactly; the
    fixed round count is the cross-engine contract exactly as in
    pagerank_2iter.

    Votes are deduplicated to one per (source, entity, attr, value) —
    a source repeating itself is not extra evidence. Winner tie-break is
    pinned: highest score, then lexicographically smallest value. A
    source whose claims never back a winner gets trust 0 (it still
    votes — with weight 0 — which can matter for ties only through the
    pinned value order, never through score).

    Scale shape per round: one shuffle for the score agg (keyed by the
    (entity, attr, value) triple — hub entities spread across values),
    one min_by agg for winners (O(1) state, no window sort), one
    broadcast-sized join back for the trust update (winners table is one
    row per (entity, attr)). Per-round eager localCheckpoint cuts
    lineage. Returns one row per (entity, attr): fused_value, score
    (winner's summed trust), n_sources (winner's distinct backers).
    """
    c = claims.select(
        F.col(src_col).alias("src"),
        F.col(entity_col).alias("entity"),
        F.col(attr_col).alias("attr"),
        F.col(value_col).alias("value"),
    ).dropDuplicates().localCheckpoint(eager=True)
    src_claims = c.groupBy("src").agg(F.count(F.lit(1)).alias("n_claims"))
    trust = src_claims.select(
        "src", F.lit(1_000_000).cast("long").alias("trust")
    ).localCheckpoint(eager=True)
    win = None
    for t in range(rounds):
        scored = (
            c.join(trust, "src")
            .groupBy("entity", "attr", "value")
            .agg(
                F.sum("trust").alias("score"),
                F.count(F.lit(1)).alias("n_sources"),
            )
        )
        win = scored.groupBy("entity", "attr").agg(
            F.expr("min_by(value, struct(-score, value))").alias("fused_value"),
            F.max("score").alias("score"),
            F.expr("min_by(n_sources, struct(-score, value))").alias("n_sources"),
        ).localCheckpoint(eager=True)
        if t < rounds - 1:
            backing = (
                c.join(
                    win.select(
                        "entity", "attr", F.col("fused_value").alias("value")
                    ),
                    ["entity", "attr", "value"],
                )
                .groupBy("src")
                .agg(F.count(F.lit(1)).alias("n_backing"))
            )
            trust = (
                src_claims.join(backing, "src", "left")
                .select(
                    "src",
                    F.expr(
                        "CAST(coalesce(n_backing, 0L) * 1000000L"
                        " DIV n_claims AS LONG)"
                    ).alias("trust"),
                )
                .localCheckpoint(eager=True)
            )
    return win
