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
