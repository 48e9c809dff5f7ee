"""Set-oriented frontier expansion.

The reference expands one node at a time through HDT index lookups
(reference: src/interface.py:119-163, driven per node in
src/framework.py:546-556). Here the whole frontier expands in ONE pass:
three hash joins against the triple table (the north rule's "iterative
DataFrame self-joins"), executor-parallel, broadcast when the frontier is
small.

Direction semantics (interface.py:173-179):
- ingoing:  (s, p, n) for frontier node n  -> join on object
- outgoing: (n, p, o) for frontier node n  -> join on subject
- spec. outgoing: for every neighbor found, its rdf:type + date triples
  (interface.py:146-163) -> 2-hop semi-join restricted to `default_preds`
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expand_frontier(
    triples: DataFrame,
    frontier: DataFrame,
    predicate_filter: list[str] | None = None,
    default_preds: list[str] | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (ingoing, outgoing, type_date) for the whole frontier at once.

    `frontier` has one column `node`. `predicate_filter` is the drop list
    (F1, interface.py:44-50); `default_preds` the type/date predicates for
    the 2-hop lookup (J3).
    """
    f = frontier.select("node").dropDuplicates()
    if broadcast_frontier:
        f = F.broadcast(f)

    base = triples
    if predicate_filter:
        base = base.filter(~F.col("predicate").isin(predicate_filter))

    ingoing = base.join(f, base["object"] == f["node"], "left_semi").select(
        "subject", "predicate", "object"
    )
    outgoing = base.join(f, base["subject"] == f["node"], "left_semi").select(
        "subject", "predicate", "object"
    )

    # neighbors = ingoing subjects + outgoing objects (skip literals)
    neighbors = (
        ingoing.select(F.col("subject").alias("node"))
        .unionByName(outgoing.select(F.col("object").alias("node")))
        .filter(F.col("node").startswith("http"))
        .dropDuplicates()
    )
    spec = triples
    if default_preds:
        spec = spec.filter(F.col("predicate").isin(default_preds))
    type_date = spec.join(
        neighbors, spec["subject"] == neighbors["node"], "left_semi"
    ).select("subject", "predicate", "object")

    return ingoing, outgoing, type_date


def keep_set(
    type_date: DataFrame,
    to_discard: DataFrame,
    target_classes: list[str],
    superclasses: DataFrame | None,
) -> DataFrame:
    """F9 — subgraph admission (expansion.py:104-112): nodes typed with a
    target class, or with any class whose superclass chain hits a target,
    minus the discard set."""
    spark = type_date.sparkSession
    admitted = spark.createDataFrame(
        [(c,) for c in target_classes], ["cls"]
    )
    if superclasses is not None:
        # classes whose ancestor set intersects the targets
        tgt = F.array([F.lit(t) for t in target_classes])
        extra = (
            superclasses.filter(F.arrays_overlap("ancestors", tgt))
            .select(F.col("class").alias("cls"))
        )
        admitted = admitted.unionByName(extra).dropDuplicates()

    keep = (
        type_date.join(F.broadcast(admitted), type_date["object"] == admitted["cls"], "left_semi")
        .select(F.col("subject").alias("node"))
        .dropDuplicates()
        .join(to_discard, "node", "left_anti")
    )
    return keep


def split_subgraph_pending(
    ingoing: DataFrame,
    outgoing: DataFrame,
    type_date: DataFrame,
    to_discard: DataFrame,
    target_classes: list[str],
    superclasses: DataFrame | None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """F9/F10 — (subgraph_in, pending_in, subgraph_out, pending_out).

    Empty-type edge case (expansion.py:93-98): when type_date is empty, all
    neighbors are discarded — pending comes out empty because every node
    anti-joins against itself via the discard set.
    """
    if type_date.limit(1).count() == 0:
        empty = ingoing.sparkSession.createDataFrame([], ingoing.schema)
        return empty, empty, empty, empty

    keep = keep_set(type_date, to_discard, target_classes, superclasses)

    sub_in = ingoing.join(
        keep, ingoing["subject"] == keep["node"], "left_semi"
    ).select("subject", "predicate", "object")
    pend_in = ingoing.join(
        to_discard, ingoing["subject"] == to_discard["node"], "left_anti"
    ).select("subject", "predicate", "object")
    sub_out = outgoing.join(
        keep, outgoing["object"] == keep["node"], "left_semi"
    ).select("subject", "predicate", "object")
    pend_out = outgoing.join(
        to_discard, outgoing["object"] == to_discard["node"], "left_anti"
    ).select("subject", "predicate", "object")
    return sub_in, pend_in, sub_out, pend_out
