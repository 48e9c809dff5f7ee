"""Basic-graph-pattern matching over the triples table.

The reference's downstream query surface is SPARQL basic graph patterns
(reference: experiments_run/usage_ng/sparql_queries.py — WHERE clauses of
triple patterns with shared variables, OPTIONAL blocks, and VALUES
restrictions, issued over the built NG). graph/ng_queries.py hand-writes
the shipped queries; this module is the general surface: a declarative BGP
-> DataFrame compiler, so a user can express any of the reference's
CONSTRUCT/SELECT WHERE shapes without writing joins.

Semantics (the SPARQL subset the reference uses):
- a pattern is a (s, p, o) triple of terms; "?x" terms are variables,
  anything else is a constant filter;
- shared variables across patterns become equi-join keys; patterns with no
  shared variable cross-join (SPARQL cartesian semantics);
- `optional` pattern groups left-join on their shared variables (OPTIONAL);
- `values` maps a variable to an allowed constant list (VALUES).

Scale shape: every pattern with a constant predicate compiles to a
predicate-restricted scan — partition-pruned against the
predicate-partitioned triples layout (io/catalog.write_triples); joins key
on node URIs (high cardinality). This is exactly the hand-written plan
shape of ng_queries, produced mechanically.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]


def _compile_pattern(triples: DataFrame, pattern: Pattern) -> tuple[DataFrame, list[str]]:
    """One triple pattern -> (DataFrame with one column per variable, vars)."""
    scan = triples
    var_cols: dict[str, list[str]] = {}
    for term, col in zip(pattern, ("subject", "predicate", "object")):
        if isinstance(term, str) and term.startswith("?"):
            var_cols.setdefault(term[1:], []).append(col)
        else:
            scan = scan.filter(F.col(col) == term)
    # repeated variable within one pattern (?x p ?x) => equality filter
    for cols in var_cols.values():
        for extra in cols[1:]:
            scan = scan.filter(F.col(cols[0]) == F.col(extra))
    out = scan.select(
        *[F.col(cols[0]).alias(var) for var, cols in var_cols.items()]
    )
    return out, list(var_cols)


def _join_group(
    triples: DataFrame, patterns: Sequence[Pattern]
) -> tuple[DataFrame, list[str]]:
    result: DataFrame | None = None
    bound: list[str] = []
    for pattern in patterns:
        part, pvars = _compile_pattern(triples, pattern)
        if result is None:
            result, bound = part, pvars
            continue
        shared = [v for v in pvars if v in bound]
        if shared:
            result = result.join(part, shared)
        else:
            result = result.crossJoin(part)
        bound += [v for v in pvars if v not in bound]
    if result is None:
        raise ValueError("empty pattern group")
    return result, bound


def bgp(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    optional: Sequence[Sequence[Pattern]] = (),
    values: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """Match a basic graph pattern; returns one column per variable.

    `optional` is a list of pattern GROUPS, each left-joined on the
    variables it shares with the required part (SPARQL OPTIONAL); `values`
    restricts a variable to a constant list (SPARQL VALUES).
    """
    result, bound = _join_group(triples, patterns)
    for group in optional:
        part, pvars = _join_group(triples, group)
        shared = [v for v in pvars if v in bound]
        if not shared:
            raise ValueError(
                f"optional group {group!r} shares no variable with the required part"
            )
        result = result.join(part, shared, "left")
        bound += [v for v in pvars if v not in bound]
    if values:
        for var, allowed in values.items():
            result = result.filter(F.col(var).isin(list(allowed)))
    return result
