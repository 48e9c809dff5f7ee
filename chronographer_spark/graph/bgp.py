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
- `values` maps a variable to an allowed constant list (VALUES);
- constant predicates support property paths: `p|q` alternation, `^p`
  inverse, `p+` one-or-more (compiled to the iterative closure operator),
  composing as `^p+` / `p|q+` (see _resolve_path).

Scale shape: every pattern with a constant predicate compiles to a
predicate-restricted scan — partition-pruned against the
predicate-partitioned triples layout (io/catalog.write_triples); joins key
on node URIs (high cardinality). This is exactly the hand-written plan
shape of ng_queries, produced mechanically.
"""

from __future__ import annotations

import warnings
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

# a cross product whose BOTH sides are estimated above this many bytes
# raises instead of silently materializing (see _guard_product)
DEFAULT_PRODUCT_GUARD_BYTES = 64 << 20


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_vars(pattern: Pattern) -> set[str]:
    return {t[1:] for t in pattern if _is_var(t)}


def _order_patterns(patterns: Sequence[Pattern]) -> list[Pattern]:
    """Selectivity-greedy join order: start from the most-bound pattern
    (most constant terms, constant predicate breaking ties — it
    partition-prunes against the predicate-partitioned triples layout) and
    repeatedly add the most-bound pattern CONNECTED to the variables already
    bound; only when nothing connects does a new component begin. A user who
    lists the unselective pattern first no longer pays for it: the first
    scan is the narrow one, and every subsequent join has at least one
    equi-key into the already-bound result. Ties keep the user's order."""
    def score(p: Pattern) -> tuple[int, bool]:
        n_const = sum(0 if _is_var(t) else 1 for t in p)
        return (n_const, not _is_var(p[1]))

    remaining = list(patterns)
    ordered: list[Pattern] = []
    bound: set[str] = set()
    while remaining:
        if ordered:
            pool = [p for p in remaining if _pattern_vars(p) & bound] or remaining
        else:
            pool = remaining
        best = max(pool, key=lambda p: (score(p), -remaining.index(p)))
        ordered.append(best)
        remaining.remove(best)
        bound |= _pattern_vars(best)
    return ordered


def _estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (no job is run —
    parquet scans estimate from file sizes, filters apply selectivity)."""
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return size if isinstance(size, int) else int(size.toString())


def _guard_product(
    left: DataFrame, right: DataFrame, guard_bytes: int, group: Sequence[Pattern]
) -> None:
    """Disconnected pattern groups cartesian-join (SPARQL semantics) — legal,
    but a footgun at scale. Always warn; raise when BOTH sides' size
    estimates exceed `guard_bytes` (a small side — a VALUES-like single row,
    a heavily filtered scan — keeps the product cheap, so only a big×big
    product is refused). Relations without real statistics (e.g. local test
    relations) report ~Long.MaxValue-scaled estimates — treated as UNKNOWN
    and never refused, only warned; file-backed triples (the production
    path) carry true file-size stats."""
    unknown = 1 << 60
    lb, rb = _estimated_bytes(left), _estimated_bytes(right)
    msg = (
        f"BGP group {list(group)!r} contains patterns with no shared "
        f"variable: SPARQL semantics require a cross product "
        f"(~{lb}B x ~{rb}B estimated)"
    )
    if unknown > lb > guard_bytes and unknown > rb > guard_bytes:
        raise ValueError(
            msg + f"; both sides exceed product_guard_bytes={guard_bytes}. "
            "Connect the patterns through a shared variable, pre-filter a "
            "side, or raise product_guard_bytes to accept the product."
        )
    warnings.warn(msg, stacklevel=3)


def _resolve_path(triples: DataFrame, p_term) -> DataFrame:
    """SPARQL property-path support for constant predicate terms
    (the path subset the reference's query surface needs beyond plain
    BGPs): `p|q` alternation, `^p` inverse, `p+` one-or-more — compiled
    respectively to an isin() scan, a subject/object swap, and the
    iterative transitive-closure operator (operators/graph_algos.py).
    Combinations compose outside-in: `^p+` is the closure of inverted
    edges, `(p|q)+` — written `p|q+` since terms are unparenthesized —
    closes over the union of both predicates.

    Returns `triples` untouched for variables and plain constants. A `+`
    path runs the closure loop EAGERLY here (per-round localCheckpoint
    jobs) — the same compile-time-execution caveat as similarity's
    _infer_dim, noted so callers on hot paths know a path pattern is not
    free to construct. The resolved relation's predicate column is set to
    the ORIGINAL term so the generic constant filter downstream matches.
    """
    if not isinstance(p_term, str) or _is_var(p_term):
        return triples
    inv = p_term.startswith("^")
    core = p_term[1:] if inv else p_term
    plus = core.endswith("+")
    alts = (core[:-1] if plus else core).split("|")
    if not (inv or plus or len(alts) > 1):
        return triples
    rel = triples.filter(F.col("predicate").isin(alts)).select(
        "subject", "predicate", "object"
    )
    if inv:
        rel = rel.select(
            F.col("object").alias("subject"),
            "predicate",
            F.col("subject").alias("object"),
        )
    if plus:
        from ..operators.graph_algos import transitive_closure

        edges = rel.select(
            F.col("subject").alias("child"), F.col("object").alias("parent")
        )
        rel = transitive_closure(edges).select(
            F.col("child").alias("subject"),
            F.col("ancestor").alias("object"),
        )
    return rel.select(
        "subject", F.lit(p_term).alias("predicate"), "object"
    )


def _compile_pattern(triples: DataFrame, pattern: Pattern) -> tuple[DataFrame, list[str]]:
    """One triple pattern -> (DataFrame with one column per variable, vars)."""
    scan = _resolve_path(triples, pattern[1])
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
    triples: DataFrame,
    patterns: Sequence[Pattern],
    product_guard_bytes: int = DEFAULT_PRODUCT_GUARD_BYTES,
) -> tuple[DataFrame, list[str]]:
    result: DataFrame | None = None
    bound: list[str] = []
    for pattern in _order_patterns(patterns):
        part, pvars = _compile_pattern(triples, pattern)
        if result is None:
            result, bound = part, pvars
            continue
        shared = [v for v in pvars if v in bound]
        if shared:
            result = result.join(part, shared)
        else:
            _guard_product(result, part, product_guard_bytes, patterns)
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
    minus: Sequence[Sequence[Pattern]] = (),
    product_guard_bytes: int = DEFAULT_PRODUCT_GUARD_BYTES,
) -> DataFrame:
    """Match a basic graph pattern; returns one column per variable.

    `optional` is a list of pattern GROUPS, each left-joined on the
    variables it shares with the required part (SPARQL OPTIONAL); `values`
    restricts a variable to a constant list (SPARQL VALUES); `minus` is a
    list of pattern groups whose solutions are REMOVED (SPARQL MINUS):
    a left anti-join on the shared variables. Per the SPARQL spec, a
    MINUS group sharing NO variable with the required part removes
    nothing — here that degenerate case raises instead (it is always a
    query bug), mirroring the OPTIONAL guard.

    Patterns are joined in selectivity-greedy order (_order_patterns), not
    user order. Disconnected patterns cross-join with a warning; a big×big
    product (both sides estimated over `product_guard_bytes`) raises.
    """
    result, bound = _join_group(triples, patterns, product_guard_bytes)
    for group in optional:
        part, pvars = _join_group(triples, group, product_guard_bytes)
        shared = [v for v in pvars if v in bound]
        if not shared:
            raise ValueError(
                f"optional group {group!r} shares no variable with the required part"
            )
        result = result.join(part, shared, "left")
        bound += [v for v in pvars if v not in bound]
    for group in minus:
        part, pvars = _join_group(triples, group, product_guard_bytes)
        shared = [v for v in pvars if v in bound]
        if not shared:
            raise ValueError(
                f"minus group {group!r} shares no variable with the required "
                "part (SPARQL says it would remove nothing)"
            )
        result = result.join(
            part.select(*shared).dropDuplicates(), shared, "left_anti"
        )
    if values:
        for var, allowed in values.items():
            result = result.filter(F.col(var).isin(list(allowed)))
    return result
