"""Scan-level triple filters (applied immediately after the source scan).

Re-expression of the reference interface's post-scan filter chain
(reference: src/interface.py:44-117): predicate keep/drop (F1), namespace
filter (F2), node prefix/suffix filter (F3), literal normalization (F4).
All are native boolean/string expressions — Catalyst pushes the predicate
parts into the parquet scan (check `.explain` PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_predicates(
    triples: DataFrame, predicates: list[str], keep: bool = False
) -> DataFrame:
    """F1 — predicate keep/drop list (interface.py:44-50)."""
    cond = F.col("predicate").isin(predicates)
    return triples.filter(cond if keep else ~cond)


def filter_namespace(triples: DataFrame, start_uri: str) -> DataFrame:
    """F2 — keep a triple iff each endpoint is in-namespace or a literal
    (interface.py:74-84: node kept when it starts with `start_uri` or is not
    an http URI / quoted literal)."""

    def ok(col):
        return (
            F.col(col).startswith(start_uri)
            | (~F.col(col).startswith("http") & ~F.col(col).startswith('"'))
        )

    return triples.filter(ok("subject") & ok("object"))


def filter_node_affixes(
    triples: DataFrame,
    drop_prefixes: list[str] | None = None,
    drop_suffixes: list[str] | None = None,
) -> DataFrame:
    """F3 — drop triples whose subject/object starts with any `drop_prefixes`
    (e.g. dbr:Category:) or ends with any `drop_suffixes` (e.g. .svg)
    (interface.py:100-110)."""
    cond = F.lit(True)
    for p in drop_prefixes or []:
        cond = cond & ~F.col("subject").startswith(p) & ~F.col("object").startswith(p)
    for s in drop_suffixes or []:
        cond = cond & ~F.col("subject").endswith(s) & ~F.col("object").endswith(s)
    return triples.filter(cond)


def normalize_literals(triples: DataFrame) -> DataFrame:
    """F4 — literal cleanup (interface.py:86-98, 112-117):

    - drop `"Unknown"@...` values,
    - `"....-..-..T..."^^xsd:date|dateTime` -> ISO day slice [1:11],
    - `"...."^^xsd:integer|gYear` -> year slice [1:5].
    The slices replicate the reference's `x[1:11]` / `x[1:5]` (the leading
    quote occupies index 0, so substring(2, 10) / substring(2, 4))."""
    obj = F.col("object")
    is_date = obj.contains("^^") & (
        obj.contains("XMLSchema#date") | obj.contains("XMLSchema#dateTime")
    )
    is_year = obj.contains("^^") & (
        obj.contains("XMLSchema#integer") | obj.contains("XMLSchema#gYear")
    )
    cleaned = (
        F.when(is_date, F.substring(obj, 2, 10))
        .when(is_year, F.substring(obj, 2, 4))
        .otherwise(obj)
    )
    return triples.filter(~obj.startswith('"Unknown"')).withColumn("object", cleaned)
