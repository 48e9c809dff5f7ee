"""Predicate domain/range constraint extraction — the reference's
pre-search pass (src/extract_domain_range.py) re-expressed as declarative
joins over a triple DataFrame instead of per-predicate HDT requests.

Reference behavior mirrored:
- dbpedia/yago/coda path (extract_domain_range.py:92-101 get_pred): scan
  triples whose predicate is the profile's domain/range predicate; the
  pred -> values dict becomes distinct (predicate, kind, value) rows.
- YAGO union templates (extract_domain_range.py:63-90 pre_process_yago):
  blank-node objects `_:schema-...-owl-unionOf-a-b-xsd-c` expand to one
  row per constraint with the short prefix rewritten
  (schema -> http://schema.org/, xsd -> XMLSchema#).
- wikidata path (extract_domain_range.py:103-134 get_type_wikidata): the
  2-hop walk pred -[P2302 direct, object = domain/range Q-id]-> pred
  -[P2302 prop]-> statement -[P2308 qualifier]-> class type. The
  reference loops per predicate and per statement (one HDT request
  each); here both hops are hash joins, so the walk is two shuffles at
  any KB size and hub predicates (thousands of statements) ride AQE.

The reference materializes these as JSON dicts keyed by predicate
(__call__, extract_domain_range.py:155-175); distinct rows are the
relational, mergeable form — `ordering.annotate_superclasses` consumes
them as a lookup join either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHORT_PREFIX = {
    "schema": "http://schema.org/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def extract_domain_range(
    triples: DataFrame,
    domain_pred: str,
    range_pred: str,
    expand_yago_unions: bool = False,
) -> DataFrame:
    """Direct declared constraints: (predicate, kind in ('domain','range'),
    value). One predicate-pushdown scan per kind, unioned; with
    ``expand_yago_unions`` the YAGO blank-node union template explodes to
    one row per member (reference pre_process_yago semantics)."""
    base = triples.filter(
        F.col("predicate").isin([domain_pred, range_pred])
    ).select(
        F.col("subject").alias("pred"),
        F.when(F.col("predicate") == domain_pred, F.lit("domain"))
        .otherwise(F.lit("range"))
        .alias("kind"),
        F.col("object").alias("value"),
    )
    if not expand_yago_unions:
        return base.dropDuplicates()
    parts = F.split(
        F.element_at(F.split(F.col("value"), F.lit("owl-unionOf-")), 2), "-"
    )
    pairs = F.transform(
        F.sequence(F.lit(0), F.floor(F.size(parts) / 2).cast("int") - 1),
        lambda i: F.concat(
            # short prefix -> full URI; unknown prefixes kept verbatim
            F.coalesce(
                F.element_at(
                    F.create_map(
                        *[
                            F.lit(x)
                            for kv in _SHORT_PREFIX.items()
                            for x in kv
                        ]
                    ),
                    F.element_at(parts, i * 2 + 1),
                ),
                F.element_at(parts, i * 2 + 1),
            ),
            F.element_at(parts, i * 2 + 2),
        ),
    )
    expanded = base.select(
        "pred",
        "kind",
        F.explode(
            F.when(F.col("value").startswith("_:"), pairs).otherwise(
                F.array(F.col("value"))
            )
        ).alias("value"),
    )
    return expanded.dropDuplicates()


def extract_constraint_classes(
    triples: DataFrame,
    constraint_kind_obj: str,
    constraint_direct: str,
    constraint_prop: str,
    class_qualifier: str,
) -> DataFrame:
    """Wikidata 2-hop constraint walk: predicates carrying a P2302 direct
    constraint whose object is ``constraint_kind_obj`` (the domain or
    range Q-id), joined to their P2302 statement nodes, joined to the
    statements' P2308 class qualifiers. Returns distinct
    (pred, class_type) — the reference's pred_to_class dict as rows."""
    flagged = (
        triples.filter(
            (F.col("predicate") == constraint_direct)
            & (F.col("object") == constraint_kind_obj)
        )
        .select(F.col("subject").alias("pred"))
        .dropDuplicates()
    )
    statements = triples.filter(F.col("predicate") == constraint_prop).select(
        F.col("subject").alias("pred"), F.col("object").alias("statement")
    )
    classes = triples.filter(F.col("predicate") == class_qualifier).select(
        F.col("subject").alias("statement"), F.col("object").alias("class_type")
    )
    return (
        flagged.join(statements, "pred")
        .join(classes, "statement")
        .select("pred", "class_type")
        .dropDuplicates()
    )
