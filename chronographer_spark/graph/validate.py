"""SHACL-lite shape validation over a triple table — the data-quality gate
a production KG build runs before publishing a snapshot.

The reference emits its graph without a validation pass (rdflib serialize,
src/graph_creation.py); at 100 TB a silent shape break (an event missing
its ordering edge, a malformed timestamp) poisons every downstream join,
so the engine ships a declarative validator in the spirit of SHACL's
sh:minCount / sh:maxCount / sh:pattern / sh:class constraints — the subset
that covers the event-schema invariants the reference's own queries assume
(every event typed, timestamped, ordered; sparql_queries.py relies on all
three).

Each rule compiles to one subject-keyed aggregation or anti-join over the
triple scan — no rule is more than a shuffle on the subject key, and rules
evaluate independently (a UNION of per-rule reports). For many rules over
one graph, eager-checkpoint the triples first (the shared-subtree
discipline) so the scan happens once.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shape_report(
    triples: DataFrame, rules: Sequence[Mapping]
) -> DataFrame:
    """Evaluate shape rules; returns (rule_id, focus, detail) violations
    (empty DataFrame = graph conforms).

    Rule kinds (dict with "kind", optional "id", plus per-kind keys):
      min_count:   subjects in the focus set (those bearing `focus_pred`,
                   default rdf:type) must have >= `min` triples of `pred`;
                   detail = actual count.
      max_count:   no subject may have > `max` triples of `pred`;
                   detail = actual count.
      range_regex: every object of `pred` must match `regex` (anchor with
                   ^...$ for full-match; pattern must stay in the
                   RE2/Java-portable subset, same discipline as scrub_pii);
                   detail = offending object value.
      domain_type: every subject of `pred` must carry (rdf:type, `type`);
                   detail = 'missing type <type>'.
    """
    reports: list[DataFrame] = []
    for i, rule in enumerate(rules):
        rid = F.lit(str(rule.get("id", f"rule{i}"))).alias("rule_id")
        kind = rule["kind"]
        if kind == "min_count":
            focus_pred = rule.get("focus_pred", "rdf:type")
            focus = (
                triples.filter(F.col("predicate") == focus_pred)
                .select("subject")
                .dropDuplicates()
            )
            cnt = (
                triples.filter(F.col("predicate") == rule["pred"])
                .groupBy("subject")
                .agg(F.count(F.lit(1)).alias("_c"))
            )
            v = (
                focus.join(cnt, "subject", "left")
                .filter(F.coalesce("_c", F.lit(0)) < int(rule["min"]))
                .select(
                    rid,
                    F.col("subject").alias("focus"),
                    F.coalesce("_c", F.lit(0)).cast("string").alias("detail"),
                )
            )
        elif kind == "max_count":
            v = (
                triples.filter(F.col("predicate") == rule["pred"])
                .groupBy("subject")
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > int(rule["max"]))
                .select(
                    rid,
                    F.col("subject").alias("focus"),
                    F.col("_c").cast("string").alias("detail"),
                )
            )
        elif kind == "range_regex":
            v = (
                triples.filter(
                    (F.col("predicate") == rule["pred"])
                    & ~F.col("object").rlike(rule["regex"])
                )
                .select(
                    rid,
                    F.col("subject").alias("focus"),
                    F.col("object").alias("detail"),
                )
            )
        elif kind == "domain_type":
            typed = (
                triples.filter(
                    (F.col("predicate") == "rdf:type")
                    & (F.col("object") == rule["type"])
                )
                .select("subject")
                .dropDuplicates()
            )
            v = (
                triples.filter(F.col("predicate") == rule["pred"])
                .select("subject")
                .dropDuplicates()
                .join(typed, "subject", "left_anti")
                .select(
                    rid,
                    F.col("subject").alias("focus"),
                    F.lit(f"missing type {rule['type']}").alias("detail"),
                )
            )
        else:
            raise ValueError(f"unknown rule kind {kind!r}")
        reports.append(v)
    if not reports:
        raise ValueError("shape_report requires at least one rule")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
