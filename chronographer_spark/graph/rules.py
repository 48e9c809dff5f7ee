"""AMIE-lite Horn-rule mining over the constructed knowledge graph.

Mines closed path rules  p1(x, y) ∧ p2(y, z) ⇒ head(x, z)  with support and
standard confidence (Galárraga et al. 2013, "AMIE: Association Rule Mining
under Incomplete Evidence in Ontological Knowledge Bases" — the length-2
closed-rule core, without the PCA-confidence denominator). Beyond the
reference (/root/reference constructs graphs but never mines them); included
because rule mining is the canonical next step a KG-construction pipeline
feeds: learned rules drive link prediction and error detection on the graph
this engine builds.

Counting semantics:
- The body is the set of DISTINCT endpoint bindings (x, p1, p2, z) of
  length-2 paths — distinct BEFORE the head join, so a pair connected by
  several bridge nodes y counts once (AMIE counts head instantiations,
  not paths).
- support(p1, p2, head) = |{(x, z) in body : head(x, z) ∈ G}|.
- std confidence = support / n_pairs(p1, p2), emitted as the exact integer
  quotient support*1e6 DIV n_pairs (the repo's ratio-column rule — no
  floats, no grid snapping).

Scale design:
- The length-2 path join is THE wedge join — its output is
  Σ_y in_deg(y)·out_deg(y), quadratic at hub bridge nodes. Unlike
  metapath_counts (which needs only pair COUNTS and uses the
  degree-product identity to avoid materializing paths), rule mining
  genuinely needs the endpoint bindings, so the join is irreducible.
  Budget it BEFORE paying for it: `max_est_paths` computes the exact
  degree-product estimate with two aggs + one mid-keyed join (the
  metapath-census algebra) and raises if the wedge output would exceed
  the budget — the same guard-don't-guess posture as the BGP
  disconnected-product guard and cms_join_size_estimate.
- `predicates=` restricts body/head predicates scan-side (pushdown), the
  practical knob after the census names the expensive pairs.
- The distinct body feeds BOTH the n_pairs denominator agg and the
  support join — a shared subtree, eagerly localCheckpoint-ed once
  (the minhash-bands / tf-idf re-execution rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["mine_path_rules"]


def mine_path_rules(
    g: DataFrame,
    min_support: int = 1,
    subject_col: str = "subject",
    predicate_col: str = "predicate",
    object_col: str = "object",
    predicates: list[str] | None = None,
    max_est_paths: int | None = None,
) -> DataFrame:
    """(p1, p2, head_pred, support, n_pairs, conf_x1e6) for every length-2
    rule body with at least one head match and support >= min_support.

    Reflexive bindings (x == z) are kept — same convention both engines
    replay. With `max_est_paths`, raises ValueError when the exact wedge
    output size (degree-product identity) exceeds the budget; restrict
    `predicates` or mine per-pair after consulting metapath_counts.
    """
    t = g.select(
        F.col(subject_col).alias("s"),
        F.col(predicate_col).alias("p"),
        F.col(object_col).alias("o"),
    )
    if predicates is not None:
        t = t.where(F.col("p").isin(list(predicates)))

    if max_est_paths is not None:
        ind = t.groupBy(F.col("o").alias("mid")).agg(
            F.count(F.lit(1)).alias("d_in")
        )
        outd = t.groupBy(F.col("s").alias("mid")).agg(
            F.count(F.lit(1)).alias("d_out")
        )
        est = ind.join(outd, "mid").agg(
            F.sum(F.col("d_in") * F.col("d_out")).alias("n")
        ).collect()[0]["n"] or 0
        if est > max_est_paths:
            raise ValueError(
                f"estimated wedge output {est} paths exceeds budget "
                f"{max_est_paths}; restrict `predicates` (consult "
                "metapath_counts for the per-pair census) or raise the budget"
            )

    a, b = t.alias("a"), t.alias("b")
    body = (
        a.join(b, F.col("a.o") == F.col("b.s"))
        .select(
            F.col("a.s").alias("x"),
            F.col("a.p").alias("p1"),
            F.col("b.p").alias("p2"),
            F.col("b.o").alias("z"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_pairs = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    heads = t.select(
        F.col("s").alias("x"), F.col("p").alias("head_pred"), F.col("o").alias("z")
    )
    support = (
        body.join(heads, ["x", "z"])
        .groupBy("p1", "p2", "head_pred")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .where(F.col("support") >= min_support)
    )
    return support.join(n_pairs, ["p1", "p2"]).select(
        "p1",
        "p2",
        "head_pred",
        "support",
        "n_pairs",
        F.expr("CAST(support * 1000000 DIV n_pairs AS BIGINT)").alias(
            "conf_x1e6"
        ),
    )
