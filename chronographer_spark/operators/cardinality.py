"""Characteristic sets: structure-aware cardinality statistics for a
triple store (Neumann & Moerkotte, ICDE 2011 — the RDF-engine classic).

The characteristic set of a subject is the DISTINCT set of predicates it
carries; real KGs have very few distinct sets relative to subjects (schema
regularity), so the (set -> subject count, per-predicate multiplicity)
table is a tiny, exact synopsis that prices star joins far better than
independent per-predicate histograms. The reference has no optimizer
statistics at all (its scans are driver-ordered python loops); a
PySpark-native KG engine wants this both as a SCHEMA-DISCOVERY readout
(which entity shapes exist, how many of each) and as the star-join
estimator its own BGP compiler (graph/bgp.py selectivity ordering) can
consume.

Scale shape: two combinable aggregations — (subject, predicate) partial
counts, then a subject collapse carrying a sort_array(collect_set(...))
(bounded by the per-subject predicate count, tens not millions), then a
set collapse. No joins, no windows; every stage map-side combines. The
estimator is pure integer arithmetic over the synopsis (exact-quotient
discipline — no float drift between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "characteristic_sets",
    "star_cardinality_estimate",
]


def characteristic_sets(
    triples: DataFrame,
    subj_col: str = "subject",
    pred_col: str = "predicate",
) -> DataFrame:
    """(cs_key, n_subjects, n_triples): one row per distinct predicate
    set, keyed by the '|'-joined sorted predicate list (portable across
    engines), with how many subjects share the shape and how many triples
    they carry in total."""
    per = triples.groupBy(
        F.col(subj_col).alias("s"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    cs = per.groupBy("s").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("p"))).alias("cs_key"),
        F.sum("n").cast("long").alias("nt"),
    )
    return cs.groupBy("cs_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("nt").cast("long").alias("n_triples"),
    )


def star_cardinality_estimate(
    triples: DataFrame,
    preds: list[str],
    subj_col: str = "subject",
    pred_col: str = "predicate",
) -> DataFrame:
    """Price the star join ?s p1 ?o1 . ?s p2 ?o2 . ... from characteristic
    sets, next to the true cardinality for an accuracy readout.

    Estimate (the paper's multiplicity formula, exact integer form): for
    each characteristic set S ⊇ preds, the subjects of S contribute
    Π_p n_p(S) / n_subjects(S)^(k-1) result rows in expectation under
    within-set uniformity; summed over sets. For k=2 this is
    Σ_S n_p1(S)·n_p2(S) DIV n_subjects(S) — an exact integer quotient
    both engines replay bit-for-bit. True cardinality is
    Σ_s Π_p n_p(s), also exact.

    Returns one row: (est_rows, true_rows). est == true exactly when
    every subject inside a set carries the same per-predicate counts
    (the uniformity assumption the paper states); the gap IS the readout.
    Implemented for len(preds) == 2 (the canonical star-join benchmark
    shape); k > 2 nests the same quotient.
    """
    if len(preds) != 2:
        raise ValueError("star_cardinality_estimate implements k=2")
    p1, p2 = preds
    per = triples.groupBy(
        F.col(subj_col).alias("s"), F.col(pred_col).alias("p")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wide = per.groupBy("s").agg(
        F.concat_ws("|", F.sort_array(F.collect_set("p"))).alias("cs_key"),
        F.sum(F.when(F.col("p") == p1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("p") == p2, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    both = wide.filter((F.col("n1") > 0) & (F.col("n2") > 0))
    sets = both.groupBy("cs_key").agg(
        F.count(F.lit(1)).cast("long").alias("ns"),
        F.sum("n1").cast("long").alias("t1"),
        F.sum("n2").cast("long").alias("t2"),
    )
    est = sets.agg(
        F.sum(F.expr("t1 * t2 DIV ns")).cast("long").alias("est_rows")
    )
    true = both.agg(
        F.sum(F.col("n1") * F.col("n2")).cast("long").alias("true_rows")
    )
    return est.crossJoin(true)
