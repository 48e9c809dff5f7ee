"""Evaluation metrics.

Event-level P/R/F1 (reference: src/metrics.py:62-115): found events vs a
gold-standard list, with alias->canonical rewriting applied to BOTH sides
before comparison (metrics.py:104-106 f_change). Join-based TP/FP/FN — pure
narrow aggregates.

Triple-level per-predicate P/R/F1 (reference: src/build_ng/
sem_comparison.py:26-96): intersect/diff of triple sets restricted to the
scored SEM predicates. NOTE the reference swaps the usual naming — its
"precision" divides by (common + gold-only) and its "recall" by
(common + constructed-only) (sem_comparison.py:63-75); we replicate its
formulas exactly for parity and expose them under the reference's names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .linking.canonicalize import apply_referents
from .vocab import NF_TO_PRED

SCORED_PREDICATES = [
    NF_TO_PRED["who"],
    NF_TO_PRED["where"],
    NF_TO_PRED["when_bts"],
    NF_TO_PRED["when_ets"],
]


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if (p + r) else 0.0


def event_metrics(
    found: DataFrame,
    gold: DataFrame,
    referents: DataFrame | None = None,
    col: str = "event",
) -> dict:
    """Event-level P/R/F1 after canonicalization of both sides (A6)."""
    f = found.select(col).dropDuplicates()
    g = gold.select(col).dropDuplicates()
    if referents is not None:
        f = apply_referents(f, referents, col).dropDuplicates()
        g = apply_referents(g, referents, col).dropDuplicates()
    tp = f.join(g, col, "inner").count()
    fp = f.join(g, col, "left_anti").count()
    fn = g.join(f, col, "left_anti").count()
    p = tp / (tp + fp) if (tp + fp) else 0.0
    r = tp / (tp + fn) if (tp + fn) else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": p, "recall": r, "f1": _f1(p, r)}


def triple_set_compare(
    constructed: DataFrame, gold: DataFrame, predicates: list[str] | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(common, gold_only, constructed_only) triple sets (J9/U4),
    restricted to the scored predicates (sem_comparison.py:46-47)."""
    preds = predicates or SCORED_PREDICATES
    cols = ["subject", "predicate", "object"]
    c = constructed.select(cols).filter(F.col("predicate").isin(preds)).dropDuplicates()
    g = gold.select(cols).filter(F.col("predicate").isin(preds)).dropDuplicates()
    common = c.intersect(g)
    gold_only = g.exceptAll(common)
    constructed_only = c.exceptAll(common)
    return common, gold_only, constructed_only


def triple_metrics(
    constructed: DataFrame, gold: DataFrame, predicates: list[str] | None = None
) -> dict:
    """Per-predicate + overall P/R/F1 with the reference's (swapped) formulas
    (sem_comparison.py:63-75): precision = common/(common+gold_only),
    recall = common/(common+constructed_only)."""
    common, gold_only, constructed_only = triple_set_compare(
        constructed, gold, predicates
    )

    def per_pred(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("predicate").agg(F.count("*").alias(name))

    counts = (
        per_pred(common, "common")
        .join(per_pred(gold_only, "gold_only"), "predicate", "full")
        .join(per_pred(constructed_only, "constructed_only"), "predicate", "full")
        .na.fill(0)
    )
    out: dict = {"per_predicate": {}}
    tot_c = tot_g = tot_o = 0
    for row in counts.collect():
        c, g, o = row["common"], row["gold_only"], row["constructed_only"]
        tot_c, tot_g, tot_o = tot_c + c, tot_g + g, tot_o + o
        p = c / (c + g) if (c + g) else 0.0
        r = c / (c + o) if (c + o) else 0.0
        out["per_predicate"][row["predicate"]] = {
            "common": c, "gold_only": g, "constructed_only": o,
            "precision": p, "recall": r, "f1": _f1(p, r),
        }
    p = tot_c / (tot_c + tot_g) if (tot_c + tot_g) else 0.0
    r = tot_c / (tot_c + tot_o) if (tot_c + tot_o) else 0.0
    out["all"] = {
        "common": tot_c, "gold_only": tot_g, "constructed_only": tot_o,
        "precision": p, "recall": r, "f1": _f1(p, r),
    }
    return out
