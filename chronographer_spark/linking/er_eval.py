"""Clustering / entity-resolution evaluation: pairwise P/R/F1 and B-cubed.

The reference evaluates its constructed graph with set-overlap P/R/F1 at the
event and triple level (reference: src/evaluation.py — precision/recall over
emitted vs gold triples). An ER stage needs the corresponding CLUSTERING
metrics: given a predicted entity clustering (e.g. the component ids from
linking/canonicalize.connected_components) and a gold clustering, report

  - pairwise precision / recall / F1 over co-clustered record pairs
    (the Fellegi-Sunter-era standard), and
  - B-cubed precision / recall (Bagga & Baldwin 1998), the per-record
    average used by coreference evaluations — robust to one giant cluster
    dominating the pair counts.

Neither metric is computed by materializing pairs. Every quantity reduces
to aggregations over the (pred, gold) CONTINGENCY CELLS:

  pairs within pred clusters  = sum n_p * (n_p - 1) / 2
  pairs within gold clusters  = sum n_g * (n_g - 1) / 2
  true-positive pairs         = sum c * (c - 1) / 2        (c = cell count)
  B3 precision                = avg over records of c / n_p
                              = (1/N) * sum_cells c * (c / n_p)
  B3 recall                   = (1/N) * sum_cells c * (c / n_g)

so the plan is three partial-aggregated shuffles on the label columns
(records -> cells, -> pred sizes, -> gold sizes), two joins of the tiny
cell table against the size tables, and single-row crossJoins — no pair
explosion, no windows; a 10^12-record input with a hub cluster of 10^9
members costs the same three combinable aggs (the hub never sorts or
enumerates its pairs).

Float discipline (CLAUDE.md): every ratio is an exact integer quotient
`x * 1e6 DIV y` (per-record B3 quotients are computed per CELL, then
vote-weighted and averaged with a second DIV), so DuckDB replays every
output bit-for-bit with `//`. Division by zero -> NULL via nullif in both
engines (empty input or all-singleton clusterings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clustering_eval(
    labeled: DataFrame,
    pred_col: str = "pred",
    gold_col: str = "gold",
) -> DataFrame:
    """Evaluate a predicted clustering against gold labels.

    labeled: one row per record carrying its predicted cluster id
      (`pred_col`, e.g. the `component` from connected_components) and its
      gold entity id (`gold_col`). Any orderable types.

    Returns ONE row:
      n_records, n_pred (clusters), n_gold (entities),
      pred_pairs, gold_pairs, tp_pairs,
      pair_p_x1e6, pair_r_x1e6, pair_f1_x1e6  (exact integer quotients),
      b3_p_x1e6, b3_r_x1e6                    (macro per-record averages).
    """
    pred, gold = F.col(pred_col), F.col(gold_col)
    cells = labeled.groupBy(pred.alias("p"), gold.alias("g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    pred_sizes = labeled.groupBy(pred.alias("p")).agg(
        F.count(F.lit(1)).alias("np")
    )
    gold_sizes = labeled.groupBy(gold.alias("g")).agg(
        F.count(F.lit(1)).alias("ng")
    )
    cell_stats = (
        cells.join(pred_sizes, "p")
        .join(gold_sizes, "g")
        .agg(
            F.sum("c").alias("n_records"),
            F.sum(F.expr("c * (c - 1) DIV 2")).alias("tp_pairs"),
            F.sum(F.expr("c * ((c * 1000000) DIV np)")).alias("b3_p_total"),
            F.sum(F.expr("c * ((c * 1000000) DIV ng)")).alias("b3_r_total"),
        )
    )
    pred_stats = pred_sizes.agg(
        F.count(F.lit(1)).alias("n_pred"),
        F.sum(F.expr("np * (np - 1) DIV 2")).alias("pred_pairs"),
    )
    gold_stats = gold_sizes.agg(
        F.count(F.lit(1)).alias("n_gold"),
        F.sum(F.expr("ng * (ng - 1) DIV 2")).alias("gold_pairs"),
    )
    return (
        cell_stats.crossJoin(pred_stats)
        .crossJoin(gold_stats)
        .select(
            F.coalesce("n_records", F.lit(0)).alias("n_records"),
            "n_pred",
            "n_gold",
            F.coalesce("pred_pairs", F.lit(0)).alias("pred_pairs"),
            F.coalesce("gold_pairs", F.lit(0)).alias("gold_pairs"),
            F.coalesce("tp_pairs", F.lit(0)).alias("tp_pairs"),
            F.expr(
                "tp_pairs * 1000000 DIV nullif(pred_pairs, 0)"
            ).alias("pair_p_x1e6"),
            F.expr(
                "tp_pairs * 1000000 DIV nullif(gold_pairs, 0)"
            ).alias("pair_r_x1e6"),
            F.expr(
                "2 * tp_pairs * 1000000 DIV nullif(pred_pairs + gold_pairs, 0)"
            ).alias("pair_f1_x1e6"),
            F.expr("b3_p_total DIV nullif(n_records, 0)").alias("b3_p_x1e6"),
            F.expr("b3_r_total DIV nullif(n_records, 0)").alias("b3_r_x1e6"),
        )
    )


def threshold_curve(
    scored: DataFrame,
    gold_total: int,
    score_col: str = "score",
    truth_col: str = "is_true",
) -> DataFrame:
    """Precision/recall at every score cutoff — the tuning readout for a
    Fellegi-Sunter-style scorer (linking/blocking.py): which min_score
    buys which precision, and what recall it costs. One combinable
    groupBy collapses the pair table to per-score counts; the cumulative
    window then runs over DISTINCT SCORES ONLY — bounded by the sum of
    agreement weights (a dimension table), so the single-partition
    ordered window is O(#weights), never O(#pairs).

    scored: (score_col, truth_col 0/1) one row per candidate pair.
    gold_total: number of gold pairs (recall denominator; pass the known
      entity count, or the labeled-pair count when evaluating a sample).

    Returns one row per distinct score, descending semantics via the
    cumulative columns: score, n_pairs, n_true, cum_pairs, cum_true,
    precision_x1e6, recall_x1e6 (exact integer quotients).
    """
    per = scored.groupBy(score_col).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col(truth_col).cast("long")).alias("n_true"),
    )
    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col(score_col).desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        score_col,
        "n_pairs",
        "n_true",
        F.sum("n_pairs").over(w).alias("cum_pairs"),
        F.sum("n_true").over(w).alias("cum_true"),
    ).select(
        score_col,
        "n_pairs",
        "n_true",
        "cum_pairs",
        "cum_true",
        F.expr("cum_true * 1000000 DIV nullif(cum_pairs, 0)").alias(
            "precision_x1e6"
        ),
        F.expr(f"cum_true * 1000000 DIV nullif({gold_total}, 0)").alias(
            "recall_x1e6"
        ),
    )


def blocking_quality(
    candidates: DataFrame,
    gold_pairs: DataFrame,
    n_records: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Blocking-stage evaluation (Christen 2012's standard pair metrics):
    REDUCTION RATIO — how much of the all-pairs space the blocker pruned —
    and PAIR COMPLETENESS — how many true-match pairs survived into the
    candidate set. clustering_eval judges the END clustering; this judges
    the blocker, which is where recall is silently lost at scale (a
    blocker with 0.99 RR and 0.6 PC is a broken pipeline that still
    "works" on every sampled pair you eyeball).

    Pairs normalize to unordered (least, greatest) and dedup on both
    sides, so orientation conventions can't double-count. Exact integer
    quotients; all_pairs = n·(n−1)/2 from the caller-supplied record
    count (the blocker input's count — callers pass it rather than this
    function recounting a possibly-expensive frame).

    Scale shape: two distinct-pair collapses + ONE semi-join
    (gold ∩ candidates) + three scalar aggs; output is a single row.
    """
    def norm(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        ).distinct()

    cand = norm(candidates).localCheckpoint(eager=True)
    gold = norm(gold_pairs).localCheckpoint(eager=True)
    covered = gold.join(cand, ["a", "b"], "left_semi")
    all_pairs = int(n_records) * (int(n_records) - 1) // 2
    return (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .crossJoin(gold.agg(F.count(F.lit(1)).alias("n_gold")))
        .crossJoin(covered.agg(F.count(F.lit(1)).alias("n_covered")))
        .select(
            F.lit(int(n_records)).cast("long").alias("n_records"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_gold").cast("long").alias("n_gold"),
            F.col("n_covered").cast("long").alias("n_covered"),
            F.lit(all_pairs).cast("long").alias("all_pairs"),
            F.expr(
                f"({all_pairs} - n_candidates) * 1000000 DIV {all_pairs}"
            ).cast("long").alias("rr_x1e6"),
            F.when(F.col("n_gold") == 0, F.lit(0).cast("long"))
            .otherwise(F.expr("n_covered * 1000000 DIV n_gold").cast("long"))
            .alias("pc_x1e6"),
        )
    )
