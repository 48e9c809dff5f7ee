"""Multi-key blocked entity-resolution scoring.

The classic record-linkage skeleton (Fellegi & Sunter 1969, with fixed
integer agreement weights instead of EM-estimated log-odds — weights stay
exact integers so scores replay across engines): candidate pairs come
only from BLOCKS (records sharing a blocking key), never the full cross
product, then each candidate is scored by summing weights over agreeing
fields. Blocking is the entire scale story of ER — a 10^9 × 10^9 match is
feasible exactly when the largest block is bounded — and complements the
repo's other linking paths (ED-1 fuzzy join = typo-tolerant surface
match, connected components = transitive merge): this is the multi-
evidence scorer that feeds CC its edges.

Reference tie-in: the reference links mentions by Spotlight lookup only
(src/build_ng/dbpedia_spotlight.py); cross-source record matching is
added capability, same family as kb_alignment_mutual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_match_scores(
    a: DataFrame,
    b: DataFrame,
    id_col: str,
    blocks: list[list[str]],
    agreements: list[tuple[str, int]],
    min_score: int = 0,
) -> DataFrame:
    """Score candidate pairs of `a` x `b` (same column names both sides).

    - ``blocks``: list of blocking keys (each a list of column names);
      candidates = union over blocks of the per-block equi-join, pair-
      deduplicated. Each block is ONE hash join shuffled on its key; the
      union dedup is one pair-keyed shuffle. Skewed blocks ride AQE,
      and an oversized block should be split by adding a column to its
      key (the standard blocking fix) — nothing here is all-pairs.
    - ``agreements``: (column, integer weight) — weight added when the
      pair agrees exactly on the column (nulls never agree). Features
      ride the block joins, so scoring is map-side; the same pair found
      by two blocks dedups to one row (field agreement is a function of
      the pair, so duplicates are identical rows).

    Returns (a_id, b_id, score) for pairs with score >= ``min_score``.
    """
    cols = {id_col} | {c for blk in blocks for c in blk} | {c for c, _ in agreements}
    pa = a.select([F.col(c).alias(f"a_{c}") for c in sorted(cols)])
    pb = b.select([F.col(c).alias(f"b_{c}") for c in sorted(cols)])
    cands = None
    for blk in blocks:
        cond = [pa[f"a_{c}"] == pb[f"b_{c}"] for c in blk]
        j = pa.join(pb, cond)
        cands = j if cands is None else cands.unionByName(j)
    cands = cands.dropDuplicates([f"a_{id_col}", f"b_{id_col}"])
    score = sum(
        (
            F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), F.lit(w)).otherwise(F.lit(0))
            for c, w in agreements
        ),
        F.lit(0),
    )
    return (
        cands.withColumn("score", score.cast("long"))
        .filter(F.col("score") >= min_score)
        .select(
            F.col(f"a_{id_col}").alias("a_id"),
            F.col(f"b_{id_col}").alias("b_id"),
            "score",
        )
    )
