"""Market-basket co-occurrence analytics (association lift).

The reference has no basket operator; this is part of the LLM-data-pipeline
surface the brief requires: co-occurrence lift over grouped observations is
the workhorse for mining entity-pair affinities from transcripts ("which
tools co-occur in a conversation", "which entities co-occur in a document")
and directly generalizes retail basket analysis (lift, Brin et al. 1997,
"Dynamic itemset counting and implication rules").

Exact-integer contract: lift = P(ab) / (P(a)P(b)) = n_ab * N / (n_a * n_b)
is emitted as a staged integer quotient

    lift_x1e6 = ((n_ab * 1e6 DIV n_a) * N) DIV n_b

so every intermediate is n-INDEPENDENTLY bounded: n_ab <= n_a makes the
first factor <= 1e6, and 1e6 * N stays below 2^63 for any N < 9.2e12
baskets — no overflow at 100 TB, no float discipline, and a DuckDB oracle
replays the identical staged division bit-for-bit (integer `//` truncates
the same way in both engines, see CLAUDE.md sign caveat).

Plan shape: distinct (basket, item) — one combinable shuffle; item marginals
are a groupBy on the distinct table; the pair fan is a SELF-JOIN ON
basket_id whose fan-out is bounded by (basket size)^2 / 2, i.e. linear in
input for bounded baskets (orders have <= 7 lineitems; conversations have
bounded distinct tools). The marginal table is dimension-scale (one row per
item) and broadcast back onto the pair counts. Skew: a pathological mega
basket (one basket with 10^5 items) would fan 10^10 pairs — callers cap
basket size upstream; `max_basket` drops oversized baskets explicitly so the
bound is enforced in-plan rather than assumed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["copurchase_lift"]


def copurchase_lift(
    df: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pairs: int = 1,
    max_basket: int | None = None,
) -> DataFrame:
    """Pairwise co-occurrence lift over (basket, item) observations.

    df: any DataFrame with a basket column and an item column; duplicate
        (basket, item) rows collapse (presence semantics, like distinct
        market-basket transactions).
    min_pairs: keep pairs with at least this many co-occurrences.
    max_basket: if set, baskets with more distinct items than this are
        dropped BEFORE the pair fan — the in-plan guard that keeps the
        self-join fan-out bounded on skewed data.

    Returns one row per unordered item pair (item_a < item_b):
      n_pairs               baskets containing both
      n_a, n_b              per-item basket counts
      n_baskets             total distinct baskets (after max_basket)
      lift_x1e6             staged exact-integer lift (see module doc)
    """
    b = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket is not None:
        sized = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__sz"))
        b = b.join(sized.filter(F.col("__sz") <= max_basket), "__b").drop("__sz")

    marg = b.groupBy("__i").agg(F.count(F.lit(1)).alias("__n"))
    total = b.select(F.countDistinct("__b").alias("__N"))

    left = b.select("__b", F.col("__i").alias("item_a"))
    right = b.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        left.join(right, "__b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= int(min_pairs))
    )

    ma = marg.select(F.col("__i").alias("item_a"), F.col("__n").alias("n_a"))
    mb = marg.select(F.col("__i").alias("item_b"), F.col("__n").alias("n_b"))
    return (
        pairs.join(F.broadcast(ma), "item_a")
        .join(F.broadcast(mb), "item_b")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_x1e6",
            F.expr("((n_pairs * 1000000) DIV n_a) * __N DIV n_b").cast("long"),
        )
        .select(
            "item_a", "item_b",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("__N").cast("long").alias("n_baskets"),
            "lift_x1e6",
        )
    )
