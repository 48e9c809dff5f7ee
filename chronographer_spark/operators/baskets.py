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


def frequent_triples(
    df: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_support: int = 5,
    max_basket: int = 64,
) -> DataFrame:
    """Apriori level-3 frequent itemsets (Agrawal & Srikant 1994): the
    classic candidate-generation step above `copurchase_lift`'s pairs —
    candidate triples come ONLY from joining frequent pairs sharing their
    smallest item (the Apriori pruning property: every subset of a
    frequent set is frequent), then support is counted with one basket
    membership join. Emits each frequent triple's support plus its
    all-confidence denominator (max single-item support) so
    all_conf_x1e6 = support*1e6 DIV max_item_n ranks associations
    independent of item popularity (Omiecinski 2003).

    Exact integers; lexicographic item ordering (a < b < c) pins every
    triple exactly once. Shape: distinct (basket, item) with oversized
    baskets dropped in-plan (`max_basket`), pair counts via self-join
    (bounded fan), frequent pairs filtered at min_support BEFORE the
    candidate join — the count that explodes in naive triple counting
    never materializes; candidate verification is one join of candidates
    onto per-basket pair memberships. Everything above pair scale is
    Zipf-small.

    Returns (a, b, c, support, max_item_n, all_conf_x1e6).
    """
    base = df.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).dropDuplicates()
    sizes = base.groupBy("bk").agg(F.count(F.lit(1)).alias("__sz"))
    ok = base.join(
        F.broadcast(sizes.filter(F.col("__sz") <= max_basket).select("bk")),
        "bk",
    ).localCheckpoint(eager=True)
    item_n = ok.groupBy("it").agg(F.count(F.lit(1)).cast("long").alias("n_it"))
    pairs = (
        ok.alias("x")
        .join(ok.alias("y"), "bk")
        .filter(F.col("x.it") < F.col("y.it"))
        .select("bk", F.col("x.it").alias("a"), F.col("y.it").alias("b"))
    ).localCheckpoint(eager=True)
    fp = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    # Apriori join: (a,b) x (a,c) with b < c -> candidate (a,b,c); the
    # third subset (b,c) is checked by semi-joining frequent pairs again
    cand = (
        fp.alias("p")
        .join(
            fp.select(
                F.col("a").alias("a2"), F.col("b").alias("c"),
            ).alias("q"),
            F.col("p.a") == F.col("q.a2"),
        )
        .filter(F.col("p.b") < F.col("q.c"))
        .select("a", "b", "c")
        .join(
            fp.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    support = (
        pairs.join(F.broadcast(cand), ["a", "b"])
        .join(
            ok.select("bk", F.col("it").alias("c")),
            ["bk", "c"],
        )
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    mx = (
        support.join(F.broadcast(item_n.select(F.col("it").alias("a"), F.col("n_it").alias("na"))), "a")
        .join(F.broadcast(item_n.select(F.col("it").alias("b"), F.col("n_it").alias("nb"))), "b")
        .join(F.broadcast(item_n.select(F.col("it").alias("c"), F.col("n_it").alias("nc"))), "c")
        .withColumn("max_item_n", F.greatest("na", "nb", "nc"))
    )
    return mx.select(
        "a",
        "b",
        "c",
        "support",
        "max_item_n",
        F.expr(
            "support * CAST(1000000 AS BIGINT) DIV max_item_n"
        ).alias("all_conf_x1e6"),
    )
