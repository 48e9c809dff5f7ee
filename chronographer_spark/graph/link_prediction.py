"""KG link-prediction evaluation: TransE-style ranking, exact integers.

The reference builds the graph but never evaluates its predictive quality;
a production KG-construction pipeline closes the loop with link prediction
(Bordes et al. 2013, "Translating Embeddings for Modeling Multi-relational
Data"): score(h, r, t) = -||e_h + v_r - e_t||² and report the rank of the
true tail among all candidate entities (MRR / Hits@k). This module is the
EVALUATION harness — embeddings come from any trainer (here: the int8
quantization in operators/similarity.py quantize_vectors).

Cross-engine exactness: the relation vector is the per-relation mean
translation v_r = Σ(e_t - e_h)/n_r, which is rational, not integer. We
never materialize it: multiplying the translated distance by n_r² gives
    d'(cand) = Σ_i (n_r·hv_i + s_{r,i} - n_r·cv_i)²,   s_{r,i} = Σ(tv_i-hv_i)
— pure int64 arithmetic with the SAME argsort as the real TransE distance,
so DuckDB replays ranks bit-exactly (no float ever enters). Overflow bound:
|n·hv + s - n·cv| ≲ n·381 must stay under 2^31.5 (n_r up to ~5·10^6 at
int8 codes); beyond that, sample the relation's triples for the prototype.

Plan shape at 10^9 entities: learning s_{r,i} is one posexplode + (r, pos)
agg (map-side combinable; #rows = |triples|·dim but collapses to
#relations·dim); ranking is entities ⋈ BROADCAST(test triples) — a map-only
nested-loop pass over the entity table followed by one triple-keyed agg,
zero shuffle of the big side. Exact brute-force ranking is the standard
protocol for link-prediction eval (test sets are samples); for approximate
eval at extreme scale, bucket candidates with similarity.lsh_bucket first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def transe_rank_eval(
    triples: DataFrame,
    entities: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    k: int = 10,
    test_filter: Column | None = None,
) -> DataFrame:
    """Rank each (test) triple's true tail among ALL entities.

    triples: (h, r, t) — ids into `entities`. The relation prototype is
      learned from ALL triples of each relation; `test_filter` (a boolean
      Column over h/r/t) restricts which triples are *ranked*.
    entities: (id_col, vec_col: array<int>) — integer vectors
      (quantize_vectors output).

    Returns (h, r, t, rank, rr_x1e6, hit) where rank is 1-based among all
    candidate entities (raw setting: every entity is a candidate), ties
    broken by candidate id < t, rr_x1e6 = 1e6 DIV rank exactly, and
    hit = 1 iff rank <= k.
    """
    ent = entities.select(
        F.col(id_col).alias("__eid"), F.col(vec_col).alias("__evec")
    )
    tv = (
        triples.join(ent, triples["h"] == ent["__eid"])
        .withColumnRenamed("__evec", "hv")
        .drop("__eid")
        .join(ent, triples["t"] == ent["__eid"])
        .withColumnRenamed("__evec", "tvv")
        .drop("__eid")
    )
    diffs = tv.select(
        "r",
        F.posexplode(
            F.zip_with(
                "tvv", "hv", lambda y, x: (y.cast("long") - x.cast("long"))
            )
        ).alias("pos", "d"),
    )
    rel = (
        diffs.groupBy("r", "pos")
        .agg(F.sum("d").alias("s"), F.count(F.lit(1)).alias("n"))
        .groupBy("r")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda st: st["s"],
            ).alias("svec"),
            F.max("n").alias("n"),
        )
    )
    test = tv if test_filter is None else tv.filter(test_filter)
    # qv_i = n·hv_i + s_i; d'_true computed in place (tv already carries tvv)
    test = (
        test.join(F.broadcast(rel), "r")
        .withColumn(
            "qv",
            F.zip_with(
                "hv", "svec", lambda x, s: F.col("n") * x.cast("long") + s
            ),
        )
        .withColumn(
            "d_true",
            F.aggregate(
                F.zip_with(
                    "qv",
                    "tvv",
                    lambda q, c: (q - F.col("n") * c.cast("long"))
                    * (q - F.col("n") * c.cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        .select("h", "r", "t", "n", "qv", "d_true")
    )
    # map-only pass over the entity table against the broadcast test set
    cand = ent.crossJoin(F.broadcast(test))
    d_cand = F.aggregate(
        F.zip_with(
            "qv",
            "__evec",
            lambda q, c: (q - F.col("n") * c.cast("long"))
            * (q - F.col("n") * c.cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    better = F.when(
        (d_cand < F.col("d_true"))
        | ((d_cand == F.col("d_true")) & (F.col("__eid") < F.col("t"))),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        cand.select("h", "r", "t", better.alias("b"))
        .groupBy("h", "r", "t")
        .agg((F.lit(1) + F.sum("b")).cast("long").alias("rank"))
        .select(
            "h",
            "r",
            "t",
            "rank",
            F.expr("CAST(1000000 DIV rank AS BIGINT)").alias("rr_x1e6"),
            F.when(F.col("rank") <= k, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("hit"),
        )
    )
