#!/usr/bin/env python3
"""Gale-Shapley soak: synchronous deferred acceptance at replicated scale.

Fixture: the sf0.01 customer/twin preference construction (top-5 same-nation
candidates under the agreement score) replicated with DISTINCT ids — state
rows and preference rows grow linearly, round count stays pinned. The claim
to evidence: per-round cost is one rank-join + one acceptor argmax window
over |proposers| rows, so wall grows ~linearly with proposers at fixed
rounds (the CC/PageRank iterative-family shape), and the matched fraction
is scale-invariant (same local competition structure per replica).

Usage: python scripts/soak_match.py [repl] [rounds]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OFF = 10_000_000


def main() -> None:
    args = sys.argv[1:]
    repl = int(args[0]) if args else 10
    rounds = int(args[1]) if len(args) > 1 else 12

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from chronographer_spark.linking.matching import stable_matching
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-match-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=2 * CPUS,
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    r = spark.range(repl).select(F.col("id").alias("rep"))
    bal = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    base = c.crossJoin(F.broadcast(r)).select(
        (F.col("c_custkey") + F.col("rep") * OFF).alias("id"),
        F.col("c_custkey").alias("ck"),
        (F.col("c_nationkey") + F.col("rep") * 25).alias("nat"),
        F.col("c_mktsegment").alias("seg0"),
        bal.alias("bal0"),
    )
    pa = base.filter(F.expr("ck % 5 = 0")).select(
        "id", "nat", F.col("seg0").alias("seg"), F.col("bal0").alias("bal")
    )
    pb = base.select(
        "id",
        "nat",
        F.expr("CASE WHEN ck % 3 = 0 THEN 'PERTURBED' ELSE seg0 END").alias(
            "seg"
        ),
        (F.col("bal0") + F.expr("CASE WHEN ck % 5 = 0 THEN 1 ELSE 0 END")).alias(
            "bal"
        ),
    )
    pairs = pa.alias("x").join(pb.alias("y"), F.col("x.nat") == F.col("y.nat")).select(
        F.col("x.id").alias("p"),
        F.col("y.id").alias("a"),
        F.expr(
            "CAST(CASE WHEN x.seg = y.seg THEN 2000 ELSE 0 END"
            " + CASE WHEN x.bal = y.bal THEN 1000 ELSE 0 END"
            " - (x.id + y.id) % 997 AS BIGINT)"
        ).alias("score"),
    )
    w = Window.partitionBy("p").orderBy(F.desc("score"), F.asc("a"))
    top5 = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .drop("rk")
        .localCheckpoint(eager=True)
    )
    n_prop = top5.select("p").distinct().count()
    t0 = time.time()
    st = stable_matching(top5, rounds=rounds)
    agg = st.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("a").isNotNull(), 1).otherwise(0)).alias("matched"),
        F.sum("ptr").alias("sum_ptr"),
    ).collect()[0]
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "job": "stable_matching",
                "repl": repl,
                "rounds": rounds,
                "proposers": n_prop,
                "matched": int(agg["matched"]),
                "matched_frac_x1e3": int(agg["matched"]) * 1000 // n_prop,
                "sum_ptr": int(agg["sum_ptr"]),
                "wall": wall,
                "proposers_per_s": int(n_prop / wall),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
