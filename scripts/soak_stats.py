#!/usr/bin/env python3
"""Round-4 session-3 rank/ANOVA-family soak: Kruskal-Wallis, Jonckheere,
one-way ANOVA, Wilcoxon over the replicated events table (distinct users
per replica; event types keep their cardinality, rows grow linearly).
All four are collapse shapes — KW/JT run on the distinct-VALUE grid
(values collapse across replicas, so their windows barely grow), ANOVA
is one aggregation, Wilcoxon's rank window grows with user pairs. Wall
should grow sublinearly for the first three and ~linearly for Wilcoxon.

Usage: python scripts/soak_stats.py [repl] [job ...]
Jobs: kw jt anova wx (default all). One JSON line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OFF = 10_000_000


def main() -> None:
    args = sys.argv[1:]
    repl = int(args[0]) if args else 10
    jobs = args[1:] or ["kw", "jt", "anova", "wx"]

    from pyspark.sql import functions as F

    from chronographer_spark.operators.classifier import (
        anova_oneway,
        jonckheere_trend,
        kruskal_wallis,
        wilcoxon_signed_rank,
    )
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-stats-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = spark.range(repl).select(F.col("id").alias("rep"))
    ev = (
        ev0.crossJoin(F.broadcast(r))
        .select(
            (F.col("user_id") + F.col("rep") * OFF).alias("user_id"),
            "event_type",
            "ts",
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        )
        .localCheckpoint(eager=True)
    )
    out = {"repl": repl, "rows": ev.count()}

    def run(name, df, sum_col):
        t0 = time.time()
        agg = df.agg(F.count(F.lit(1)), F.sum(sum_col)).collect()
        out[name] = {"wall": round(time.time() - t0, 2),
                     "rows_out": int(agg[0][0])}

    if "kw" in jobs:
        run("kw", kruskal_wallis(ev.select("event_type", "cents"),
                                 "event_type", "cents"), "h_x1e6")
    if "jt" in jobs:
        run("jt", jonckheere_trend(ev.select("event_type", "cents"),
                                   "event_type", "cents"), "z2_x1e6")
    if "anova" in jobs:
        run("anova", anova_oneway(ev.select("event_type", "cents"),
                                  "event_type", "cents"), "f_x1e6")
    if "wx" in jobs:
        per = ev.groupBy("event_type", "user_id").agg(
            F.coalesce(F.sum(F.when(F.month("ts") <= 6, F.col("cents"))),
                       F.lit(0)).alias("x"),
            F.coalesce(F.sum(F.when(F.month("ts") > 6, F.col("cents"))),
                       F.lit(0)).alias("y"),
        )
        run("wx", wilcoxon_signed_rank(per, "event_type", "x", "y"),
            "z2_x1e6")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
