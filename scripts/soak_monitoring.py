#!/usr/bin/env python3
"""Round-4 session-2 monitoring-family soak: Kaplan-Meier, log-rank,
control-chart flags, Haar energy, KL drift over the replicated events
table (distinct users per replica — keys keep their cardinality, rows
grow linearly). All five are single-key-exchange window/collapse shapes,
so wall should grow sublinearly with rows (fixed stage latency amortizes)
and NEVER superlinearly.

Usage: python scripts/soak_monitoring.py [repl] [job ...]
Jobs: km logrank chart haar kl (default all). One JSON line per job.
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
    jobs = args[1:] or ["km", "logrank", "chart", "haar", "kl"]

    from pyspark.sql import functions as F

    from chronographer_spark.operators.classifier import categorical_drift_kl
    from chronographer_spark.operators.temporal import (
        control_chart_flags,
        haar_energy,
        kaplan_meier,
        logrank_test,
    )
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-mon-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    ev0 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    r = spark.range(repl).select(F.col("id").alias("rep"))
    ev = (
        ev0.crossJoin(F.broadcast(r))
        .select(
            (F.col("user_id") + F.col("rep") * OFF).alias("user_id"),
            (F.col("event_id") + F.col("rep") * OFF).alias("event_id"),
            "event_type",
            "ts",
            "value",
        )
        .localCheckpoint(eager=True)
    )
    n_rows = ev.count()
    out = {"repl": repl, "rows": n_rows}

    def run(name, make):
        t0 = time.time()
        df = make()
        agg = df.agg(F.count(F.lit(1)), F.sum(df.columns[-1])).collect()
        out[name] = {
            "wall": round(time.time() - t0, 2),
            "rows_out": int(agg[0][0]),
        }

    if "km" in jobs:
        per = (
            ev.select(
                "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
            )
            .groupBy("event_type", "user_id")
            .agg(
                (F.max("sec") - F.min("sec")).cast("long").alias("t"),
                (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
            )
        )
        run("km", lambda: kaplan_meier(per, "event_type", "t", "obs")
            .select("key", "t", "cumhaz_x1e6"))
    if "logrank" in jobs:
        per2 = (
            ev.select(
                "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
            )
            .groupBy("event_type", "user_id")
            .agg(
                (F.max("sec") - F.min("sec")).cast("long").alias("t"),
                (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
            )
            .withColumn("g", F.expr("user_id % 2"))
        )
        run("logrank", lambda: logrank_test(per2, "event_type", "t", "obs", "g")
            .select("key", "v_x1e6"))
    if "chart" in jobs:
        pts = ev.select(
            "event_type",
            F.col("event_id").alias("o"),
            F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("x"),
        )
        run("chart", lambda: control_chart_flags(pts, "event_type", "o", "x")
            .select("key", "o", F.col("rule1").cast("long").alias("r")))
    if "haar" in jobs:
        series = (
            ev.select(
                "event_type", F.expr("unix_timestamp(ts) DIV 3600").alias("hr")
            )
            .groupBy("event_type", "hr")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
        )
        run("haar", lambda: haar_energy(series, "event_type", "hr", "c", 6)
            .select("key", "level", "energy"))
    if "kl" in jobs:
        base = ev.select(
            F.expr("CAST(user_id % 4 AS BIGINT)").alias("cohort"),
            F.col("event_type").alias("cat"),
            F.expr("CAST(event_id % 4 = 0 AS LONG)").alias("side"),
        )
        run("kl", lambda: categorical_drift_kl(base, "cohort", "cat", "side")
            .select("key", "js_x16e3"))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
