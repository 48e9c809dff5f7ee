#!/usr/bin/env python3
"""Fellegi-Sunter soak: weight estimation + blocked pair scoring at
replicated scale.

Fixture: the sf0.01 customer/twin pair (entry_queries._fs_customer_sides
semantics) replicated `repl` times with DISTINCT ids (id + r*10^7) and
nat/seg/bal carried verbatim — so nationkey block sizes grow linearly with
repl and the nationkey-blocked candidate set grows QUADRATICALLY (the
standard blocked-ER reality; cf. the near-dup direct-path precedent:
judge throughput per PAIR, not per row). Estimation cost (value joins +
one seed pass) is linear in rows and must stay a small constant share.

Prints one JSON line: per-scale wall, rows, candidate pairs, pairs/s, and
a replication-invariant checksum (sum of n_agree over pairs of replica 0
with itself is repl-invariant per pair; we emit total pairs and the
global score sum instead — deterministic per repl, compared across reps).

Usage: python scripts/soak_fs.py [repl] [reps]
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
    reps = int(args[1]) if len(args) > 1 else 2

    from pyspark.sql import functions as F

    from chronographer_spark.linking.fs import fs_score_pairs
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-fs-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    c = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    r = spark.range(repl).select(F.col("id").alias("rep"))
    bal = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    base = c.crossJoin(F.broadcast(r)).select(
        (F.col("c_custkey") + F.col("rep") * OFF).alias("id"),
        F.col("c_custkey").alias("ck"),
        F.col("c_nationkey").alias("nat0"),
        F.col("c_mktsegment").alias("seg0"),
        bal.alias("bal0"),
    )
    a = base.select(
        "id",
        F.col("nat0").alias("nat"),
        F.col("seg0").alias("seg"),
        F.col("bal0").alias("bal_cents"),
    )
    b = base.select(
        "id",
        F.expr(
            "CASE WHEN ck % 7 = 0 THEN (nat0 + 1) % 25 ELSE nat0 END"
        ).alias("nat"),
        F.expr("CASE WHEN ck % 3 = 0 THEN 'PERTURBED' ELSE seg0 END").alias(
            "seg"
        ),
        (F.col("bal0") + F.expr("CASE WHEN ck % 5 = 0 THEN 1 ELSE 0 END")).alias(
            "bal_cents"
        ),
    )
    seed = base.select(F.col("id").alias("a_id"), F.col("id").alias("b_id"))
    n_rows = base.count()

    walls = []
    agg = None
    for _ in range(reps):
        t0 = time.time()
        scores = fs_score_pairs(
            a, b, "id", ["nat", "seg", "bal_cents"], seed, block_cols=["nat"]
        )
        agg = scores.agg(
            F.count("*").alias("pairs"),
            F.sum("score_x16").alias("sum_score"),
            F.sum("n_agree").alias("sum_agree"),
        ).collect()[0]
        walls.append(round(time.time() - t0, 2))

    pairs = int(agg["pairs"])
    w = min(walls)
    print(
        json.dumps(
            {
                "job": "fs_score_pairs",
                "repl": repl,
                "rows": n_rows,
                "pairs": pairs,
                "walls": walls,
                "pairs_per_s": int(pairs / w),
                "sum_score": int(agg["sum_score"]),
                "sum_agree": int(agg["sum_agree"]),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
