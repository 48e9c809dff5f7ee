#!/usr/bin/env python3
"""Round-4 soak: DSIR selection and DAG path DP at replicated scale.

Jobs (local[$SPARK_GRAFT_CPUS], default 32; distinct ids per replica):
  - dsir: dsir_select end-to-end over the replicated sf0.1 corpus — the
    bucket-model build (one bounded groupBy), the broadcast scoring join,
    and the global top-k. Work is linear in tokens; the bucket table stays
    <= B rows at every scale, so per-doc throughput should be flat.
  - dag: dag_path_stats over the divide-lattice DAG on 15000 * repl nodes.
    Rounds grow as log2(N) (Kahn layers), per-round work is one hash join
    over the 2N-edge set — wall should grow ~N log N, never quadratically.
  - n2v: node2vec_walks (3 steps, 3 attempts) over the replicated
    user<->event_type bipartite graph — type-side hub degrees grow
    LINEARLY with repl while walk count grows with users; the rejection
    sampler's claim is per-walk-step cost O(attempts * bucket) regardless
    of hub degree, so wall should track walk count, not hub degree.

Prints one JSON line per job: walls (trust the min within one invocation;
absolute walls on this VM drift), rows, and a checksum that must be
replication-invariant where the math says so.

Usage: python scripts/soak_r4.py [repl] [reps] [job ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    repl = int(args[0]) if args else 10
    reps = int(args[1]) if len(args) > 1 else 2
    jobs = args[2:] or ["dsir", "dag", "n2v"]

    from pyspark.sql import functions as F

    from chronographer_spark.operators.graph_algos import (
        dag_path_stats,
        node2vec_walks,
    )
    from chronographer_spark.operators.sampling import dsir_select
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-r4-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )

    out = {}
    if "dsir" in jobs:
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n_docs = docs.count()
        docs_r = (
            docs.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
            )
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (10 * n_docs))
            .drop("rep")
            .repartition(4 * CPUS)
            .localCheckpoint(eager=True)
        )
        walls = []
        for _ in range(reps):
            t0 = time.time()
            res = dsir_select(
                docs_r, F.col("lang") == "en", k=100, n_buckets=256
            ).collect()
            walls.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "job": "dsir",
                    "repl": repl,
                    "docs": n_docs * repl,
                    "walls": walls,
                    "rows": len(res),
                    "checksum": sum(r["w_s16"] for r in res),
                }
            ),
            flush=True,
        )

    if "dag" in jobs:
        n = 15000 * repl
        ids = spark.range(1, n + 1).select(F.col("id").alias("k"))
        e2 = ids.filter(F.col("k") >= 2).select(
            F.col("k").alias("src"), F.expr("k DIV 2").alias("dst")
        )
        e3 = ids.filter(
            (F.col("k") >= 3) & (F.expr("k DIV 3") != F.expr("k DIV 2"))
        ).select(F.col("k").alias("src"), F.expr("k DIV 3").alias("dst"))
        edges = (
            e2.unionByName(e3).repartition(4 * CPUS).localCheckpoint(eager=True)
        )
        walls, rows, chk = [], None, None
        for _ in range(reps):
            t0 = time.time()
            st = dag_path_stats(edges, root=1)
            r = st.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("d_long").alias("sd"),
                F.sum("n_paths").alias("sp"),
            ).collect()[0]
            rows, chk = int(r["n"]), (int(r["sd"]), int(r["sp"]))
            walls.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "job": "dag",
                    "nodes": n,
                    "walls": walls,
                    "rows": rows,
                    "checksum": chk,
                }
            ),
            flush=True,
        )


    if "n2v" in jobs:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        n_users = ev.agg(F.max("user_id")).first()[0] + 1
        ev_r = (
            ev.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
            )
            .withColumn(
                "user_id", F.col("user_id") + F.col("rep") * (10 * n_users)
            )
            .drop("rep")
        )
        u2t = ev_r.select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
            F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
        ).distinct()
        edges = (
            u2t.unionByName(
                u2t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            .repartition(4 * CPUS)
            .localCheckpoint(eager=True)
        )
        starts = (
            u2t.select(F.col("src").alias("node"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_walks = starts.count()
        walls, rows, chk = [], None, None
        for _ in range(reps):
            t0 = time.time()
            wk = node2vec_walks(edges, n_steps=3, starts=starts, attempts=3)
            r = wk.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.length("node")).alias("s"),
            ).collect()[0]
            rows, chk = int(r["n"]), int(r["s"])
            walls.append(round(time.time() - t0, 2))
        print(
            json.dumps(
                {
                    "job": "n2v",
                    "repl": repl,
                    "walks": n_walks,
                    "walls": walls,
                    "rows": rows,
                    "checksum": chk,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
