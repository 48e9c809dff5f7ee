#!/usr/bin/env python3
"""Round-4 session-3 classifier-eval soak: multinomial NB and kNN-vote on
replicated corpora (distinct doc/vec ids per replica; labels keep their
cardinality). NB is collapse-shaped (model is vocab-sized, scoring one
token join + (doc, class) agg): wall should grow ~linearly in rows with
fixed stage latency amortizing. kNN brute force is QUADRATIC by design
(test x train pairs both grow with repl) — judge it per PAIR (the
near-dup exact-first lesson), where throughput should hold flat; the
LSH/IVF candidate path is the linear-scale production swap.

Usage: python scripts/soak_classifier_eval.py [repl] [job ...]
Jobs: nb knn (default both). One JSON line at the end.
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
    jobs = args[1:] or ["nb", "knn"]

    from pyspark.sql import functions as F

    from chronographer_spark.operators.classifier import multinomial_nb
    from chronographer_spark.operators.similarity import knn_classify
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"soak-clf-{repl}x",
        master=f"local[{CPUS}]",
        shuffle_partitions=4 * CPUS,
    )
    r = spark.range(repl).select(F.col("id").alias("rep"))
    out = {"repl": repl}

    def run(name, df, extra=None):
        t0 = time.time()
        agg = df.agg(
            F.count(F.lit(1)).alias("n"), F.sum("correct").alias("ok")
        ).collect()
        out[name] = {
            "wall": round(time.time() - t0, 2),
            "rows_out": int(agg[0]["n"]),
            "n_correct": int(agg[0]["ok"]),
        }
        if extra:
            out[name].update(extra)

    if "nb" in jobs:
        docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs = (
            docs0.crossJoin(F.broadcast(r))
            .select(
                (F.col("doc_id") + F.col("rep") * OFF).alias("doc_id"),
                "text",
                "lang",
            )
            .localCheckpoint(eager=True)
        )
        out["nb_rows"] = docs.count()
        run("nb", multinomial_nb(docs, label_col="lang", test_mod=5))

    if "knn" in jobs:
        emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        emb = (
            emb0.crossJoin(F.broadcast(r))
            .select(
                (F.col("vec_id") + F.col("rep") * OFF).alias("vec_id"),
                "embedding",
                "label",
            )
            .localCheckpoint(eager=True)
        )
        n = emb.count()
        n_test = n // 10
        pairs = n_test * (n - n_test)
        run(
            "knn",
            knn_classify(emb, k=5, test_mod=10),
            extra={"pairs": pairs,
                   "pairs_per_sec": None},
        )
        out["knn"]["pairs_per_sec"] = round(pairs / out["knn"]["wall"])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
