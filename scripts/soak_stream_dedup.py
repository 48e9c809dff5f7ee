#!/usr/bin/env python3
"""Streaming-dedup longevity soak: 200+ micro-batches (r3 verdict item 7).

Proves the compaction bound EMPIRICALLY, not just structurally: runs the
incremental LSH dedup stream over a 10x corpus split into 200 single-file
micro-batches (maxFilesPerTrigger=1), recording per-batch trigger wall time
and the index small-file count at every batch commit (StreamingQueryListener
→ onQueryProgress → os.listdir). Two configs:

  compact16   compact_every=16 (production default): file count sawtooths
              under the 16 * n_buckets bound, per-batch time stays flat
  nocompact   compaction disabled (threshold 1e9): file count grows by
              n_buckets per batch to ~200 * n_buckets; per-batch time
              degrades with the listing/footer overhead — the failure mode
              compaction exists to prevent

Replica texts are word-suffixed (every word gets _r{r}) so shingle sets are
replica-local: cross-replica twins would otherwise make candidate-pair
volume grow quadratically with index size and mask the file-count signal
(CLAUDE.md round-3 soak attribution note). shingle_n=3 per the 1-gram
LSH-degeneracy fact.

Prints one JSON line per config: first/last-quartile mean batch seconds,
max file count, plus the full per-batch (batch_id, sec, files) series to
/tmp/stream_soak_<config>.jsonl.

Usage: python scripts/soak_stream_dedup.py [--batches 200] [--repl 10]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]
    n_batches = 200
    repl = 10
    if "--batches" in args:
        i = args.index("--batches")
        n_batches = int(args[i + 1])
    if "--repl" in args:
        i = args.index("--repl")
        repl = int(args[i + 1])

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.listener import StreamingQueryListener

    from chronographer_spark.session import get_spark
    from chronographer_spark.streaming.dedup import (
        start_incremental_dedup_stream,
    )

    spark = get_spark(
        app_name="soak-stream-dedup",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "300")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = docs.count()
    # replica-local shingles: suffix every word with _r{r}
    docs_r = (
        docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1))))
        .select(
            (F.col("doc_id") + F.col("rep") * (10 * n_docs)).alias("doc_id"),
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_r"), F.col("rep")),
                ),
                " ",
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )

    root = tempfile.mkdtemp(prefix="stream_soak_")
    input_dir = os.path.join(root, "input")
    docs_r.repartition(n_batches).write.parquet(input_dir)
    # drop non-data files so maxFilesPerTrigger=1 sees exactly the parts
    n_files = sum(
        1 for f in os.listdir(input_dir) if f.startswith("part-")
    )
    print(json.dumps({"fixture": "stream10x", "n_docs": n_docs * repl,
                      "n_batch_files": n_files}), flush=True)

    for config, compact_every in [("compact16", 16), ("nocompact", 10**9)]:
        pairs_dir = os.path.join(root, config, "pairs")
        index_dir = os.path.join(root, config, "index")
        ckpt_dir = os.path.join(root, config, "ckpt")
        series: list = []

        class L(StreamingQueryListener):
            def onQueryStarted(self, e):  # noqa: N802
                pass

            def onQueryProgress(self, e):  # noqa: N802
                p = e.progress
                try:
                    nf = sum(
                        1 for f in os.listdir(index_dir)
                        if f.startswith("part-")
                    )
                except FileNotFoundError:
                    nf = 0
                series.append(
                    (
                        p.batchId,
                        p.durationMs.get("triggerExecution", 0) / 1000.0,
                        nf,
                    )
                )

            def onQueryTerminated(self, e):  # noqa: N802
                pass

            def onQueryIdle(self, e):  # noqa: N802
                pass

        listener = L()
        spark.streams.addListener(listener)
        t0 = time.time()
        q = start_incremental_dedup_stream(
            spark,
            input_dir,
            pairs_dir,
            index_dir,
            ckpt_dir,
            num_hashes=8,
            bands=2,
            shingle_n=3,
            available_now=True,
            n_buckets=8,
            compact_every=compact_every,
        )
        q.awaitTermination()
        wall = time.time() - t0
        spark.streams.removeListener(listener)

        data = sorted(s for s in series if s[1] > 0)
        with open(f"/tmp/stream_soak_{config}.jsonl", "w") as fh:
            for b, sec, nf in data:
                fh.write(json.dumps({"batch": b, "sec": sec, "files": nf}) + "\n")
        qn = max(1, len(data) // 4)
        head = sum(s[1] for s in data[:qn]) / qn
        tail = sum(s[1] for s in data[-qn:]) / qn
        n_pairs = spark.read.parquet(pairs_dir).count()
        print(
            json.dumps(
                {
                    "config": config,
                    "batches": len(data),
                    "wall_total": round(wall, 1),
                    "first_quartile_mean_sec": round(head, 3),
                    "last_quartile_mean_sec": round(tail, 3),
                    "degradation": round(tail / head, 2),
                    "max_index_files": max(s[2] for s in data),
                    "n_pairs": n_pairs,
                }
            ),
            flush=True,
        )

    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
