#!/usr/bin/env python3
"""One dedup-pipeline scaling measurement in a fresh JVM: MinHash-LSH
candidates + exact-Jaccard verification over a replicated documents table
at a given core count. Complements scaling_probe.py (flagship = Arrow UDF +
window heavy) with a shuffle-join-heavy job class. Prints one JSON line.

Usage: scaling_probe_dedup.py <cores> <input_parquet_dir> [direct|exact_first]
`direct` (default) measures minhash_dedup pair extraction; `exact_first`
measures the full near_dup_clusters_exact_first clustering (the production
composition) on the same input.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    input_dir = sys.argv[2]

    mode = sys.argv[3] if len(sys.argv) > 3 else "direct"

    from pyspark.sql import functions as F  # noqa: F401

    from chronographer_spark.operators.dedup import (
        minhash_dedup,
        near_dup_clusters_exact_first,
    )
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-dedup-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
    )
    docs = spark.read.parquet(input_dir)
    params = dict(threshold=0.8, num_hashes=16, bands=4, shingle_n=3)

    def job(d):
        if mode == "exact_first":
            return near_dup_clusters_exact_first(d, **params).count()
        return minhash_dedup(d, **params).count()

    # warmup on a slice (fresh plan, no reusable shuffle output)
    job(docs.sample(fraction=1 / 12.0, seed=7))

    n_docs = docs.count()
    t0 = time.monotonic()
    n_out = job(docs)
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "mode": mode,
                "docs": n_docs,
                "rows_out": n_out,
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
