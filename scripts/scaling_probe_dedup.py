#!/usr/bin/env python3
"""One dedup-pipeline scaling measurement in a fresh JVM: MinHash-LSH
candidates + exact-Jaccard verification over a replicated documents table
at a given core count. Complements scaling_probe.py (flagship = Arrow UDF +
window heavy) with a shuffle-join-heavy job class. Prints one JSON line.

Usage: scaling_probe_dedup.py <cores> <input_parquet_dir>
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

    from pyspark.sql import functions as F

    from chronographer_spark.operators.dedup import minhash_dedup
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-dedup-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
    )
    docs = spark.read.parquet(input_dir)
    # warmup on a slice (fresh plan, no reusable shuffle output)
    minhash_dedup(
        docs.sample(fraction=1 / 12.0, seed=7),
        threshold=0.8, num_hashes=16, bands=4, shingle_n=3,
    ).count()

    n_docs = docs.count()
    t0 = time.monotonic()
    n_pairs = minhash_dedup(
        docs, threshold=0.8, num_hashes=16, bands=4, shingle_n=3
    ).count()
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "dup_pairs": n_pairs,
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
