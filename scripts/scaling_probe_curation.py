#!/usr/bin/env python3
"""One curation-chain scaling measurement in a fresh JVM: the composed
dedup -> 8-gram Bloom decontamination -> quality -> DSIR -> pack flow
(operators/curation.py) over a replicated documents table at a given
core count. Complements scaling_probe.py (flagship: Arrow UDF + window
heavy) and scaling_probe_dedup.py (shuffle-join heavy) with the
multi-stage composition class — checkpoint boundaries, broadcast legs
and a driver-offset prefix inside one job. Prints one JSON line.

Usage: scaling_probe_curation.py <cores> <input_parquet_dir>
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

    from chronographer_spark.operators.curation import curation_chain
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-curation-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
    )
    docs = spark.read.parquet(input_dir)
    # k scales with the corpus so the selection+packing stages keep real
    # work at every replication (a fixed tiny k would make the tail
    # constant-time and flatter the scaling number)
    n_docs = docs.count()
    k = max(500, n_docs // 20)

    # warmup on a slice (fresh plan, no reusable shuffle output)
    curation_chain(docs.sample(fraction=1 / 12.0, seed=7), k=k).count()

    t0 = time.monotonic()
    n_out = curation_chain(docs, k=k).count()
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "selected": n_out,
                "k": k,
                "sec": round(sec, 3),
                "docs_per_sec": round(n_docs / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
