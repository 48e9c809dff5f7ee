#!/usr/bin/env python3
"""One scaling measurement in a fresh JVM: build_event_graph over a
transcripts parquet table at a given core count. Prints one JSON line.

Run via bench.py --scaling: the input table is materialized once, and each
(cores, rep) measurement is its own subprocess so shuffle-output reuse, JIT
state, and GC history never leak between runs.
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

    from chronographer_spark.graph.materialize import build_event_graph
    from chronographer_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=4 * cores,
    )

    tx = spark.read.parquet(input_dir)
    # JIT/codegen + python-worker warmup on a 1/12 sample (fresh plan, no
    # shuffle output reusable by the timed run)
    build_event_graph(tx.sample(fraction=1 / 12.0, seed=7)).count()

    n_turns = tx.count()
    t0 = time.monotonic()
    triples = build_event_graph(tx).count()
    sec = time.monotonic() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "turns": n_turns,
                "triples": triples,
                "sec": round(sec, 3),
                "turns_per_sec": round(n_turns / sec, 1),
                "triples_per_sec": round(triples / sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
