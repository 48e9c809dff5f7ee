#!/usr/bin/env python3
"""Benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`--scaling` additionally runs the flagship extraction job at local[8] and
local[32] on the same input and reports throughput + N->4N scaling efficiency
(the sandbox evidence for the north rule's two-cluster-size criterion).
"""

from __future__ import annotations

import json
import os
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "flagship_event_graph",
    "transcripts_view",
    "frontier_expand_outgoing",
    "two_hop_expand",
    "window_lead_next",
    "minhash_signature",
    "cosine_topk",
    "cc_canonical",
    "entropy_rank_top1",
]


def _fresh_spark(cores: int):
    from chronographer_spark.session import get_spark

    return get_spark(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )


def _run_query(spark, name: str) -> tuple[float, int]:
    from chronographer_spark import entry_queries

    t0 = time.monotonic()
    df = entry_queries.QUERIES[name](spark, SF_DIR)
    n = df.count()
    return time.monotonic() - t0, n


def run_bench() -> dict:
    spark = _fresh_spark(CPUS)
    # warm the JVM + parquet footers once so per-query numbers are steady-state
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()

    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        sec, _ = _run_query(spark, name)
        times[name] = round(sec, 3)
        total += sec

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    spark.stop()
    return result


def run_scaling() -> dict:
    """Same flagship job at 8 and 32 cores; efficiency = (t8/t32)/4."""
    from chronographer_spark import entry_queries

    out = {}
    for cores in (8, 32):
        spark = _fresh_spark(cores)
        spark.read.parquet(f"{SF_DIR}/events.parquet").count()  # warm
        best = float("inf")
        triples = 0
        for _ in range(2):
            t0 = time.monotonic()
            triples = entry_queries.QUERIES["flagship_event_graph"](spark, SF_DIR).count()
            best = min(best, time.monotonic() - t0)
        out[cores] = {"sec": round(best, 3), "triples": triples,
                      "triples_per_sec": round(triples / best, 1)}
        spark.stop()
    speedup = out[8]["sec"] / out[32]["sec"]
    out["speedup_8_to_32"] = round(speedup, 3)
    out["scaling_efficiency"] = round(speedup / 4.0, 3)
    return out


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
