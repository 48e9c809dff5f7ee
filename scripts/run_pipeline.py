#!/usr/bin/env python3
"""spark-submit entry point: transcripts -> SEM triples table (+ TTL export).

Deployed with `submit.sh` via --py-files; imports resolve from the shipped
zip, so this file has no repo-relative path assumptions.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ttl", action="store_true", help="also export Turtle")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("chronographer-pipeline").getOrCreate()

    from chronographer_spark.data.transcripts import transcripts_from_events
    from chronographer_spark.graph.materialize import build_event_graph
    from chronographer_spark.io.catalog import Catalog, partition_metrics, with_lineage

    t0 = time.monotonic()
    run_id = f"run-{int(time.time())}"
    tx = transcripts_from_events(spark, args.sf_dir)
    triples = with_lineage(build_event_graph(tx), run_id, "materialize")

    cat = Catalog(spark, args.out)
    cat.write_triples(triples)
    cat.write(partition_metrics(cat.read("triples")), "partition_metrics")
    n = cat.read("triples").count()
    wall = time.monotonic() - t0

    if args.ttl:
        from chronographer_spark.io.ttl import write_ttl

        write_ttl(cat.read("triples"), f"{args.out}/graph_ttl")

    print(json.dumps({"triples": n, "sec": round(wall, 2),
                      "triples_per_sec": round(n / wall, 1), "out": args.out}))
    spark.stop()


if __name__ == "__main__":
    main()
