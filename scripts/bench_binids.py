#!/usr/bin/env python3
"""Binary-id prototype through the flagship's hot path (r3 verdict item 8).

The 8->32-core scaling of the flagship emission was diagnosed (r2 control
benchmark) as DRAM-bandwidth-bound. This prototypes the next string-traffic
lever after CURIEs: carry the conversation key as the raw BIGINT user_id
(not the 10-char 'conv%06d' string) through every exchange and window, and
encode the mention dimension as a TINYINT through the dedup shuffle —
expanding to CURIE strings only in the final post-shuffle projection. The
long key also makes the ordering window (user_id) and the dedup/lead
windows (conv key) share ONE partitioning, deleting an entire exchange
that the string variant cannot reuse (hashpartitioning(conv_id) !=
hashpartitioning(user_id) to Catalyst, even though the mapping is 1:1).

Output is bit-identical to q_flagship_event_graph (checked in mode
`check`); `bench` measures one (cores, variant) cell in THIS JVM;
`all` spawns a fresh JVM per cell (the scaling discipline from
bench.py --scaling) and prints the 8/32-core table.

Usage:
  python scripts/bench_binids.py check
  python scripts/bench_binids.py bench <cores> <baseline|binid> [reps]
  python scripts/bench_binids.py all
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def flagship_binid(spark, sf_dir: str):
    """build_event_graph semantics with BIGINT conv keys through the hot
    path (graph/materialize.py:86-205 single-pass emission; extraction
    per extraction/mentions.py:86-118) — strings only in the final
    projection."""
    from pyspark.sql import Window, functions as F

    from chronographer_spark.extraction import mentions as M
    from chronographer_spark.vocab import (
        IN_CONVERSATION,
        NEXT_EVENT,
        NF_TO_PRED,
        NS_NG,
        RDF_TYPE,
        SEM_EVENT,
        USED_TOOL,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w0 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tx = ev.withColumn("rn", F.row_number().over(w0)).select(
        F.col("user_id").alias("conv_id"),  # BIGINT through the plan
        (F.col("rn") - F.lit(1)).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.col("rn") - 1) % 3 + 1,
        ).alias("role"),
        F.concat(
            F.lit("event "),
            F.col("event_type"),
            F.lit(" with value "),
            F.floor(F.col("value")).cast("long").cast("string"),
            F.lit(" recorded on "),
            F.date_format("ts", "yyyy-MM-dd"),
        ).alias("text"),
        F.when((F.col("rn") - 1) % 3 == 2, F.col("event_type"))
        .otherwise(F.lit(""))
        .alias("tool"),
    )

    # --- extraction: same Arrow extractor, long conv key ----------------
    person_re = re.compile(f"({M._vocab_regex(M.PERSONS)})")
    place_re = re.compile(f"({M._vocab_regex(M.PLACES)})")
    date_re = re.compile(f"({M.DATE_RE})")

    def gen(batches):
        for pdf in batches:
            yield M._extract_batch(pdf, person_re, place_re, date_re)

    m = (
        tx.select("conv_id", "turn_idx", "role", "text", "tool")
        .mapInPandas(
            gen,
            schema="conv_id long, turn_idx int, mention string,"
            " dimension string, text string",
        )
        .drop("text")
        .withColumn(
            "dim",
            F.when(F.col("dimension") == "who", 1)
            .when(F.col("dimension") == "where", 2)
            .when(F.col("dimension") == "when", 3)
            .otherwise(4)
            .cast("tinyint"),
        )
        .drop("dimension")
        .dropDuplicates(["conv_id", "turn_idx", "mention", "dim"])
    )

    # --- single-pass emission over the long key --------------------------
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = (
        tx.select("conv_id", "turn_idx", "role")
        .withColumn("__prev", F.lag("turn_idx").over(w))
        .filter(
            F.col("__prev").isNull() | (F.col("__prev") != F.col("turn_idx"))
        )
        .drop("__prev")
    )

    def conv_str(c="conv_id"):
        return F.concat(
            F.lit("conv"), F.lpad(F.col(c).cast("string"), 6, "0")
        )

    ev_uri = F.concat(
        F.lit(NS_NG + "event/"), conv_str(), F.lit("/"),
        F.col("turn_idx").cast("string"),
    )
    conv_uri = F.concat(F.lit(NS_NG + "conversation/"), conv_str())
    next_uri = F.concat(
        F.lit(NS_NG + "event/"), conv_str(), F.lit("/"),
        F.col("next_turn").cast("string"),
    )

    def t(s, p, o):
        return F.struct(
            s.alias("subject"), p.alias("predicate"), o.alias("object")
        )

    emissions = F.array(
        t(ev_uri, F.lit(RDF_TYPE), F.lit(SEM_EVENT)),
        t(ev_uri, F.lit(NF_TO_PRED["who"]),
          F.concat(F.lit(NS_NG + "actor/"), F.col("role"))),
        t(ev_uri, F.lit(NF_TO_PRED["part_of"]), conv_uri),
        t(conv_uri, F.lit(NF_TO_PRED["part_of_inverse"]), ev_uri),
        t(ev_uri, F.lit(IN_CONVERSATION), conv_uri),
        F.when(
            F.col("next_turn").isNotNull(),
            t(ev_uri, F.lit(NEXT_EVENT), next_uri),
        ),
    )
    turn_triples = (
        turns.withColumn("next_turn", F.lead("turn_idx").over(w))
        .select(
            F.explode(F.filter(emissions, lambda x: x.isNotNull())).alias("tr")
        )
        .select("tr.subject", "tr.predicate", "tr.object")
    )

    from chronographer_spark.graph.materialize import ent_uri

    non_date = m.filter(F.col("dim").isin(1, 2, 4)).select(
        ev_uri.alias("subject"),
        F.when(F.col("dim") == 1, F.lit(NF_TO_PRED["who"]))
        .when(F.col("dim") == 2, F.lit(NF_TO_PRED["where"]))
        .otherwise(F.lit(USED_TOOL))
        .alias("predicate"),
        F.when(
            F.col("dim") == 4,
            F.concat(F.lit(NS_NG + "tool/"), F.col("mention")),
        )
        .otherwise(ent_uri(F.col("mention")))
        .alias("object"),
    )
    dates = (
        m.filter(F.col("dim") == 3)
        .groupBy("conv_id", "turn_idx")
        .agg(F.min("mention").alias("begin"), F.max("mention").alias("end"))
        .withColumn("end", F.coalesce("end", "begin"))
    )
    date_triples = dates.select(
        ev_uri.alias("subject"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(NF_TO_PRED["when_bts"]).alias("predicate"),
                    F.col("begin").alias("object"),
                ),
                F.struct(
                    F.lit(NF_TO_PRED["when_ets"]).alias("predicate"),
                    F.col("end").alias("object"),
                ),
            )
        ).alias("po"),
    ).select("subject", "po.predicate", "po.object")

    return turn_triples.unionByName(non_date).unionByName(date_triples)


def _measure(spark, df, reps: int) -> list[float]:
    from pyspark.sql import functions as F

    walls = []
    for _ in range(reps):
        t0 = time.time()
        # force full string materialization (bench hygiene: aggregate a
        # real column, never bare count over a prunable subtree)
        df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("subject") + F.length("object")).alias("b"),
        ).collect()
        walls.append(round(time.time() - t0, 3))
    return walls


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"

    if mode == "check":
        from chronographer_spark import entry_queries as eq
        from chronographer_spark.session import get_spark

        spark = get_spark(app_name="binid-check", master="local[8]",
                          shuffle_partitions=16)
        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            base = sorted(
                tuple(r)
                for r in eq.QUERIES["flagship_event_graph"](spark, sf)
                .collect()
            )
            bini = sorted(tuple(r) for r in flagship_binid(spark, sf).collect())
            assert base == bini, f"binid output differs at {sf}"
            print(f"{sf}: identical ({len(base)} triples)")
        return

    if mode == "bench":
        cores, variant = int(sys.argv[2]), sys.argv[3]
        reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        from chronographer_spark import entry_queries as eq
        from chronographer_spark.session import get_spark

        spark = get_spark(
            app_name=f"binid-{variant}-{cores}",
            master=f"local[{cores}]",
            shuffle_partitions=max(16, 2 * cores),
        )
        if variant == "baseline":
            df = eq.QUERIES["flagship_event_graph"](spark, SF_DIR)
        else:
            df = flagship_binid(spark, SF_DIR)
        walls = _measure(spark, df, reps)
        print(json.dumps({"cores": cores, "variant": variant,
                          "walls": walls, "min": min(walls)}), flush=True)
        return

    if mode == "prep":
        # replicate events 10x (disjoint users) so the measured job is big
        # enough to exercise the exchange bandwidth, not fixed overheads
        repl = int(sys.argv[2]) if len(sys.argv) > 2 else 10
        from pyspark.sql import functions as F

        from chronographer_spark.session import get_spark

        spark = get_spark(app_name="binid-prep", master="local[16]",
                          shuffle_partitions=32)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        hi = ev.agg(F.max("user_id")).first()[0] + 1
        (
            ev.withColumn(
                "rep", F.explode(F.sequence(F.lit(0), F.lit(repl - 1)))
            )
            .withColumn("user_id", F.col("user_id") + F.col("rep") * hi)
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("rep") * F.lit(10**12),
            )
            .drop("rep")
            .repartition(64)
            .write.mode("overwrite")
            .parquet("/tmp/binid_fixture/events.parquet")
        )
        print("prepped /tmp/binid_fixture")
        return

    # all: fresh JVM per cell
    results = {}
    for cores in (8, 32):
        for variant in ("baseline", "binid"):
            out = subprocess.run(
                [sys.executable, __file__, "bench", str(cores), variant],
                capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith('{"cores"')]
            if not line:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise SystemExit(1)
            rec = json.loads(line[0])
            results[(cores, variant)] = rec
            print(line[0], flush=True)
    for variant in ("baseline", "binid"):
        s = results[(8, variant)]["min"] / results[(32, variant)]["min"]
        print(json.dumps({"variant": variant,
                          "speedup_8_to_32": round(s, 3)}), flush=True)
    d32 = results[(32, "baseline")]["min"] / results[(32, "binid")]["min"]
    print(json.dumps({"binid_32core_speedup_vs_baseline": round(d32, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
