"""Incremental entity canonicalization over an alias-edge stream.

The north-star pipeline's canonical entity dictionary (linking/
canonicalize.py: salted match edges -> connected components -> referent
map) maintained INCREMENTALLY: alias edges land as micro-batches and the
node -> component index must absorb them without re-running CC over every
edge ever seen. The reference recomputes its referent dictionary per run
(src/build_ng + pandas); at crawl scale the index is the persistent
artifact and each batch touches only the components it merges.

Per micro-batch (foreachBatch + streaming checkpoint):
1. look up the batch's endpoints in the index — the endpoint set is
   batch-sized, so it is BROADCAST into the index scan (map-only semi
   join; the index never shuffles for the lookup);
2. contract each endpoint to its current component root and run the
   existing :func:`~chronographer_spark.linking.canonicalize.
   connected_components` over the CONTRACTED batch edges — a graph whose
   size is bounded by the batch, never the corpus;
3. derive the remap (old_root -> new_root, new_root = min id, matching
   batch CC's canonical labels) and the fresh-node assignments;
4. rewrite ONLY the affected index partitions. The index is parquet
   partitioned by part = pmod(xxhash64(node), n_parts): rows never move
   partitions (the partition key is the NODE, the value that changes is
   the comp), so the rewrite set is exactly {partitions holding a row of
   a remapped comp} ∪ {partitions of fresh nodes} — discovered with one
   comp-pushdown scan — and dynamic partition overwrite leaves every
   other partition untouched. On a real deployment the same layout is an
   Iceberg table with `bucket(n, node)` partitioning and a MERGE INTO;
   the dynamic-overwrite shim has the identical pruning shape.

Exactly-once under mid-batch failure: the index is the ONLY sink, and the
update is idempotent — a replayed batch re-reads the (possibly partially
updated) index, re-contracts through whatever roots are already in place,
and re-derives the same final roots, because (a) every node's comp always
points to SOME member of its true component (partial remap preserves
this: it only ever rewrites comp to the merged root), and (b) the batch's
own edges re-establish the full connectivity among the touched
components, so the min-id root is recomputed identically. A fully
committed replay computes an empty remap and no fresh nodes, and returns
without writing.

Invariant (tested): streaming a corpus of edges in ANY batch split yields
exactly `connected_components(all_edges)` — same (node, component) set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

EDGE_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
    ]
)


def start_incremental_cc_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    n_parts: int = 16,
    available_now: bool = True,
):
    """edge parquet dir -> incrementally maintained (node, comp, part) index.

    Read the current dictionary with :func:`read_cc_index`.
    """

    def part_expr(col: str):
        return F.pmod(F.xxhash64(F.col(col)), F.lit(n_parts)).alias("part")

    def _index_exists() -> bool:
        return os.path.isdir(index_dir) and any(
            f.startswith("part=") for f in os.listdir(index_dir)
        )

    def _read_index() -> DataFrame:
        return spark.read.parquet(index_dir)

    stream = (
        spark.readStream.schema(EDGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..linking.canonicalize import connected_components

        edges = (
            batch_df.filter(F.col("src") != F.col("dst"))
            .select("src", "dst")
            .dropDuplicates()
        )
        if edges.isEmpty():
            return
        edges = edges.localCheckpoint(eager=True)
        endpoints = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .dropDuplicates()
        )
        have_index = _index_exists()
        if have_index:
            # batch-sized endpoint set broadcast into the index scan:
            # the corpus-scale side never shuffles for the lookup
            lookup = _read_index().join(F.broadcast(endpoints), "node").select(
                "node", "comp"
            )
        else:
            lookup = endpoints.select(
                "node", F.lit(None).cast("long").alias("comp")
            ).filter(F.lit(False))
        lookup = lookup.localCheckpoint(eager=True)
        mapped = (
            edges.join(
                lookup.select(F.col("node").alias("src"), F.col("comp").alias("cs")),
                "src",
                "left",
            )
            .join(
                lookup.select(F.col("node").alias("dst"), F.col("comp").alias("cd")),
                "dst",
                "left",
            )
            .select(
                F.coalesce("cs", "src").alias("src"),
                F.coalesce("cd", "dst").alias("dst"),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        if mapped.isEmpty():
            # every edge contracted into an existing component: pure
            # re-delivery (or an intra-component batch) — nothing to do
            return
        # CC over the CONTRACTED batch graph: size bounded by the batch
        cc = connected_components(mapped).localCheckpoint(eager=True)
        remap = (
            cc.filter(F.col("node") != F.col("component"))
            .select(F.col("node").alias("old_comp"), F.col("component").alias("new_comp"))
        )
        fresh = (
            endpoints.join(lookup.select("node"), "node", "left_anti")
            .join(cc, "node", "left")
            .select(
                "node",
                F.coalesce("component", "node").alias("comp"),
            )
        ).localCheckpoint(eager=True)
        if have_index:
            # partitions holding any remapped comp (comp-pushdown scan) ...
            idx = _read_index()
            affected = (
                idx.join(F.broadcast(remap), idx["comp"] == remap["old_comp"])
                .select(F.col("part").cast("long").alias("part"))
                .dropDuplicates()
            )
        else:
            affected = spark.createDataFrame([], "part long")
        # ... plus the fresh nodes' own partitions
        parts = (
            affected.unionByName(
                fresh.select(part_expr("node")).dropDuplicates()
            )
            .dropDuplicates()
            .localCheckpoint(eager=True)
        )
        part_list = [r["part"] for r in parts.collect()]  # <= n_parts ints
        if not part_list:
            return  # fully committed replay: nothing to do
        if have_index:
            cur = (
                _read_index()
                .filter(F.col("part").isin(part_list))
                .join(F.broadcast(remap), F.col("comp") == F.col("old_comp"), "left")
                .select(
                    "node",
                    F.coalesce("new_comp", "comp").alias("comp"),
                    F.col("part").cast("long").alias("part"),
                )
            )
            out = cur.unionByName(
                fresh.select("node", "comp", part_expr("node"))
            )
        else:
            out = fresh.select("node", "comp", part_expr("node"))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                out.repartition(len(part_list), "part")
                .write.mode("overwrite")
                .partitionBy("part")
                .parquet(index_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cc_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """(node, comp) — the current canonical dictionary."""
    return spark.read.parquet(index_dir).select("node", "comp")
