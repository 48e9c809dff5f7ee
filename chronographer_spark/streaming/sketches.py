"""Incremental sketch maintenance over a stream: mergeability, operationalized.

The CMS/HLL/Bloom tables in operators/sketches.py are DataFrame-shaped
precisely so that per-shard sketches compose by a tiny groupBy; this module
turns that algebra into a live pipeline: each micro-batch becomes a sketch
FRAGMENT of ≤ depth·width rows written under `frag=<batch_id>`, and the
accumulated sketch is the groupBy-sum (CMS) of all fragments. Heavy-hitter
or frequency queries read a table whose size is fragments × depth × width —
independent of how many billions of items streamed through.

Crash-safety — different mechanism from streaming/dedup.py and
streaming/index.py, because a sketch has no row identities to anti-join on:
the fragment write uses DYNAMIC PARTITION OVERWRITE on `frag=batch_id`, so
a replayed micro-batch (foreachBatch re-delivers the last uncommitted batch
after a crash) overwrites its own fragment with identical content instead of
double-counting. What this does NOT dedupe is content-level re-delivery
under a NEW batch id (the same documents arriving twice as distinct files):
frequency semantics count what is delivered — run the dedup stream upstream
if exactly-once content counting is required.

Compaction is deliberately OFFLINE (`compact_cms_fragments`, stream
stopped): folding older fragments into the current batch's partition inside
foreachBatch would break replay idempotency — a re-run would overwrite the
compacted partition with only the batch's own counts and lose the folded
mass. Production layout: a state-store-backed running sketch, or an Iceberg
MERGE keyed on (d, bucket); the fragment log here is the portable shim.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import DOCUMENT_SCHEMA


def read_cms(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The accumulated (d, bucket, cnt) sketch: fragment sum. Equals
    `cms_table` over everything delivered, in any batch split."""
    frags = spark.read.parquet(sketch_dir)
    return frags.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def compact_cms_fragments(spark: SparkSession, sketch_dir: str) -> None:
    """Offline compaction (stream must be stopped): fold every fragment into
    a single `frag=0` partition so reads stop unioning per-batch files."""
    merged = read_cms(spark, sketch_dir).localCheckpoint(eager=True)
    import shutil

    shutil.rmtree(sketch_dir, ignore_errors=True)
    merged.withColumn("frag", F.lit(0)).write.partitionBy("frag").mode(
        "overwrite"
    ).parquet(sketch_dir)


def start_incremental_cms_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    depth: int = 4,
    width: int = 256,
    available_now: bool = True,
    item_expr=None,
):
    """document parquet dir -> per-batch CMS fragments under
    `sketch_dir/frag=<batch_id>`.

    `item_expr` (optional Column) maps a document row to the counted item —
    a generator like `F.explode(tokens)` fans one document into many items;
    the default counts the raw `col` values."""
    from ..operators.sketches import cms_table

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        items = (
            batch_df.select(item_expr.alias("__item"))
            if item_expr is not None
            else batch_df.select(F.col(col).alias("__item"))
        )
        frag = cms_table(items, "__item", depth=depth, width=width).withColumn(
            "frag", F.lit(int(batch_id))
        )
        (
            frag.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("frag")
            .parquet(sketch_dir)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_fragment_count(sketch_dir: str) -> int:
    """How many fragment partitions exist (compaction diagnostics)."""
    try:
        return sum(1 for d in os.listdir(sketch_dir) if d.startswith("frag="))
    except FileNotFoundError:
        return 0


def read_hll(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The accumulated (bucket, rho) HLL register table: fragment MAX (the
    HLL merge operator). Equals `hll_registers` over everything delivered,
    in any batch split — max is idempotent AND commutative, so fragment
    replay and out-of-order reads both land on the same registers."""
    frags = spark.read.parquet(sketch_dir)
    return frags.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_stream_estimate(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """One-row BIGINT estimate from the accumulated fragment registers."""
    from ..operators.sketches import hll_estimate

    return hll_estimate(read_hll(spark, sketch_dir))


def compact_hll_fragments(spark: SparkSession, sketch_dir: str) -> None:
    """Offline compaction (stream stopped): fold fragments into `frag=0`."""
    merged = read_hll(spark, sketch_dir).localCheckpoint(eager=True)
    import shutil

    shutil.rmtree(sketch_dir, ignore_errors=True)
    merged.withColumn("frag", F.lit(0)).write.partitionBy("frag").mode(
        "overwrite"
    ).parquet(sketch_dir)


def start_incremental_hll_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    available_now: bool = True,
    item_expr=None,
):
    """document parquet dir -> per-batch HLL register fragments under
    `sketch_dir/frag=<batch_id>` — running approximate-distinct (e.g. live
    vocabulary size) with state bounded at M registers per fragment
    regardless of stream volume. Same crash-safety mechanism as the CMS
    stream: dynamic partition overwrite on `frag=batch_id` makes replayed
    micro-batches overwrite their own fragment."""
    from ..operators.sketches import hll_registers

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        items = (
            batch_df.select(item_expr.alias("__item"))
            if item_expr is not None
            else batch_df.select(F.col(col).alias("__item"))
        )
        frag = hll_registers(items, "__item").withColumn(
            "frag", F.lit(int(batch_id))
        )
        (
            frag.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("frag")
            .parquet(sketch_dir)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bloom(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """The accumulated bloom filter: distinct bit positions across fragments
    (union-distinct is the bloom merge — idempotent, so replay-safe)."""
    return spark.read.parquet(sketch_dir).select("bit").distinct()


def start_incremental_bloom_stream(
    spark: SparkSession,
    input_dir: str,
    sketch_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    m_bits: int = 8192,
    k_hashes: int = 3,
    available_now: bool = True,
    item_expr=None,
):
    """document parquet dir -> per-batch bloom-bit fragments under
    `sketch_dir/frag=<batch_id>` — a membership filter that stays current
    as the corpus streams in (the decontamination pre-pass gets a live
    train-side filter instead of a nightly rebuild). Fragment replay
    overwrites its own partition; union-distinct merge makes duplicate
    bits harmless. Completes the mergeable-sketch trio with CMS and HLL."""
    from ..operators.sketches import bloom_build

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        items = (
            batch_df.select(item_expr.alias("__item"))
            if item_expr is not None
            else batch_df.select(F.col(col).alias("__item"))
        )
        frag = bloom_build(items, "__item", m_bits=m_bits, k_hashes=k_hashes)
        frag.withColumn("frag", F.lit(int(batch_id))).coalesce(1).write.mode(
            "overwrite"
        ).option("partitionOverwriteMode", "dynamic").partitionBy("frag").parquet(
            sketch_dir
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
