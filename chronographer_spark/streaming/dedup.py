"""Incremental near-duplicate detection over a document stream.

The production crawl-ingestion pattern: new documents land as micro-batches
and must be checked against EVERYTHING already ingested without re-running
dedup over the whole corpus. Each batch computes its MinHash band buckets,
joins them against the accumulated bucket index (a BUCKETED table clustered
by the (band, bucket) join key), emits candidate pairs exactly once, and
appends its own buckets to the index. foreachBatch + the streaming
checkpoint give exactly-once batch processing; re-delivered documents are
dropped by an anti-join against the index (idempotent ingestion without a
watermark column).

Exactly-once under mid-batch failure (not just graceful restart): the two
sinks are made individually idempotent rather than jointly atomic —
  * pairs are written to a per-batch partition directory
    (`<pairs_dir>/batch_id=N`) with overwrite mode, so a replayed batch
    overwrites its own earlier (possibly partial) output instead of
    appending a second copy;
  * the index is appended LAST, and a replayed batch whose index append
    already committed sees all its docs in the index, computes an empty
    `fresh` set and returns before touching either sink — the previously
    committed pairs partition survives.
The only non-idempotent window left is the parquet commit protocol itself
(temp-dir rename); on a real deployment both sinks are Iceberg tables whose
appends are atomic snapshots.

Invariant (tested): streaming a corpus in ANY batch split yields exactly
the pair set of batch `minhash_lsh_candidates` over the full corpus — a
pair (a, b) is emitted by whichever batch ingests the LATER of the two,
and only once even when the pair collides in several bands across batches
(bucket membership is static per doc, so all of a pair's collisions are
visible in that single batch and dedup there).

Scale shape: per-batch cost is |batch buckets| join |index| on the
(band, bucket) key. The index is a Hive-bucketed table CLUSTERED BY
(band, bucket) — the big (index) side of the per-batch join carries
bucketing metadata, so Spark plans NO exchange on it; only the small batch
side shuffles (plan-pinned in tests/test_plans.py). Each batch appends at
most `n_buckets` files and every `compact_every` batches the table is
rewritten, so the small-file count stays bounded. On a real deployment the
same layout is Iceberg's `bucket(n, band || bucket)` partition transform,
whose catalog also keeps the bucketing metadata across sessions (the
sandbox shim re-registers via the live session catalog).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)


def _index_table_name(index_dir: str) -> str:
    return "dedup_idx_" + hashlib.md5(index_dir.encode()).hexdigest()[:12]


def start_incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    pairs_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 8,
    bands: int = 2,
    shingle_n: int = 1,
    available_now: bool = True,
    n_buckets: int = 8,
    compact_every: int = 16,
):
    """document parquet dir -> per-batch LSH -> candidate-pair + index sinks.

    ``n_buckets``: bucket count of the (band, bucket)-clustered index table.
    ``compact_every``: rewrite the index table whenever its file count
    exceeds ``compact_every * n_buckets`` (i.e. roughly every
    ``compact_every`` appends), bounding small files.
    """
    from ..operators.dedup import minhash_buckets

    idx_table = _index_table_name(index_dir)

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _index_exists() -> bool:
        return spark.catalog.tableExists(idx_table)

    def _read_index() -> DataFrame:
        # through the session catalog so the bucketing metadata is visible
        # (a plain path read of the same files would re-shuffle on join).
        # refreshTable first: appends run in the micro-batch's cloned session
        # and invalidate only ITS relation cache — without the refresh this
        # session serves a stale file listing and batches join a partial index
        spark.catalog.refreshTable(idx_table)
        return spark.table(idx_table)

    def _append_index(new_b: DataFrame) -> None:
        writer = (
            new_b.repartition(n_buckets, "band", "bucket")
            .write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "band", "bucket")
            .option("path", index_dir)
        )
        writer.saveAsTable(idx_table)

    def _maybe_compact() -> None:
        try:
            n_files = sum(
                1 for f in os.listdir(index_dir) if f.startswith("part-")
            )
        except FileNotFoundError:
            return
        if n_files <= compact_every * n_buckets:
            return
        full = _read_index().localCheckpoint(eager=True)
        spark.sql(f"DROP TABLE IF EXISTS {idx_table}")
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        _append_index(full)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        have_index = _index_exists()
        fresh = batch_df.dropDuplicates(["doc_id"])
        if have_index:
            seen = _read_index().select("doc_id").dropDuplicates()
            fresh = fresh.join(seen, "doc_id", "left_anti")
        if fresh.isEmpty():
            # replay of a fully committed batch (or pure re-delivery):
            # the pairs partition for this batch is already on disk — leave it
            return
        new_b = minhash_buckets(
            fresh, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
        ).localCheckpoint(eager=True)  # computed once: joined, then appended
        a = new_b.select(F.col("doc_id").alias("x"), "band", "bucket")
        b = a.select(F.col("x").alias("y"), "band", "bucket")
        if have_index:
            b = b.unionByName(
                _read_index().select(F.col("doc_id").alias("y"), "band", "bucket")
            )
        pairs = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("id_a"), F.greatest("x", "y").alias("id_b")
            )
            .dropDuplicates()
        )
        # idempotent per-batch sink: replay overwrites, never appends twice
        pairs.write.mode("overwrite").parquet(
            os.path.join(pairs_dir, f"batch_id={batch_id}")
        )
        _append_index(new_b)
        _maybe_compact()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
