"""Incremental near-duplicate detection over a document stream.

The production crawl-ingestion pattern: new documents land as micro-batches
and must be checked against EVERYTHING already ingested without re-running
dedup over the whole corpus. Each batch computes its MinHash band buckets,
joins them against the accumulated bucket index (an append-only
Iceberg-shaped table on disk), emits candidate pairs exactly once, and
appends its own buckets to the index. foreachBatch + the streaming
checkpoint give exactly-once batch processing; re-delivered documents are
dropped by an anti-join against the index (idempotent ingestion without a
watermark column).

Invariant (tested): streaming a corpus in ANY batch split yields exactly
the pair set of batch `minhash_lsh_candidates` over the full corpus — a
pair (a, b) is emitted by whichever batch ingests the LATER of the two,
and only once even when the pair collides in several bands across batches
(bucket membership is static per doc, so all of a pair's collisions are
visible in that single batch and dedup there).

Scale shape: per-batch cost is |batch buckets| join |index| on the
(band, bucket) key — high cardinality, so the shuffle is well spread; the
full-corpus O(n²)-avoiding LSH structure is preserved incrementally. On a
real deployment the index lives in an Iceberg table bucketed by the join
key so the per-batch join is co-located.
"""

from __future__ import annotations

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
):
    """document parquet dir -> per-batch LSH -> candidate-pair + index sinks."""
    from ..operators.dedup import minhash_buckets

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        try:
            index = spark.read.parquet(index_dir)
            have_index = True
        except Exception:  # first batch: no index yet
            index = None
            have_index = False
        fresh = batch_df.dropDuplicates(["doc_id"])
        if have_index:
            seen = index.select("doc_id").dropDuplicates()
            fresh = fresh.join(seen, "doc_id", "left_anti")
        new_b = minhash_buckets(
            fresh, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
        ).localCheckpoint(eager=True)  # computed once: joined, then appended
        all_b = new_b if not have_index else new_b.unionByName(index)
        a = new_b.select(F.col("doc_id").alias("x"), "band", "bucket")
        b = all_b.select(F.col("doc_id").alias("y"), "band", "bucket")
        pairs = (
            a.join(b, ["band", "bucket"])
            .filter(F.col("x") != F.col("y"))
            .select(
                F.least("x", "y").alias("id_a"), F.greatest("x", "y").alias("id_b")
            )
            .dropDuplicates()
        )
        pairs.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            pairs_dir
        )
        new_b.write.mode("append").parquet(index_dir)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
