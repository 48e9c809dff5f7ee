"""Incremental inverted-index maintenance over a document stream.

The retrieval twin of streaming/dedup.py: new documents land as
micro-batches and must become searchable without re-indexing the corpus.
Because postings rows are per-(term, doc) and documents are disjoint
across (deduplicated) batches, per-batch index fragments compose EXACTLY:
the accumulated table equals `build_inverted_index` over everything
ingested, in any batch split — the tested invariant, and the reason no
merge step is needed (contrast a term-level postings-array layout, which
would need a read-modify-write per term per batch).

Crash-safety follows the dedup module's single-sink discipline: re-delivered
or replayed documents are dropped by an anti-join against the index's own
doc_ids, so the only sink (the index append) is idempotent per batch; a
replayed batch whose append committed computes an empty fresh set and
returns.

Scale shape: the index is a Hive-bucketed table CLUSTERED BY (term), so
phrase/BM25 lookups join term postings without shuffling the index side,
and per-term reads at query time hit a bounded set of buckets. Appends are
repartitioned to `n_buckets` files per batch and compacted every
`compact_every` appends (same bounded small-file policy as the dedup
index). Real deployment: an Iceberg table with a `bucket(n, term)`
partition transform.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from .dedup import DOCUMENT_SCHEMA


def _index_table_name(index_dir: str) -> str:
    return "inv_idx_" + hashlib.md5(index_dir.encode()).hexdigest()[:12]


def read_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """The accumulated index as a DataFrame (through the session catalog so
    bucketing metadata survives into join planning)."""
    table = _index_table_name(index_dir)
    spark.catalog.refreshTable(table)
    return spark.table(table)


def start_incremental_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_buckets: int = 8,
    compact_every: int = 16,
):
    """document parquet dir -> per-batch postings appended to the
    term-bucketed index table."""
    from ..operators.retrieval import build_inverted_index

    idx_table = _index_table_name(index_dir)

    stream = (
        spark.readStream.schema(DOCUMENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def _append(postings: DataFrame) -> None:
        (
            postings.repartition(n_buckets, "term")
            .write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "term")
            .option("path", index_dir)
            .saveAsTable(idx_table)
        )

    def _maybe_compact() -> None:
        try:
            n_files = sum(1 for f in os.listdir(index_dir) if f.startswith("part-"))
        except FileNotFoundError:
            return
        if n_files <= compact_every * n_buckets:
            return
        full = read_index(spark, index_dir).localCheckpoint(eager=True)
        spark.sql(f"DROP TABLE IF EXISTS {idx_table}")
        import shutil

        shutil.rmtree(index_dir, ignore_errors=True)
        _append(full)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fresh = batch_df.dropDuplicates(["doc_id"])
        if spark.catalog.tableExists(idx_table):
            seen = read_index(spark, index_dir).select("doc_id").dropDuplicates()
            fresh = fresh.join(seen, "doc_id", "left_anti")
        if fresh.isEmpty():
            return  # replay of a committed batch / pure re-delivery
        _append(build_inverted_index(fresh))
        _maybe_compact()

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
