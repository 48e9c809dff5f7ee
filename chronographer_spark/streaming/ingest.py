"""Structured Streaming ingestion of new transcript partitions.

The reference is entirely batch (SURVEY.md §2.11); this is the engine's
stretch surface: new transcript files landing in a directory are picked up
as micro-batches, run through the SAME extraction + materialization code
path as batch, and appended to the triples table. Watermark on `ts` bounds
state for streaming dedup of re-delivered turns.

foreachBatch is used (rather than a streaming-only plan) precisely so the
batch pipeline functions are reused verbatim — one implementation, two
ingestion modes. `trigger(availableNow=True)` drains what's present and
stops: the test/bench mode and the nightly-catchup mode on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..extraction.mentions import extract_mentions
from ..graph.materialize import materialize_event_graph
from ..schemas import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger or 100)
        .parquet(input_dir)
    )
    return (
        reader.withWatermark("ts", watermark)
        # streaming dedup of re-delivered turns, state bounded by watermark
        .dropDuplicates(["conv_id", "turn_idx"])
    )


def start_triple_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """transcript parquet dir -> streaming micro-batches -> SEM triples."""
    stream = read_transcript_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        mentions = extract_mentions(batch_df)
        triples = materialize_event_graph(batch_df, mentions)
        (
            triples.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "30 minutes"
) -> DataFrame:
    """Event-time windowed aggregation with late-data handling: turns per
    conversation per tumbling window. The watermark bounds both the state
    (windows older than max(ts) - watermark are finalized and evicted) and
    late arrivals (rows older than the watermark are dropped) — the
    standard Structured Streaming pattern for unbounded per-key counters.

    Emitted in append mode: a window's row appears exactly once, when the
    watermark passes its end — idempotent downstream writes need no merge.
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "conv_id",
            "n_turns",
        )
    )


def start_windowed_counts_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    available_now: bool = True,
):
    from ..schemas import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .parquet(input_dir)
    )
    counts = windowed_turn_counts(stream, window, watermark)
    writer = (
        counts.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
