"""Incremental SCD-2 / temporal fact scoping over an event stream.

Streaming twin of :func:`..operators.temporal.scd2_compact`: as assertion
events arrive, each key's validity intervals are maintained so that after
every micro-batch the reconstructed table equals the batch operator run
over all events seen so far (pinned by the parity test).

Storage layout — an append-only CHANGE LOG, the lakehouse-shim version of
a MERGE INTO target: each micro-batch writes the FULL new interval set
for the keys it touched under ``log_dir/batch=<batch_id>`` with dynamic
partition overwrite, and the reader takes the latest batch per key. This
makes replay idempotent for free (the exactly-once lesson from
streaming/dedup.py's round-2 advice): a re-run batch recomputes from
partitions EARLIER than itself only, then overwrites its own partition
with identical content — no double counting, no torn state. Compaction
(folding old batch partitions into a base) bounds reader fan-in exactly
like the dedup index's compact_every.

Merge math: the stored table contributes each touched key's interval
rows as pre-aggregated runs; the batch contributes its own compacted
runs; re-running the island compaction over runs ordered by valid_from
(change-point on value, n_obs summed per island) yields the new interval
set — adjacent equal-value runs fuse, so the open interval extends or
closes exactly as the batch operator would have.

Ordering contract (same as streaming/dialogue.py and dedup.py): events
arrive in non-decreasing ts per key across batches; late data would need
a watermarked reorder buffer, deliberately out of scope and documented.

Scale notes: per batch, only TOUCHED keys are read back (predicate on the
key join) and rewritten; state per key is O(#changes), never the raw
events. The log partition count grows with batches — production puts
this behind Iceberg/Delta MERGE; the shim shows the exact dataflow.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import scd2_compact

LOG_SCHEMA_COLS = ["key", "value", "valid_from", "valid_to", "n_obs"]


def _compact_runs(runs: DataFrame) -> DataFrame:
    """Island compaction over pre-aggregated (key, value, valid_from,
    n_obs) runs: adjacent equal-value runs fuse, n_obs sums, valid_to =
    next island's start. Same lag/island idiom as the batch operator."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("key").orderBy("valid_from")
    chg = F.when(F.lag("value").over(w).eqNullSafe(F.col("value")), 0).otherwise(1)
    isl = runs.withColumn("__chg", chg).withColumn(
        "__isl", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    merged = isl.groupBy("key", "__isl").agg(
        F.first("value").alias("value"),
        F.min("valid_from").alias("valid_from"),
        F.sum("n_obs").alias("n_obs"),
    )
    w2 = Window.partitionBy("key").orderBy("valid_from")
    return merged.select(
        "key",
        "value",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.col("n_obs").cast("long").alias("n_obs"),
    )


def read_scd2_table(
    spark: SparkSession, log_dir: str, before_batch: int | None = None
) -> DataFrame:
    """Reconstruct the current interval table: the latest batch partition
    per key wins (each batch wrote the key's complete interval set).
    ``before_batch`` restricts to strictly-earlier partitions — the
    reader a replayed batch uses so its own prior output is invisible."""
    from pyspark.sql.window import Window

    try:
        log = spark.read.parquet(log_dir)
    except Exception:
        return None
    if before_batch is not None:
        log = log.filter(F.col("batch") < before_batch)
    w = Window.partitionBy("key")
    return (
        log.withColumn("__mx", F.max("batch").over(w))
        .filter(F.col("batch") == F.col("__mx"))
        .select(*LOG_SCHEMA_COLS)
    )


def start_scd2_stream(
    spark: SparkSession,
    input_dir: str,
    log_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    value_col: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
    available_now: bool = True,
    schema=None,
):
    """events parquet dir -> per-batch interval merge -> change-log sink.

    Keys are concatenated into one `key` string column (the log's
    partition-pruning and window key)."""
    stream = spark.readStream
    if schema is not None:
        stream = stream.schema(schema)
    stream = stream.option("maxFilesPerTrigger", 1).parquet(input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keyed = batch_df.withColumn(
            "key", F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        )
        batch_runs = scd2_compact(
            keyed, keys=["key"], value_col=value_col, ts_col=ts_col,
            tiebreak=tiebreak,
        ).select(
            "key", "value", "valid_from", F.col("n_obs").cast("long").alias("n_obs")
        )
        touched = batch_runs.select("key").dropDuplicates()
        prior = read_scd2_table(spark, log_dir, before_batch=batch_id)
        if prior is not None:
            prior_runs = prior.join(touched, "key", "left_semi").select(
                "key", "value", "valid_from", "n_obs"
            )
            all_runs = prior_runs.unionByName(batch_runs)
        else:
            all_runs = batch_runs
        # materialize BEFORE writing: `out`'s lineage reads log_dir, and
        # overwriting a path the plan still reads is undefined
        out = (
            _compact_runs(all_runs)
            .withColumn("batch", F.lit(int(batch_id)))
            .localCheckpoint(eager=True)
        )
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch")
            .parquet(log_dir)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_scd2_log(spark: SparkSession, log_dir: str, into_batch: int = -1):
    """Fold every batch partition into one base partition (`batch=-1` by
    default, ordered before all real batches) — bounds the reader's
    latest-batch window fan-in, the dedup-index compaction analogue."""
    cur = read_scd2_table(spark, log_dir)
    if cur is None:
        return
    staged = cur.withColumn("batch", F.lit(int(into_batch))).localCheckpoint(
        eager=True
    )
    import shutil

    shutil.rmtree(log_dir, ignore_errors=True)
    staged.write.mode("overwrite").partitionBy("batch").parquet(log_dir)
