"""Stateful streaming drift detection: online CUSUM per key.

The batch :func:`..operators.temporal.cusum_alarms` is retrospective — its
zero-mean deviations use the key's FINAL total/bucket counts, which a stream
cannot know. The standard online form (Page 1954 as actually deployed in
monitoring) tracks deviations against a FIXED per-key target rate: when a
time bucket closes, d = n_bucket − target and S = max(0, S + d); S > thr
raises the alarm. This module is that operator on Structured Streaming via
``applyInPandasWithState`` — per-key state is three scalars (open bucket,
its count, S), never the events.

Contract (mirrored exactly by :func:`cusum_stream_batch_twin`, the
batch-parity oracle — DuckDB can't replay streams, batch parity is the
right check, same as every streaming op in this package):

- buckets are the key's ACTIVE buckets in arrival order (gaps contribute
  nothing — the batch operator's convention);
- a bucket closes when a strictly later bucket's first row arrives; the
  final open bucket is never emitted (it would need stream end);
- late rows (bucket <= the open one) fold into the OPEN bucket — the
  documented coarsening for out-of-order tails; feed bucket-ordered input
  (an event log read in order) for exact parity;
- every close emits (key, bucket_ts, n_events, s_scaled, alarm); all
  integers, `alarm` = 1 iff the running S exceeds ``thr`` AFTER folding
  this bucket in.

Scale notes: state is keyed by the same column the input is partitioned
on, so the state-store shuffle aligns with ingest; emission is append-only
(each closed bucket emitted exactly once by the state machine, replay
protected by the sink checkpoint like streaming/dedup.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)
from pyspark.sql.window import Window

CUSUM_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("bucket_ts", TimestampType()),
        StructField("n_events", LongType()),
        StructField("s_scaled", LongType()),
        StructField("alarm", IntegerType()),
    ]
)

# state: (open_bucket_us, n_in_bucket, s)
CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("bucket_us", LongType()),
        StructField("n", LongType()),
        StructField("s", LongType()),
    ]
)

_BUCKET_US = {"hour": 3_600_000_000, "day": 86_400_000_000}


def _cusum_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    bucket_us: int,
    target: int,
    thr: int,
) -> Iterator[pd.DataFrame]:
    (k,) = key
    if state.exists:
        open_us, n, s = state.get
    else:
        open_us, n, s = None, 0, 0

    closed: list[tuple] = []
    chunks = list(pdfs)
    whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(whole):
        whole = whole.sort_values("ts", kind="mergesort")
        for us in (whole["ts"].astype("int64") // 1000).tolist():
            b = (int(us) // bucket_us) * bucket_us
            if open_us is None:
                open_us = b
            elif b > open_us:
                s = max(0, s + (n - target))
                closed.append((k, open_us, n, s, 1 if s > thr else 0))
                open_us, n = b, 0
            # b <= open_us (late row): folds into the open bucket
            n += 1

    state.update((open_us, n, s))
    out = pd.DataFrame(
        closed, columns=["key", "bucket_us", "n_events", "s_scaled", "alarm"]
    )
    out["bucket_ts"] = pd.to_datetime(out["bucket_us"], unit="us")
    yield out[["key", "bucket_ts", "n_events", "s_scaled", "alarm"]]


def cusum_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    target: int = 10,
    thr: int = 20,
) -> DataFrame:
    """Streaming DataFrame of CLOSED buckets with the running CUSUM."""
    bucket_us = _BUCKET_US[bucket]
    src = events.select(
        F.col(key_col).cast("string").alias("key"), F.col(ts_col).alias("ts")
    )

    def fn(key, pdfs, state):
        yield from _cusum_group(key, pdfs, state, bucket_us, target, thr)

    return src.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=CUSUM_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cusum_stream_batch_twin(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    target: int | None = 10,
    thr: int | None = 20,
    thr_mult: int = 2,
) -> DataFrame:
    """Batch replay of the stream contract on bucket-ordered input: same
    active-bucket counts, same online recurrence via the prefix-sum window
    identity (d = n − target), and the LAST bucket per key withheld (it
    never closes in the stream).

    ``target=None`` is the CALIBRATION convention for the oracle gate: the
    target becomes the key's empirical per-bucket mean, total DIV n_buckets
    (exact truncated quotient — both engines replay it), and ``thr=None``
    derives the threshold as ``thr_mult × target`` so the query is
    scale-free. Streaming deployments pass fixed ints (a stream cannot know
    its final mean); the parity test exercises that path.
    """
    counts = (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .groupBy("key", "bucket_ts")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=True)
    )
    if target is None:
        per_key = counts.groupBy("key").agg(
            F.expr("sum(n_events) DIV count(1)").cast("long").alias("__tgt")
        )
        counts = counts.join(F.broadcast(per_key), "key")
        tgt = F.col("__tgt")
    else:
        tgt = F.lit(int(target)).cast("long")
    thr_col = (
        (F.lit(int(thr_mult)).cast("long") * tgt)
        if thr is None
        else F.lit(int(thr)).cast("long")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("key")
    d = F.col("n_events") - tgt
    staged = (
        counts.withColumn("__p", F.sum(d).over(w))
        .withColumn("__m", F.min(F.col("__p")).over(w))
        .withColumn("__last", F.max("bucket_ts").over(w_all))
    )
    s = F.col("__p") - F.least(F.lit(0).cast("long"), F.col("__m"))
    return (
        staged.filter(F.col("bucket_ts") < F.col("__last"))
        .withColumn("s_scaled", s.cast("long"))
        .withColumn(
            "alarm",
            F.when(F.col("s_scaled") > thr_col, 1).otherwise(0).cast("int"),
        )
        .select("key", "bucket_ts", "n_events", "s_scaled", "alarm")
    )


def start_cusum_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    target: int = 10,
    thr: int = 20,
):
    """parquet event dir -> online CUSUM -> closed-bucket alarm sink."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 100)
        .parquet(input_dir)
    )
    out = cusum_stream(stream, key_col, ts_col, bucket, target, thr)
    return (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Incremental distribution-drift monitor: cumulative exact KS vs a frozen
# reference, maintained as mergeable per-batch count fragments.
# ---------------------------------------------------------------------------


def read_ks_drift(
    spark: SparkSession,
    frag_dir: str,
    reference: DataFrame,
    n_parts: int = 32,
) -> DataFrame:
    """Exact KS between everything streamed so far and a frozen reference
    count table (v, n). The accumulated side is the fragment sum — counts
    are mergeable, so the statistic equals the batch `ks_two_sample` over
    the full delivered corpus in ANY batch split (parity-tested)."""
    from ..operators.temporal import ks_from_counts

    acc = (
        spark.read.parquet(frag_dir)
        .groupBy("v")
        .agg(F.sum("n").alias("ca"))
    )
    ref = reference.select(
        F.col("v").cast("long").alias("v"), F.col("n").cast("long").alias("cb")
    )
    cnt = (
        acc.join(ref, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    return ks_from_counts(cnt, n_parts=n_parts)


def start_incremental_ks_stream(
    spark: SparkSession,
    input_dir: str,
    frag_dir: str,
    checkpoint_dir: str,
    value_expr,
    schema,
    available_now: bool = True,
):
    """events/documents parquet dir -> per-batch (v, n) count fragments
    under `frag_dir/frag=<batch_id>` — the state a live drift monitor
    accumulates. Crash-safety is the sketch-fragment mechanism
    (streaming/sketches.py): DYNAMIC PARTITION OVERWRITE on
    frag=batch_id makes a replayed micro-batch overwrite its own
    fragment with identical content instead of double-counting; counts
    are mergeable, so compaction/merging is a groupBy-sum away, and
    `read_ks_drift` is exact at any point. ``value_expr`` maps a row to
    the INTEGER drift value (pre-scale floats per the ks_two_sample
    contract)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        frag = (
            batch_df.select(value_expr.cast("long").alias("v"))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("frag", F.lit(int(batch_id)))
        )
        (
            frag.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("frag")
            .parquet(frag_dir)
        )

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
