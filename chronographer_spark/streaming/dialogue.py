"""Incremental conversation metrics over a transcript stream.

Streaming twin of :func:`..operators.dialogue.conversation_metrics`: per
conversation the running (n_turns, tool turns, role switches, duration,
gap stats) are maintained in `applyInPandasWithState` state and a refreshed
snapshot row is emitted every micro-batch that brings the conversation new
turns. The LATEST snapshot per conversation (the one with the largest
n_turns) always equals the batch operator run over all turns seen so far —
pinned by the parity test.

Why stateful-custom and not a windowed agg: role-switch and gap columns
depend on the PREVIOUS turn (ordering-sensitive), which built-in streaming
aggregations can't express; state carries exactly the O(1) tail needed
(last ts, last role) plus the running sums.

Ordering contract: within one micro-batch the group's rows are sorted by
(turn_idx); ACROSS batches turns must arrive in non-decreasing turn_idx
per conversation (an append-ordered source — the transcripts table's write
order). Late cross-batch turns would need a watermarked reorder buffer,
deliberately out of scope here and documented, matching the incremental
dedup module's append-only assumption.

Scale notes: state is keyed by conv_id (the table's bucketing key, so the
state-store shuffle aligns with input partitioning); per-key state is nine
scalars, never the turns themselves. An idle ProcessingTimeTimeout flush
(same contract as streaming/stateful.py) would bound state to active
conversations; the snapshot emission already makes eviction safe — the
last snapshot IS the final answer.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

METRICS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("n_tool_turns", LongType()),
        StructField("n_role_switches", LongType()),
        StructField("duration_us", LongType()),
        StructField("sum_gap_us", LongType()),
        StructField("max_gap_us", LongType()),
        StructField("n_long_gaps", LongType()),
    ]
)

OUT_COLS = [f.name for f in METRICS_SCHEMA.fields]

# state: running aggregates + the O(1) tail the next batch needs
STATE_SCHEMA = StructType(
    [
        StructField("n_turns", LongType()),
        StructField("n_tool", LongType()),
        StructField("n_switch", LongType()),
        StructField("first_us", LongType()),
        StructField("last_us", LongType()),
        StructField("last_role", StringType()),
        StructField("sum_gap", LongType()),
        StructField("max_gap", LongType()),
        StructField("n_long", LongType()),
    ]
)


def _metrics_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    long_gap_s: int,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        (n_turns, n_tool, n_switch, first_us, last_us, last_role,
         sum_gap, max_gap, n_long) = state.get
    else:
        n_turns = n_tool = n_switch = sum_gap = max_gap = n_long = 0
        first_us = last_us = None
        last_role = None

    chunks = list(pdfs)
    whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if not len(whole):
        yield pd.DataFrame(columns=OUT_COLS)
        return
    # one sort over the key's full micro-batch (chunks carry no order)
    whole = whole.sort_values("turn_idx", kind="mergesort")
    thresh_us = long_gap_s * 1_000_000
    us_list = (whole["ts"].astype("int64") // 1000).tolist()
    for us, role, tool in zip(us_list, whole["role"], whole["tool"]):
        us = int(us)
        if last_us is not None:
            gap = us - last_us
            sum_gap += gap
            if gap > max_gap:
                max_gap = gap
            if gap > thresh_us:
                n_long += 1
        if last_role is not None and role != last_role:
            n_switch += 1
        if first_us is None:
            first_us = us
        if tool != "":
            n_tool += 1
        n_turns += 1
        last_us = us
        last_role = role

    state.update(
        (n_turns, n_tool, n_switch, first_us, last_us, last_role,
         sum_gap, max_gap, n_long)
    )
    yield pd.DataFrame(
        [
            (
                conv_id,
                n_turns,
                n_tool,
                n_switch,
                last_us - first_us,
                sum_gap,
                max_gap,
                n_long,
            )
        ],
        columns=OUT_COLS,
    )


def conversation_metrics_stream(
    transcripts: DataFrame, long_gap_s: int = 300
) -> DataFrame:
    """Streaming DataFrame of per-conversation metric SNAPSHOTS (one row
    per conversation per micro-batch that delivered it new turns; the
    latest snapshot equals the batch operator over all turns so far)."""

    def fn(key, pdfs, state):
        yield from _metrics_group(key, pdfs, state, long_gap_s)

    return transcripts.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=METRICS_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_metrics_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    long_gap_s: int = 300,
    max_files_per_trigger: int = 1,
):
    """transcript parquet dir -> incremental metrics -> snapshot sink.

    max_files_per_trigger=1 forces one micro-batch per input file so the
    parity test exercises true cross-batch state carry-over.
    """
    from ..schemas import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    snapshots = conversation_metrics_stream(stream, long_gap_s)
    return (
        snapshots.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
