"""Custom stateful streaming operator: gap-based conversation sessionization.

The reference has no streaming at all (SURVEY.md §2.11); this is the
engine's `applyInPandasWithState` surface — the Spark primitive for
arbitrary keyed state the built-in windowed aggregations can't express
(per-conversation open-session accumulation with gap-close semantics).

Semantics (mirrors the batch :func:`..operators.temporal.sessionize`):
rows for one conversation arrive in micro-batches; a session closes when a
later row is more than `gap_seconds` after the previous one. Closed
sessions are emitted as (conv_id, session_seq, n_turns, begin_ts, end_ts);
the still-open tail session stays in state across micro-batches (bounded:
one small tuple per active conversation; a production deployment adds a
ProcessingTimeTimeout to flush conversations gone quiet).

Scale notes: state is keyed by conv_id — the same bucketing key as the
transcripts table, so the state-store shuffle aligns with the input
partitioning; per-key state is O(1) (four scalars), never the turns
themselves.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("session_seq", IntegerType()),
        StructField("session_key", StringType()),
        StructField("n_turns", LongType()),
        StructField("begin_ts", TimestampType()),
        StructField("end_ts", TimestampType()),
    ]
)

# Eviction contract: an idle flush removes the key's state entirely (that is
# the point — state stays bounded to ACTIVE conversations), so a conversation
# that resumes AFTER a flush restarts session_seq at 1. Consumers that need a
# collision-free session identity across flushes key on `session_key`
# (conv_id + '#' + begin epoch-us): sessions of one conversation are disjoint
# time ranges, so their begin timestamps are distinct with no cross-flush
# memory required.
OUT_COLS = ["conv_id", "session_seq", "session_key", "n_turns", "begin_ts", "end_ts"]

# state: (session_seq, n_turns, begin_epoch_us, last_epoch_us)
STATE_SCHEMA = StructType(
    [
        StructField("session_seq", IntegerType()),
        StructField("n_turns", LongType()),
        StructField("begin_us", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
    idle_flush_seconds: int | None = None,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if idle_flush_seconds is not None and state.hasTimedOut:
        # conversation went quiet past the processing-time horizon: flush
        # the open tail session and drop the key's state entirely
        seq, n_turns, begin_us, last_us = state.get
        state.remove()
        out = pd.DataFrame(
            [(conv_id, seq, n_turns, begin_us, last_us)],
            columns=["conv_id", "session_seq", "n_turns", "begin_us", "last_us"],
        )
        out["begin_ts"] = pd.to_datetime(out["begin_us"], unit="us")
        out["end_ts"] = pd.to_datetime(out["last_us"], unit="us")
        out["session_key"] = out["conv_id"] + "#" + out["begin_us"].astype(str)
        yield out[OUT_COLS]
        return
    if state.exists:
        seq, n_turns, begin_us, last_us = state.get
    else:
        seq, n_turns, begin_us, last_us = 1, 0, None, None

    closed: list[tuple[Any, ...]] = []
    # applyInPandasWithState may deliver one key's micro-batch rows split
    # across several Arrow chunks with NO global order guarantee — sorting
    # each chunk independently would produce spurious session closes across
    # chunk boundaries. Materialize the key's batch once (all chunks for a
    # key arrive together) and sort the whole thing; per-key state stays
    # O(1), only the batch's own rows are held.
    chunks = list(pdfs)
    whole = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(whole):
        whole = whole.sort_values(["ts", "turn_idx"], kind="mergesort")
        # pandas datetime64[ns] -> integer epoch microseconds
        for us in (whole["ts"].astype("int64") // 1000).tolist():
            us = int(us)
            if last_us is not None and us - last_us > gap_seconds * 1_000_000:
                closed.append((conv_id, seq, n_turns, begin_us, last_us))
                seq += 1
                n_turns, begin_us = 0, None
            if begin_us is None:
                begin_us = us
            n_turns += 1
            last_us = us

    state.update((seq, n_turns, begin_us, last_us))
    if idle_flush_seconds is not None:
        state.setTimeoutDuration(idle_flush_seconds * 1000)
    out = pd.DataFrame(
        closed, columns=["conv_id", "session_seq", "n_turns", "begin_us", "last_us"]
    )
    out["begin_ts"] = pd.to_datetime(out["begin_us"], unit="us")
    out["end_ts"] = pd.to_datetime(out["last_us"], unit="us")
    out["session_key"] = out["conv_id"] + "#" + out["begin_us"].astype(str)
    yield out[OUT_COLS]


def sessionize_stream(
    transcripts: DataFrame,
    gap_seconds: int = 1800,
    idle_flush_seconds: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of CLOSED sessions per conversation.

    `idle_flush_seconds` arms a ProcessingTimeTimeout per conversation:
    when no new turns arrive for that long (wall clock), the open tail
    session is flushed and the key's state removed — bounding state to
    ACTIVE conversations instead of every conversation ever seen (the
    production requirement for an unbounded key space).
    """

    def fn(key, pdfs, state):
        yield from _sessionize_group(key, pdfs, state, gap_seconds, idle_flush_seconds)

    return transcripts.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_flush_seconds is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def start_session_stream(
    spark,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    available_now: bool = True,
    idle_flush_seconds: int | None = None,
    processing_interval: str | None = None,
):
    """transcript parquet dir -> stateful sessionizer -> closed-session sink.

    Pass `idle_flush_seconds` (with `available_now=False` and a
    `processing_interval` like "1 second") to run the idle-conversation
    flush: processing-time timeouts only fire on subsequent triggers, so
    they need a continuously-triggering query, not an availableNow drain.
    """
    from ..schemas import TRANSCRIPT_SCHEMA

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .parquet(input_dir)
    )
    sessions = sessionize_stream(stream, gap_seconds, idle_flush_seconds)
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_interval:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()
