"""Deterministic synthetic transcripts (FIXTURES.md §1) + a transcripts view
derived from the driver-provided `events` table.

The synthetic generator is the engine's primary test/bench input: an
Iceberg-shaped table (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp). Generation is seeded numpy — byte-reproducible.

Fixture edge cases baked in (FIXTURES.md §1):
- a hub entity in ~30% of turns (join-skew fixture),
- one single-turn conversation,
- physically shuffled row order (ordering-invariance fixture),
- duplicated turn rows (dedup fixture, cf. reference src/interface.py:171).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..schemas import TRANSCRIPT_SCHEMA
from ..vocab import HUB_ENTITY, PERSONS, PLACES, TOOLS

ROLES = ["user", "assistant", "tool"]

_TEMPLATES = [
    "{person} met {person2} in {place} on {date} to review the plan.",
    "the report from {place} dated {date} mentions {person}.",
    "{person} asked about {place} and the deadline {date}.",
    "summary: {person} travelled to {place}; arrival {date}.",
    "tool output for {place}: status ok as of {date}.",
    "{person} and {person2} disagreed about {place} on {date}.",
    "no entities here, just filler text about nothing in particular.",
    "{person} signed the order at {place2} near {place} on {date}.",
]

BASE_EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def generate_transcripts_pdf(
    n_convs: int = 50,
    n_turns: int = 8,
    seed: int = 42,
    hub_fraction: float = 0.3,
) -> pd.DataFrame:
    """Seeded synthetic transcripts as pandas (vectorized; no per-row loops)."""
    rng = np.random.default_rng(seed)
    conv_lens = rng.integers(max(1, n_turns // 2), n_turns + 1, size=n_convs)
    conv_lens[0] = 1  # single-turn conversation fixture
    conv_no = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate([np.arange(l) for l in conv_lens]).astype(np.int32)
    n = conv_no.shape[0]

    conv_id = np.char.add("conv", np.char.zfill(conv_no.astype(str), 6))
    role = np.array(ROLES)[turn_idx % 3]

    tmpl_ix = rng.integers(0, len(_TEMPLATES), size=n)
    person = rng.choice(PERSONS, size=n)
    person2 = rng.choice(PERSONS, size=n)
    place = rng.choice(PLACES, size=n)
    place2 = rng.choice(PLACES, size=n)
    # force hub entity into ~hub_fraction of turns (skew fixture)
    hub_mask = rng.random(n) < hub_fraction
    place = np.where(hub_mask, HUB_ENTITY, place)
    year = rng.integers(1789, 1805, size=n)
    month = rng.integers(1, 13, size=n)
    day = rng.integers(1, 29, size=n)
    date = np.char.add(
        np.char.add(
            np.char.add(year.astype(str), "-"), np.char.zfill(month.astype(str), 2)
        ),
        np.char.add("-", np.char.zfill(day.astype(str), 2)),
    )

    texts = pd.Series([_TEMPLATES[i] for i in tmpl_ix], dtype="object")
    frame = pd.DataFrame(
        {
            "t": texts,
            "person": person,
            "person2": person2,
            "place": place,
            "place2": place2,
            "date": date,
        }
    )
    # vectorized template fill: replace each placeholder with per-row values
    # via split/concat (no per-row python)
    text = frame["t"]
    for col in ["person", "person2", "place", "place2", "date"]:
        token = "{" + col + "}"
        has = text.str.contains(token, regex=False)
        parts = text.str.split(token, n=1)
        left = parts.str[0]
        right = parts.str[1]
        text = (left + frame[col] + right).where(has, text)

    tool = np.where(role == "tool", rng.choice(TOOLS, size=n), "")
    conv_offset_us = (conv_no.astype(np.int64) * 3_600_000_000) + rng.integers(
        0, 1_000_000, size=n
    ) * 0  # conversation-level offset only (keeps per-turn order strict)
    ts = BASE_EPOCH + (conv_offset_us + turn_idx.astype(np.int64) * 60_000_000).astype(
        "timedelta64[us]"
    )

    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text.astype(str),
            "tool": tool,
            "ts": ts,
        }
    )

    # duplicated turn rows fixture (reference dedups post-scan, interface.py:171)
    dups = pdf.iloc[:: max(1, n // 10)].copy()
    pdf = pd.concat([pdf, dups], ignore_index=True)
    # shuffled physical order (ordering-invariance fixture)
    pdf = pdf.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    return pdf


def transcripts_df(
    spark: SparkSession,
    n_convs: int = 50,
    n_turns: int = 8,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic transcripts as a Spark DataFrame with the canonical schema."""
    pdf = generate_transcripts_pdf(n_convs=n_convs, n_turns=n_turns, seed=seed)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if partitions:
        # production layout: hash-bucket by conv_id so a conversation's turns
        # co-locate (window over (conv_id, turn_idx) then shuffles once, not per-op)
        df = df.repartition(partitions, "conv_id")
    return df


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a transcripts-shaped view from the driver's `events` parquet.

    Deterministic and SQL-expressible (mirrored in __spark_entry__.oracle_sql),
    so DuckDB can replay it: conv = user, turn order = (ts, event_id),
    text embeds event_type + integer value.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .select(
            F.concat(F.lit("conv"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias(
                "conv_id"
            ),
            (F.col("rn") - F.lit(1)).cast("int").alias("turn_idx"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.col("rn") - 1) % 3 + 1,
            ).alias("role"),
            F.concat(
                F.lit("event "),
                F.col("event_type"),
                F.lit(" with value "),
                F.floor(F.col("value")).cast("long").cast("string"),
                F.lit(" recorded on "),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("text"),
            F.when((F.col("rn") - 1) % 3 == 2, F.col("event_type"))
            .otherwise(F.lit(""))
            .alias("tool"),
            F.col("ts"),
        )
    )


def transcripts_from_events_longkey(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """`transcripts_from_events` with conv_id kept as the raw BIGINT
    user_id — the binary-id hot path (measured r4, scripts/bench_binids.py):
    the ordering window already partitions on user_id, so every downstream
    conv-keyed window/dedup reuses that ONE hashpartitioning instead of
    re-exchanging on a derived string, and exchange rows carry an 8-byte
    long instead of a 10-char string. Pair with
    materialize_event_graph(conv_expr=conv_string_expr()) so emitted URIs
    are bit-identical to the string-keyed derivation."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .select(
            F.col("user_id").alias("conv_id"),  # BIGINT through the plan
            (F.col("rn") - F.lit(1)).cast("int").alias("turn_idx"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                (F.col("rn") - 1) % 3 + 1,
            ).alias("role"),
            F.concat(
                F.lit("event "),
                F.col("event_type"),
                F.lit(" with value "),
                F.floor(F.col("value")).cast("long").cast("string"),
                F.lit(" recorded on "),
                F.date_format("ts", "yyyy-MM-dd"),
            ).alias("text"),
            F.when((F.col("rn") - 1) % 3 == 2, F.col("event_type"))
            .otherwise(F.lit(""))
            .alias("tool"),
            F.col("ts"),
        )
    )


def conv_string_expr(col: str = "conv_id"):
    """The long->string conversation-id expansion ('conv%06d'), applied
    only in post-shuffle projections."""
    return F.concat(
        F.lit("conv"), F.lpad(F.col(col).cast("string"), 6, "0")
    )
