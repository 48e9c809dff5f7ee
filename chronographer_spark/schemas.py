"""Canonical schemas of the engine's tables.

The universal unit mirrors the reference's string triple table
(reference: src/interface.py:165-179 — columns subject/predicate/object,
direction tag type_df in {ingoing, outgoing, spec. outgoing}).
The primary pipeline input is the transcripts table from the north rule:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("role", StringType(), False),
        StructField("text", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

# Direction values (reference: src/interface.py:173-179 `type_df`).
DIR_INGOING = "ingoing"
DIR_OUTGOING = "outgoing"
DIR_SPEC_OUTGOING = "spec. outgoing"

TRIPLE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", StringType(), False),
        StructField("direction", StringType(), True),
    ]
)

# Per-turn mention rows produced by the extraction UDFs.
MENTION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("turn_idx", IntegerType(), False),
        StructField("mention", StringType(), False),
        StructField("dimension", StringType(), False),  # who/where/when/what/tool
        StructField("text", StringType(), True),  # carried for per-turn invariant
    ]
)

# Output SEM triples (no direction tag — final graph shape).
SEM_TRIPLE_SCHEMA = StructType(
    [
        StructField("subject", StringType(), False),
        StructField("predicate", StringType(), False),
        StructField("object", StringType(), False),
    ]
)

# Occurrence table: columnar form of the reference's path-key dict
# (reference: src/framework.py:571-597 "{1|3}-{dir}-{pred};{endpoint}").
OCCURRENCE_SCHEMA = StructType(
    [
        StructField("priority", IntegerType(), False),
        StructField("direction", StringType(), True),
        StructField("predicate", StringType(), False),
        StructField("endpoint", StringType(), True),
        StructField("count", LongType(), False),
    ]
)

EMBEDDING_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(DoubleType()), False),
        StructField("label", IntegerType(), True),
    ]
)

# Multimodal asset table: opaque binary payload + typed metadata.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image/audio/video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)
