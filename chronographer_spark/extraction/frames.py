"""Frame/role annotation over transcript turns.

Spark-first analog of the reference's frame-semantics text path
(reference: src/build_ng/frame_semantics.py:73-144 — each sentence gets
frame annotations with a trigger lemma and mapped frame elements/roles;
the production model there is FrameSemanticTransformer, :125-144). Here a
deterministic trigger-lemma rule detects frames natively (token posexplode
+ broadcast trigger join — whole-stage codegen, oracle-replayable), and the
turn's extracted mentions become the frames' role elements with their
narrative dimension mapped to a generic frame element name
(vocab.DIM_TO_ROLE). A real frame model plugs in through the same
`extractor=` seam as mention extraction (extraction.mentions).

Determinism: frame_idx orders frames by trigger token position within the
turn; role_idx orders elements by (role, value) — both pinned total orders
(SURVEY.md §4), never batch/partition position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..vocab import DIM_TO_ROLE, FRAME_TRIGGERS


def detect_frames(
    transcripts: DataFrame, triggers: dict[str, str] | None = None
) -> DataFrame:
    """-> (conv_id, turn_idx, frame_idx, frame, lemma).

    One row per detected frame instance: whitespace tokens of the turn text
    matched (lowercased) against the trigger->frame map; frame_idx is the
    0-based rank of the trigger's token position within the turn.
    """
    triggers = triggers if triggers is not None else FRAME_TRIGGERS
    spark = transcripts.sparkSession
    trig = spark.createDataFrame(
        [(k, v) for k, v in sorted(triggers.items())], ["tok", "frame"]
    )
    toks = transcripts.select(
        "conv_id",
        "turn_idx",
        F.posexplode(F.split(F.coalesce("text", F.lit("")), " ")).alias("pos", "raw_tok"),
    ).withColumn("tok", F.lower(F.col("raw_tok")))
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("pos")
    return (
        toks.join(F.broadcast(trig), "tok")
        .withColumn("frame_idx", F.row_number().over(w) - 1)
        .select(
            "conv_id",
            "turn_idx",
            "frame_idx",
            "frame",
            F.col("raw_tok").alias("lemma"),
        )
    )


def frame_roles(
    frames: DataFrame,
    mentions: DataFrame,
    dim_to_role: dict[str, str] | None = None,
) -> DataFrame:
    """Attach the turn's mentions to each of its frames as role elements.

    -> (conv_id, turn_idx, frame_idx, frame, lemma, role_idx, role,
        role_value, dimension); frames with no mentions keep one row with
    null role columns (the reference's annotation-without-elements case).
    role_idx is dense per (turn, frame): ordered by (role, role_value).
    """
    dim_to_role = dim_to_role if dim_to_role is not None else DIM_TO_ROLE
    spark = frames.sparkSession
    role_map = spark.createDataFrame(
        [(d, r) for d, r in sorted(dim_to_role.items())], ["dimension", "role"]
    )
    m = (
        mentions.select("conv_id", "turn_idx", "mention", "dimension")
        .join(F.broadcast(role_map), "dimension")
        .select(
            "conv_id", "turn_idx", "dimension", "role", F.col("mention").alias("role_value")
        )
    )
    joined = frames.join(m, ["conv_id", "turn_idx"], "left")
    w = Window.partitionBy("conv_id", "turn_idx", "frame_idx").orderBy(
        F.asc_nulls_first("role"), F.asc_nulls_first("role_value")
    )
    return joined.withColumn(
        "role_idx",
        F.when(F.col("role").isNotNull(), F.row_number().over(w) - 1),
    ).select(
        "conv_id", "turn_idx", "frame_idx", "frame", "lemma",
        "role_idx", "role", "role_value", "dimension",
    )


def annotate_frames(
    transcripts: DataFrame,
    mentions: DataFrame,
    triggers: dict[str, str] | None = None,
    dim_to_role: dict[str, str] | None = None,
) -> DataFrame:
    """Full frame/role annotation: detect frames, attach role elements."""
    return frame_roles(detect_frames(transcripts, triggers), mentions, dim_to_role)
