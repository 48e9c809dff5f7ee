"""Batched per-turn mention detection + (s,p,o) extraction.

Spark-first re-expression of the reference's text path
(reference: src/build_ng/frame_semantics.py:125-144 bulk frame detection,
src/build_ng/dbpedia_spotlight.py:25-44 entity linking): instead of per-doc
REST/NLP calls, a deterministic rule extractor runs inside `mapInPandas`
over Arrow batches — vectorized pandas string ops, zero per-row Python.

Extraction rules (deterministic, oracle-replayable):
- ISO dates `\\d{4}-\\d{2}-\\d{2}` -> dimension "when"
- vocabulary mentions (persons -> "who", places -> "where"); the vocab is a
  small broadcast dict captured in the UDF closure (the reference broadcasts
  its domain/range/superclass JSONs the same way, generic_kb_to_ng.py:83-85)
- role=tool turns emit a "tool" mention with the tool name
  (transcript-graft analog of frame detection)

Every output row carries (conv_id, turn_idx, text) so the per-turn
text-equality invariant can be asserted by joining back to the input under
stable (conv_id, turn_idx) ordering — Arrow batches do NOT preserve global
order, so order-sensitive logic never keys on batch position.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..schemas import MENTION_SCHEMA
from ..vocab import PERSONS, PLACES

DATE_RE = r"\d{4}-\d{2}-\d{2}"


def _vocab_regex(vocab: list[str]) -> str:
    # longest-first alternation so multi-word names win over prefixes
    return "(" + "|".join(re.escape(v) for v in sorted(vocab, key=len, reverse=True)) + ")"


def _extract_batch(
    pdf: pd.DataFrame, person_re: "re.Pattern", place_re: "re.Pattern", date_re: "re.Pattern"
) -> pd.DataFrame:
    """Vectorized extraction over one Arrow batch."""
    base = pdf[["conv_id", "turn_idx", "text"]].copy()
    base["text"] = base["text"].fillna("")
    outs: list[pd.DataFrame] = []

    for pattern, dim in ((date_re, "when"), (person_re, "who"), (place_re, "where")):
        found = base["text"].str.extractall(pattern)
        if len(found):
            hits = found[0]
            idx = found.index.get_level_values(0)
            out = base.loc[idx, ["conv_id", "turn_idx", "text"]].reset_index(drop=True)
            out["mention"] = hits.to_numpy()
            out["dimension"] = dim
            outs.append(out)

    tool_rows = pdf[(pdf["role"] == "tool") & (pdf["tool"].fillna("") != "")]
    if len(tool_rows):
        out = tool_rows[["conv_id", "turn_idx", "text"]].copy()
        out["text"] = out["text"].fillna("")
        out["mention"] = tool_rows["tool"].to_numpy()
        out["dimension"] = "tool"
        outs.append(out)

    if not outs:
        return pd.DataFrame(
            columns=["conv_id", "turn_idx", "mention", "dimension", "text"]
        )
    res = pd.concat(outs, ignore_index=True)
    res = res[["conv_id", "turn_idx", "mention", "dimension", "text"]]
    # dedupe within turn (reference dedups after every scan, interface.py:171)
    return res.drop_duplicates()


def extract_mentions(
    transcripts: DataFrame,
    persons: list[str] | None = None,
    places: list[str] | None = None,
    carry_text: bool = True,
    extractor: "callable | None" = None,
) -> DataFrame:
    """transcripts -> mention rows via Arrow-batched mapInPandas.

    carry_text=False drops the per-row text payload (the per-turn-invariant
    evidence column) BEFORE the dedup shuffle — the production hot path
    shuffles (conv_id, turn_idx, mention, dimension) only; tests use
    carry_text=True to assert the invariant.

    `extractor` is the pluggable model seam (the reference's per-executor
    model pattern: spaCy+Spotlight in dbpedia_spotlight.py:25-44, the frame
    transformer in frame_semantics.py:125-144): an iterator-of-batches
    callable `(Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]` receiving
    (conv_id, turn_idx, role, text, tool) Arrow batches and yielding
    MENTION_SCHEMA frames. Initialize heavyweight models lazily in a module
    global inside the callable — it runs once per executor task, so the
    model loads once per executor, never per batch or per row. Default is
    the built-in rule extractor; downstream dedup and the per-turn
    text-equality invariant apply to injected extractors unchanged.
    """
    if extractor is None:
        # compile once on the driver; the compiled patterns ship in the
        # closure and are reused by every executor task
        person_re = re.compile(f"({_vocab_regex(persons or PERSONS)})")
        place_re = re.compile(f"({_vocab_regex(places or PLACES)})")
        date_re = re.compile(f"({DATE_RE})")

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield _extract_batch(pdf, person_re, place_re, date_re)

        extractor = gen

    cols = ["conv_id", "turn_idx", "role", "text", "tool"]
    # schema adapts to the conv key dtype: the long-key flagship path
    # (transcripts_from_events_longkey) carries conv_id as BIGINT through
    # every exchange; the extractor copies values, so dtype passes through
    schema = MENTION_SCHEMA
    if not isinstance(
        transcripts.schema["conv_id"].dataType, StringType
    ):
        schema = StructType(
            [StructField("conv_id", transcripts.schema["conv_id"].dataType, False)]
            + [f for f in MENTION_SCHEMA.fields[1:]]
        )
    out = transcripts.select(*cols).mapInPandas(extractor, schema=schema)
    if not carry_text:
        out = out.drop("text")
    return out.dropDuplicates(["conv_id", "turn_idx", "mention", "dimension"])


def extract_mentions_sqlonly(
    transcripts: DataFrame,
    persons: list[str] | None = None,
    places: list[str] | None = None,
) -> DataFrame:
    """Pure-native variant of the same rules (regexp_extract_all + explode).

    Used to cross-check the pandas-UDF path and as the whole-stage-codegen
    fast path when the rule set needs no Python at all.
    """
    person_re = _vocab_regex(persons or PERSONS)
    place_re = _vocab_regex(places or PLACES)
    t = transcripts.select(
        "conv_id", "turn_idx", "role", F.coalesce("text", F.lit("")).alias("text"), "tool"
    )

    def rule(pattern: str, dim: str) -> DataFrame:
        return t.select(
            "conv_id",
            "turn_idx",
            F.explode(F.regexp_extract_all("text", F.lit(f"({pattern})"), 1)).alias(
                "mention"
            ),
            F.lit(dim).alias("dimension"),
            "text",
        )

    tools = t.filter((F.col("role") == "tool") & (F.coalesce("tool", F.lit("")) != "")).select(
        "conv_id",
        "turn_idx",
        F.col("tool").alias("mention"),
        F.lit("tool").alias("dimension"),
        "text",
    )
    out = (
        rule(DATE_RE, "when")
        .unionByName(rule(person_re, "who"))
        .unionByName(rule(place_re, "where"))
        .unionByName(tools)
    )
    return out.dropDuplicates(["conv_id", "turn_idx", "mention", "dimension"])


def resolve_anaphora(
    mentions: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    kind_col: str = "kind",
    surface_col: str = "surface",
) -> DataFrame:
    """Rule-based cross-turn anaphora resolution: each 'pronoun' mention
    resolves to the SURFACE of the most recent prior 'entity' mention in
    the same conversation (the recency heuristic — the deterministic
    baseline coreference rule; the reference links mentions per-document
    via Spotlight with no cross-sentence coreference, so this extends
    the extraction layer the same way frames extend mentions).

    One window pass, zero joins: max(struct(order, surface)) over entity
    rows of STRICTLY EARLIER turns (RANGE UNBOUNDED PRECEDING..1
    PRECEDING) — a RANGE frame + struct max instead of last()-over-ROWS
    so multi-mention turns resolve deterministically at any row order
    (latest turn wins, lexicographically greatest surface breaks
    same-turn ties). Conversations are the partition key, so the pass
    shuffles once on conv_id like every other per-conversation operator
    (sessionizer, dialogue metrics) and scales with turn count.
    Unresolvable pronouns (no prior entity) get antecedent ''.

    Input rows: (conv, order, kind in ('entity','pronoun'), surface).
    Returns the pronoun rows as (conv, order, surface, antecedent).
    """
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(conv_col)
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    ante = F.max(
        F.when(
            F.col(kind_col) == "entity",
            F.struct(F.col(order_col).alias("o"), F.col(surface_col).alias("s")),
        )
    ).over(w)["s"]
    return (
        mentions.withColumn("_ante", ante)
        .filter(F.col(kind_col) == "pronoun")
        .select(
            conv_col,
            order_col,
            surface_col,
            F.coalesce("_ante", F.lit("")).alias("antecedent"),
        )
    )
