"""Extraction slice: mentions + SEM triples vs the pandas oracle.

Asserts the north-rule invariants:
- per-turn text equality under stable (conv_id, turn_idx) ordering,
- triple match P/R >= 0.95 vs oracle semantics (exact on fixtures),
- ordering invariance: shuffled physical input yields identical triples.
"""

import pandas as pd
import pytest

from chronographer_spark.data.transcripts import generate_transcripts_pdf, transcripts_df
from chronographer_spark.extraction.mentions import extract_mentions, extract_mentions_sqlonly
from chronographer_spark.graph.materialize import materialize_event_graph
from chronographer_spark.oracle.pandas_oracle import (
    oracle_mentions,
    oracle_triples,
    precision_recall,
)


@pytest.fixture(scope="module")
def tx_pdf():
    return generate_transcripts_pdf(n_convs=30, n_turns=8, seed=42)


@pytest.fixture(scope="module")
def tx(spark, tx_pdf):
    from chronographer_spark.schemas import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(tx_pdf, schema=TRANSCRIPT_SCHEMA).cache()


def _norm_mentions(pdf: pd.DataFrame) -> pd.DataFrame:
    return (
        pdf[["conv_id", "turn_idx", "mention", "dimension"]]
        .drop_duplicates()
        .sort_values(["conv_id", "turn_idx", "dimension", "mention"])
        .reset_index(drop=True)
    )


def test_mentions_match_oracle(tx, tx_pdf):
    got = _norm_mentions(extract_mentions(tx).toPandas())
    exp = _norm_mentions(oracle_mentions(tx_pdf))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sqlonly_extractor_agrees_with_udf(tx):
    a = _norm_mentions(extract_mentions(tx).toPandas())
    b = _norm_mentions(extract_mentions_sqlonly(tx).toPandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_per_turn_text_equality(tx):
    """Every mention row carries the exact text of its (conv_id, turn_idx)."""
    m = (
        extract_mentions(tx)
        .selectExpr("conv_id", "turn_idx", "text as m_text")
        .dropDuplicates()
    )
    src = tx.selectExpr("conv_id", "turn_idx", "text as src_text").dropDuplicates()
    joined = m.join(src, ["conv_id", "turn_idx"], "inner")
    mismatches = joined.where(joined.m_text != joined.src_text).count()
    assert mismatches == 0
    orphans = m.join(src, ["conv_id", "turn_idx"], "left_anti").count()
    assert orphans == 0


def test_triples_match_oracle(tx, tx_pdf):
    mentions = extract_mentions(tx)
    got = materialize_event_graph(tx, mentions).toPandas()
    exp = oracle_triples(tx_pdf)
    p, r = precision_recall(got, exp)
    assert p >= 0.95 and r >= 0.95, f"P={p:.3f} R={r:.3f}"
    # fixtures: exact
    assert p == 1.0 and r == 1.0, f"P={p:.3f} R={r:.3f}"


def test_ordering_invariance(spark, tx_pdf):
    """Physically shuffled input produces the identical triple set."""
    from chronographer_spark.schemas import TRANSCRIPT_SCHEMA

    shuffled = tx_pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    df1 = spark.createDataFrame(tx_pdf, schema=TRANSCRIPT_SCHEMA)
    df2 = spark.createDataFrame(shuffled, schema=TRANSCRIPT_SCHEMA)
    t1 = materialize_event_graph(df1, extract_mentions(df1)).toPandas()
    t2 = materialize_event_graph(df2, extract_mentions(df2)).toPandas()
    s1 = set(map(tuple, t1.values))
    s2 = set(map(tuple, t2.values))
    assert s1 == s2


def test_single_turn_conrow_has_no_next_edge(tx):
    from chronographer_spark.vocab import NEXT_EVENT

    triples = materialize_event_graph(tx, extract_mentions(tx))
    nxt = triples.filter(triples.predicate == NEXT_EVENT).toPandas()
    # conv000000 is the single-turn fixture
    assert not nxt.subject.str.contains("conv000000").any()


def test_pluggable_extractor_hook(tx):
    """The extractor= seam: a fake 'model' extractor with lazy per-executor
    init (module-global handle, loaded once per task, never per batch)
    flows through the same mapInPandas + dedup pipeline."""

    def fake_model_extractor(batches):
        model = None  # lazy init: first batch 'loads the model'
        for pdf in batches:
            if model is None:
                model = {"loaded": True}  # stands in for spaCy/Spotlight
            out = pdf[["conv_id", "turn_idx"]].copy()
            out["mention"] = "MODEL_" + pdf["role"]
            out["dimension"] = "who"
            out["text"] = pdf["text"].fillna("")
            yield out[["conv_id", "turn_idx", "mention", "dimension", "text"]]

    got = extract_mentions(tx, extractor=fake_model_extractor).toPandas()
    assert set(got["dimension"]) == {"who"}
    assert got["mention"].str.startswith("MODEL_").all()
    # dedup contract applies to injected extractors too
    assert not got.duplicated(["conv_id", "turn_idx", "mention", "dimension"]).any()
    # one mention per turn survives dedup (mention == f(role) is turn-unique)
    n_turns = tx.select("conv_id", "turn_idx").distinct().count()
    assert len(got) == n_turns


def test_frame_annotation_layer(spark):
    """Frame/role layer goldens: trigger detection with position-ordered
    frame_idx, dimension->GFE role mapping with pinned role_idx, and the
    materialized annotation subgraph shape (reference
    frame_semantics.py:73-144)."""
    import datetime as dt

    from chronographer_spark.extraction.frames import annotate_frames, detect_frames
    from chronographer_spark.graph.materialize import materialize_frame_annotations
    from chronographer_spark.graph.ng_queries import causes_consequences, event_frames
    from chronographer_spark.schemas import TRANSCRIPT_SCHEMA

    rows = [
        ("c1", 0, "user", "the error was recorded on 2024-01-03", "", dt.datetime(2024, 1, 1)),
        ("c1", 1, "tool", "event view with value 2 recorded on 2024-01-04", "search", dt.datetime(2024, 1, 1, 0, 1)),
        ("c2", 0, "user", "nothing to see here", "", dt.datetime(2024, 1, 2)),
    ]
    tx = spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
    frames = detect_frames(tx).collect()
    by_turn = {}
    for r in frames:
        by_turn.setdefault((r["conv_id"], r["turn_idx"]), []).append(
            (r["frame_idx"], r["frame"], r["lemma"])
        )
    # token order pins frame_idx: 'error'(pos 1) before 'recorded'(pos 3)
    assert sorted(by_turn[("c1", 0)]) == [(0, "Cause_harm", "error"), (1, "Recording", "recorded")]
    assert sorted(by_turn[("c1", 1)]) == [(0, "Perception_active", "view"), (1, "Recording", "recorded")]
    assert ("c2", 0) not in by_turn

    from chronographer_spark.extraction.mentions import extract_mentions

    ann = annotate_frames(tx, extract_mentions(tx, carry_text=False))
    roles = {
        (r["conv_id"], r["turn_idx"], r["frame_idx"], r["role_idx"]): (r["role"], r["role_value"])
        for r in ann.filter(ann.role_idx.isNotNull()).collect()
    }
    # tool turn: Instrument sorts before Time (role_idx by (role, value))
    assert roles[("c1", 1, 0, 0)] == ("Instrument", "search")
    assert roles[("c1", 1, 0, 1)] == ("Time", "2024-01-04")
    assert roles[("c1", 0, 0, 0)] == ("Time", "2024-01-03")

    triples = materialize_frame_annotations(tx, ann)
    ef = event_frames(triples).collect()
    got = {(r["event"], r["frame"], r["gfe"], r["role_value"]) for r in ef}
    assert ("ng:event/c1/0", "frame:Cause_harm", "gfe:Time", "2024-01-03") in got
    assert ("ng:event/c1/1", "frame:Recording", "gfe:Instrument", "search") in got
    cc = causes_consequences(triples).collect()
    assert {r["frame"] for r in cc} == {"frame:Cause_harm"}
    assert all(r["event"] == "ng:event/c1/0" for r in cc)


def test_heavyweight_model_extractor_once_per_worker(spark, tx, tx_pdf):
    """Worked heavyweight-model example (model_extractor.py): the stand-in
    model with expensive init loads once per WORKER PROCESS — proven by an
    accumulator bumped per cold load: inits ≤ 4 workers even with 8 tasks ×
    many Arrow batches, and a second job on warm workers adds ~nothing.
    Output is identical to the built-in rule extractor, and the model rides
    the full flagship path (build_event_graph(extractor=...))."""
    from functools import partial

    from chronographer_spark.extraction.model_extractor import (
        StandInNerModel,
        make_model_extractor,
    )
    from chronographer_spark.graph.materialize import build_event_graph

    acc = spark.sparkContext.accumulator(0)
    # partial of an importable class: the loader pickles by REFERENCE —
    # workers import the class, weights never cross the wire
    extractor = make_model_extractor(
        "test-ner", partial(StandInNerModel, init_cost_items=50_000), acc
    )

    # many batches across more tasks than workers
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
        many = tx.repartition(8)
        got = extract_mentions(many, extractor=extractor).toPandas()
        inits_job1 = acc.value
        n_rows = len(tx_pdf)
        assert n_rows / 10 > 8, "fixture too small to create many batches"
        # once per worker: local[4] runs at most 4 python workers; 8 tasks
        # and ~24 batches must NOT re-init per task or per batch
        assert 1 <= inits_job1 <= 4, inits_job1

        # second job reuses warm workers (spark.python.worker.reuse)
        flagship = build_event_graph(many, extractor=extractor)
        assert flagship.count() > 0
        assert acc.value <= 4, acc.value
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    # model semantics == built-in rule extractor, verified value-level
    want = extract_mentions(tx).toPandas()
    key = ["conv_id", "turn_idx", "mention", "dimension"]
    assert (
        _norm_mentions(got[key + ["text"]]).equals(_norm_mentions(want[key + ["text"]]))
    )


def test_resolve_anaphora_hand_fixture(spark):
    """Recency rule on a hand conversation: latest strictly-earlier entity
    wins, same-turn ties break by greatest surface, no antecedent -> ''."""
    from chronographer_spark.extraction.mentions import resolve_anaphora

    rows = [
        ("c1", 0, "pronoun", "it"),       # nothing before -> ''
        ("c1", 1, "entity", "alice"),
        ("c1", 1, "entity", "bob"),       # same-turn tie: 'bob' wins later
        ("c1", 2, "pronoun", "it"),       # -> bob
        ("c1", 3, "entity", "carol"),
        ("c1", 4, "pronoun", "they"),     # -> carol
        ("c2", 5, "pronoun", "it"),       # other conv isolated -> ''
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, kind string, surface string"
    )
    got = {
        (r["conv_id"], r["turn_idx"], r["surface"]): r["antecedent"]
        for r in resolve_anaphora(df).collect()
    }
    assert got == {
        ("c1", 0, "it"): "",
        ("c1", 2, "it"): "bob",
        ("c1", 4, "they"): "carol",
        ("c2", 5, "it"): "",
    }


def test_gazetteer_match_hand_fixture(spark):
    """Token-aligned phrase occurrences: multi-token, single-token,
    overlapping, repeated-token phrases; case-insensitive; duplicate
    dictionary rows collapse; anchor offset never matches across a
    document-start boundary (start >= 0)."""
    from chronographer_spark.extraction.gazetteer import gazetteer_match

    docs = spark.createDataFrame(
        [
            (1, "the University of Oslo and the university of oslo campus"),
            (2, "university a a a end"),
            (3, "oslo"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [
            ("university of oslo",),
            ("university of oslo",),  # duplicate row must not double-count
            ("a a",),                 # overlapping starts 1 and 2
            ("oslo",),                # 1-token phrase
            ("oslo campus end",),     # absent
        ],
        "phrase string",
    )
    got = {
        (r["doc_id"], r["phrase"], r["start"])
        for r in gazetteer_match(docs, phrases).collect()
    }
    assert got == {
        (1, "university of oslo", 1),
        (1, "university of oslo", 6),
        (2, "a a", 1),
        (2, "a a", 2),
        (1, "oslo", 3),
        (1, "oslo", 8),
        (3, "oslo", 0),
    }
