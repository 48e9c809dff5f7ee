"""Event-centric graph materialization (SEM ontology).

Two emission surfaces, mirroring the reference's stage 2
(reference: src/build_ng/generic_kb_to_ng.py:200-280):

1. `materialize_event_graph` — the transcript graft: one event node per turn,
   actor/place/time triples from extracted mentions, sub-event edges to the
   conversation node, and temporal ordering edges from lead() over
   (conv_id, turn_idx) — the north rule's event-time ordering.

2. `emit_sem_from_triples` — the generic-KB emission rules: domain/range
   -> narrative dimension via superclass closure (generic_kb_to_ng.py:95-112),
   label-substring rules (ibid:244-249), and the temporal min/max clamp
   (ibid:152-177). Re-expressed as broadcast joins + groupBy aggregates —
   no per-row Python, no driver-side dict walks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..vocab import (
    HAS_SENTENCE,
    RDF_VALUE,
    IN_CONVERSATION,
    NEXT_EVENT,
    NF_TO_PRED,
    NS_ENT,
    NS_FRAME,
    NS_GFE,
    NS_NG,
    NS_NIF,
    NS_SKOS,
    NS_WSJ,
    RDF_TYPE,
    SEM_EVENT,
    TEMPORAL_FILTERS,
    USED_TOOL,
)


def event_uri_col(conv_id="conv_id", turn_idx="turn_idx"):
    return F.concat(
        F.lit(NS_NG + "event/"), F.col(conv_id), F.lit("/"), F.col(turn_idx).cast("string")
    )


def conv_uri_col(conv_id="conv_id"):
    return F.concat(F.lit(NS_NG + "conversation/"), F.col(conv_id))


def ent_uri(col):
    # full urllib.parse.quote parity (C8) — for the ASCII fixture vocab this
    # emits exactly the space->%20 form the DuckDB oracle replays; non-ASCII
    # mentions now produce reference-bit-identical URIs too
    from ..functions.scalars import uri_encode

    return F.concat(F.lit(NS_ENT), uri_encode(col))


def build_event_graph(
    transcripts: DataFrame,
    persist: bool = False,
    extractor=None,
    conv_expr=None,
) -> DataFrame:
    """Full pipeline: extraction (slim) -> materialization.

    The mentions table feeds two plan branches (per-mention triples and the
    per-event date aggregate), but both read the dedup exchange, so Spark's
    ReusedExchange executes the Arrow-batched extraction ONCE — measured:
    persist() here only adds materialization cost (kept as an option for
    plans where the reuse breaks, e.g. after further transformation).

    `extractor` plugs a custom (possibly heavyweight-model) mention
    extractor through to extract_mentions — see
    extraction/model_extractor.py for the worked per-executor lazy-init
    pattern."""
    from ..extraction.mentions import extract_mentions

    mentions = extract_mentions(transcripts, carry_text=False, extractor=extractor)
    if persist:
        mentions = mentions.persist()
    return materialize_event_graph(transcripts, mentions, conv_expr=conv_expr)


def materialize_event_graph(
    transcripts: DataFrame,
    mentions: DataFrame,
    dedup_output: bool = False,
    conv_expr=None,
) -> DataFrame:
    """(transcripts, mentions) -> SEM triples DataFrame (subject, predicate, object).

    Single-pass emission, designed for the 100TB plan shape:

    - per-turn triples (typing, role actor, sub-event edges, conversation
      membership, temporal ordering) are built as ONE emission array per turn
      and exploded — one scan + one window + one explode instead of a union
      of ~7 re-scanning branches;
    - turn dedup and the lead() ordering edge share a single conv_id
      exchange (lag-based first-row filter inside the same window stage)
      instead of a (conv_id, turn_idx) dedup shuffle + a conv_id window
      shuffle;
    - mention triples are one narrow select with a CASE on dimension; date
      min/max is one aggregate over the when-mentions only (min/max are
      duplicate-insensitive — no dedup shuffle needed);
    - NO global output dedup: the three branches emit provably disjoint
      triple sets (distinct predicates/object namespaces), each internally
      deduplicated, so the reference's defensive drop_duplicates
      (src/interface.py:171) would shuffle the full output for nothing.
      Pass dedup_output=True when feeding externally-constructed mentions
      whose disjointness is not guaranteed.

    ``conv_expr`` (binary-id hot path, measured r4): a Column producing
    the conversation-id STRING from the `conv_id` column, for transcripts
    that carry conv_id as a BIGINT surrogate through the exchanges (see
    data/transcripts.py transcripts_from_events_longkey). With a long key
    the ordering window (user_id) and the dedup/lead windows share ONE
    hashpartitioning — Catalyst can't reuse hashpartitioning(user_id) for
    a derived STRING key even when the mapping is 1:1 — and exchange rows
    shrink; strings are built only here, in post-shuffle projections
    (+6% flagship at 32 cores, scripts/bench_binids.py). Default keeps
    the plain string-keyed behavior.
    """
    conv_s = conv_expr if conv_expr is not None else F.col("conv_id")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # dedup duplicate turn rows inside the same conv_id exchange the lead()
    # needs anyway: keep the first row per (conv_id, turn_idx)
    turns = (
        transcripts.select("conv_id", "turn_idx", "role")
        .withColumn("__prev", F.lag("turn_idx").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("turn_idx")))
        .drop("__prev")
    )
    ev = F.concat(
        F.lit(NS_NG + "event/"), conv_s, F.lit("/"),
        F.col("turn_idx").cast("string"),
    )
    conv = F.concat(F.lit(NS_NG + "conversation/"), conv_s)
    next_ev = F.concat(
        F.lit(NS_NG + "event/"),
        conv_s,
        F.lit("/"),
        F.col("next_turn").cast("string"),
    )

    def t(s, p, o):
        return F.struct(s.alias("subject"), p.alias("predicate"), o.alias("object"))

    emissions = F.array(
        # (event, rdf:type, sem:Event) — generic_kb_to_ng.py:220-221
        t(ev, F.lit(RDF_TYPE), F.lit(SEM_EVENT)),
        # speaking role as actor
        t(ev, F.lit(NF_TO_PRED["who"]), F.concat(F.lit(NS_NG + "actor/"), F.col("role"))),
        # sub-event edges both ways — generic_kb_to_ng.py:63-65
        t(ev, F.lit(NF_TO_PRED["part_of"]), conv),
        t(conv, F.lit(NF_TO_PRED["part_of_inverse"]), ev),
        t(ev, F.lit(IN_CONVERSATION), conv),
        # temporal ordering edge (null when last turn; filtered below)
        F.when(
            F.col("next_turn").isNotNull(), t(ev, F.lit(NEXT_EVENT), next_ev)
        ),
    )
    turn_triples = (
        turns.withColumn("next_turn", F.lead("turn_idx").over(w))
        .select(F.explode(F.filter(emissions, lambda x: x.isNotNull())).alias("tr"))
        .select("tr.subject", "tr.predicate", "tr.object")
    )

    # mention-derived triples: one narrow select, CASE on dimension
    # (mentions arrive deduped on (conv_id, turn_idx, mention, dimension)
    # from extract_mentions; min/max below are duplicate-insensitive anyway)
    m = mentions.select("conv_id", "turn_idx", "mention", "dimension")
    non_date = m.filter(F.col("dimension").isin("who", "where", "tool")).select(
        ev.alias("subject"),
        F.when(F.col("dimension") == "who", F.lit(NF_TO_PRED["who"]))
        .when(F.col("dimension") == "where", F.lit(NF_TO_PRED["where"]))
        .otherwise(F.lit(USED_TOOL))
        .alias("predicate"),
        F.when(
            F.col("dimension") == "tool",
            F.concat(F.lit(NS_NG + "tool/"), F.col("mention")),
        )
        .otherwise(ent_uri(F.col("mention")))
        .alias("object"),
    )

    # begin/end timestamps per event: min/max mentioned date; end:=begin when
    # only one (generic_kb_to_ng.py:170-175 A8 semantics); lexical ISO compare.
    dates = (
        m.filter(F.col("dimension") == "when")
        .groupBy("conv_id", "turn_idx")
        .agg(F.min("mention").alias("begin"), F.max("mention").alias("end"))
        .withColumn("end", F.coalesce("end", "begin"))
    )
    date_triples = dates.select(
        ev.alias("subject"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(NF_TO_PRED["when_bts"]).alias("predicate"),
                    F.col("begin").alias("object"),
                ),
                F.struct(
                    F.lit(NF_TO_PRED["when_ets"]).alias("predicate"),
                    F.col("end").alias("object"),
                ),
            )
        ).alias("po"),
    ).select("subject", "po.predicate", "po.object")

    out = turn_triples.unionByName(non_date).unionByName(date_triples)
    if dedup_output:
        out = out.dropDuplicates(["subject", "predicate", "object"])
    return out


# ---------------------------------------------------------------------------
# Frame-annotation subgraph (reference frame_semantics.py:73-144)
# ---------------------------------------------------------------------------


def sent_uri_col(conv_id="conv_id", turn_idx="turn_idx"):
    return F.concat(
        F.lit(NS_NG + "sent/"), F.col(conv_id), F.lit("/"), F.col(turn_idx).cast("string")
    )


def materialize_frame_annotations(
    transcripts: DataFrame, annotations: DataFrame
) -> DataFrame:
    """(transcripts, frame/role annotations) -> frame-annotation triples.

    Emits the reference's frame subgraph shape (frame_semantics.py:73-114),
    rekeyed for turns: sentence nodes with rdf:value text bound to their
    event via ng:hasSentence (the abstract->sentence chain collapses to one
    sentence per turn), one wsj:CorpusEntry annotation node per detected
    frame (fromDocument / onFrame / onLemma), and one MappedRole node per
    frame element (withfnfe / rdf:value / skos:related for linkable
    dimensions). Same single-pass emission-array + explode plan shape as
    the flagship: one scan per input, no per-branch re-scans, and the three
    sections emit disjoint predicates so no global dedup is needed.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns = (
        transcripts.select("conv_id", "turn_idx", "text")
        .withColumn("__prev", F.lag("turn_idx").over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("turn_idx")))
        .drop("__prev")
    )
    sent = sent_uri_col()
    ev = event_uri_col()

    def t(s, p, o):
        return F.struct(s.alias("subject"), p.alias("predicate"), o.alias("object"))

    sent_triples = turns.select(
        F.explode(
            F.array(
                t(sent, F.lit(RDF_TYPE), F.lit(NS_NIF + "Sentence")),
                t(sent, F.lit(RDF_VALUE), F.coalesce(F.col("text"), F.lit(""))),
                t(ev, F.lit(HAS_SENTENCE), sent),
            )
        ).alias("tr")
    ).select("tr.subject", "tr.predicate", "tr.object")

    annot = F.concat(
        F.lit(NS_NG + "annot/"), F.col("conv_id"), F.lit("/"),
        F.col("turn_idx").cast("string"), F.lit("/"), F.col("frame_idx").cast("string"),
    )
    annots = annotations.dropDuplicates(["conv_id", "turn_idx", "frame_idx"]).select(
        F.explode(
            F.array(
                t(annot, F.lit(RDF_TYPE), F.lit(NS_WSJ + "CorpusEntry")),
                t(annot, F.lit(NS_WSJ + "fromDocument"), sent),
                t(annot, F.lit(NS_WSJ + "onFrame"), F.concat(F.lit(NS_FRAME), F.col("frame"))),
                t(annot, F.lit(NS_WSJ + "onLemma"), F.col("lemma")),
            )
        ).alias("tr")
    ).select("tr.subject", "tr.predicate", "tr.object")

    role_iri = F.concat(
        annot, F.lit("/"), F.col("role_idx").cast("string")
    )
    related = (
        F.when(
            F.col("dimension").isin("who", "where"), ent_uri(F.col("role_value"))
        )
        .when(
            F.col("dimension") == "tool",
            F.concat(F.lit(NS_NG + "tool/"), F.col("role_value")),
        )
    )
    role_rows = annotations.filter(F.col("role_idx").isNotNull())
    role_triples = role_rows.select(
        F.explode(
            F.filter(
                F.array(
                    t(annot, F.lit(NS_WSJ + "withmappedrole"), role_iri),
                    t(role_iri, F.lit(RDF_TYPE), F.lit(NS_WSJ + "MappedRole")),
                    t(role_iri, F.lit(NS_WSJ + "withfnfe"), F.concat(F.lit(NS_GFE), F.col("role"))),
                    t(role_iri, F.lit(RDF_VALUE), F.col("role_value")),
                    F.when(related.isNotNull(), t(role_iri, F.lit(NS_SKOS + "related"), related)),
                ),
                lambda x: x.isNotNull(),
            )
        ).alias("tr")
    ).select("tr.subject", "tr.predicate", "tr.object")

    return sent_triples.unionByName(annots).unionByName(role_triples)


# ---------------------------------------------------------------------------
# Stage-2 generic emission (triple-table input)
# ---------------------------------------------------------------------------


def _class_name(col):
    # lower(last path segment) — generic_kb_to_ng.py:102 `split("/")[-1].lower()`
    return F.lower(F.substring_index(col, "/", -1))


def sem_pred_lookup(
    pred_domain: DataFrame,
    pred_range: DataFrame,
    superclasses: DataFrame,
    str_to_nf: dict[str, str],
) -> DataFrame:
    """Build (predicate, nf, side) — columnar form of get_sem_pred's cache
    (generic_kb_to_ng.py:95-112). Tiny table; computed once, broadcast after.
    """
    spark = pred_domain.sparkSession
    nf_rows = [(label, nf) for label, nf in str_to_nf.items()]
    nf_map = spark.createDataFrame(nf_rows, ["class_name", "nf"])

    def one_side(info: DataFrame, side: str) -> DataFrame:
        cls = info.select("predicate", F.explode("classes").alias("cls"))
        # class itself + its superclasses (one-level closure table, matching
        # the reference's precomputed superclasses JSON)
        sup = superclasses.select(
            F.col("class").alias("cls"), F.explode("ancestors").alias("anc")
        )
        all_cls = cls.select("predicate", F.col("cls").alias("c")).unionByName(
            cls.join(sup, "cls").select("predicate", F.col("anc").alias("c"))
        )
        return (
            all_cls.withColumn("class_name", _class_name(F.col("c")))
            .join(F.broadcast(nf_map), "class_name")
            .select("predicate", "nf", F.lit(side).alias("side"))
            .dropDuplicates()
        )

    return one_side(pred_range, "range").unionByName(one_side(pred_domain, "domain"))


def emit_sem_from_triples(
    triples: DataFrame,
    pred_labels: DataFrame,
    pred_domain: DataFrame,
    pred_range: DataFrame,
    superclasses: DataFrame,
    start_d: str,
    end_d: str,
    nf_to_pred: dict[str, str] | None = None,
    str_to_nf: dict[str, str] | None = None,
) -> DataFrame:
    """Generic-KB emission: triples (subject, predicate, object) -> SEM triples.

    Implements, set-oriented (one plan, zero driver iteration):
    - event typing for all subjects (events list analog, generic_kb_to_ng.py:220-221)
    - URI objects: domain/range rules — range => (s, nf, o); domain => flipped
      (o, nf, s) (ibid:236-243)
    - URI objects: label-substring rules => (s, nf, o) (ibid:244-249); when a
      predicate has no label the lowercase last path segment stands in
      (ibid:245)
    - literal objects with temporal labels: per-event min(begin)/max(end)
      clamped to [start_d, end_d], end:=begin fallback (ibid:152-177) with
      dates sliced to ISO day [1:11] => substring 10
    """
    from ..vocab import NF_TO_PRED as DEFAULT_NF_TO_PRED
    from ..vocab import STR_TO_NF as DEFAULT_STR_TO_NF

    nf_to_pred = nf_to_pred or DEFAULT_NF_TO_PRED
    str_to_nf = str_to_nf or DEFAULT_STR_TO_NF
    spark = triples.sparkSession

    nf_pred_map = spark.createDataFrame(
        [(nf, p) for nf, p in nf_to_pred.items()], ["nf", "sem_pred"]
    )

    base = triples.select("subject", "predicate", "object").dropDuplicates()
    labeled = base.join(F.broadcast(pred_labels), "predicate", "left").withColumn(
        "label",
        F.coalesce(F.col("label"), _class_name(F.col("predicate"))),
    )

    events = base.select(F.col("subject").alias("event")).dropDuplicates()
    typing = events.select(
        F.col("event").alias("subject"),
        F.lit(RDF_TYPE).alias("predicate"),
        F.lit(SEM_EVENT).alias("object"),
    )

    uri_objs = labeled.filter(F.col("object").startswith("http"))

    # rule 1: precomputed domain/range lookup join
    lookup = sem_pred_lookup(pred_domain, pred_range, superclasses, str_to_nf)
    dr = (
        uri_objs.join(F.broadcast(lookup), "predicate")
        .join(F.broadcast(nf_pred_map), "nf")
        .select(
            F.when(F.col("side") == "range", F.col("subject"))
            .otherwise(F.col("object"))
            .alias("subject"),
            F.col("sem_pred").alias("predicate"),
            F.when(F.col("side") == "range", F.col("object"))
            .otherwise(F.col("subject"))
            .alias("object"),
        )
    )

    # rule 2: label contains a vocab substring
    vocab = spark.createDataFrame(
        [(s, nf_to_pred[nf]) for s, nf in str_to_nf.items()], ["needle", "sem_pred"]
    )
    lab = (
        uri_objs.join(F.broadcast(vocab), F.col("label").contains(F.col("needle")))
        .select(
            F.col("subject"),
            F.col("sem_pred").alias("predicate"),
            F.col("object"),
        )
    )

    # temporal literals: label contains a temporal vocab string
    lit_objs = labeled.filter(
        (~F.col("object").startswith("http")) & (F.col("object") != "")
    )
    bts_needles = [s for s, nf in str_to_nf.items() if nf == "when_bts"]
    ets_needles = [s for s, nf in str_to_nf.items() if nf == "when_ets"]

    def contains_any(colname: str, needles: list[str]):
        cond = F.lit(False)
        for n in needles:
            cond = cond | F.col(colname).contains(n)
        return cond

    day = F.substring(F.col("object"), 1, 10)
    temporal = lit_objs.filter(
        contains_any("label", TEMPORAL_FILTERS)
    ).withColumn("day", day)
    in_window = temporal.filter((F.col("day") >= start_d) & (F.col("day") <= end_d))
    per_event = in_window.groupBy("subject").agg(
        F.min(F.when(contains_any("label", bts_needles), F.col("day"))).alias("begin"),
        F.max(F.when(contains_any("label", ets_needles), F.col("day"))).alias("end"),
    )
    # end := begin when only start found; drop events with no begin
    # (generic_kb_to_ng.py:170-175)
    per_event = per_event.filter(F.col("begin").isNotNull()).withColumn(
        "end", F.coalesce("end", "begin")
    )
    begin = per_event.select(
        F.col("subject"),
        F.lit(nf_to_pred["when_bts"]).alias("predicate"),
        F.col("begin").alias("object"),
    )
    end = per_event.select(
        F.col("subject"),
        F.lit(nf_to_pred["when_ets"]).alias("predicate"),
        F.col("end").alias("object"),
    )

    out = (
        typing.unionByName(dr)
        .unionByName(lab)
        .unionByName(begin)
        .unionByName(end)
    )
    return out.dropDuplicates(["subject", "predicate", "object"])
