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
    IN_CONVERSATION,
    NEXT_EVENT,
    NF_TO_PRED,
    NS_ENT,
    NS_NG,
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
    # percent-encode spaces only (fixture vocab is ASCII; full rdflib-compatible
    # encoding lives in the oracle too so both sides agree bit-exactly)
    return F.concat(F.lit(NS_ENT), F.regexp_replace(col, " ", "%20"))


def materialize_event_graph(
    transcripts: DataFrame, mentions: DataFrame
) -> DataFrame:
    """(transcripts, mentions) -> SEM triples DataFrame (subject, predicate, object).

    Event nodes are turns; conversation nodes aggregate them. All emissions are
    narrow selects + one window for ordering edges; the union is deduplicated
    once at the end (reference dedups per scan, src/interface.py:171).
    """
    turns = transcripts.select("conv_id", "turn_idx", "role", "ts").dropDuplicates(
        ["conv_id", "turn_idx"]
    )
    ev = event_uri_col()

    # (event, rdf:type, sem:Event)  — generic_kb_to_ng.py:220-221
    typing = turns.select(
        ev.alias("subject"), F.lit(RDF_TYPE).alias("predicate"), F.lit(SEM_EVENT).alias("object")
    )

    # (event, sem:hasActor, role-actor) — every turn has its speaking role
    role_actor = turns.select(
        ev.alias("subject"),
        F.lit(NF_TO_PRED["who"]).alias("predicate"),
        F.concat(F.lit(NS_NG + "actor/"), F.col("role")).alias("object"),
    )

    # (event, sem:subEventOf, conversation) + inverse — generic_kb_to_ng.py:63-65
    sub_event = turns.select(
        ev.alias("subject"),
        F.lit(NF_TO_PRED["part_of"]).alias("predicate"),
        conv_uri_col().alias("object"),
    )
    has_sub = turns.select(
        conv_uri_col().alias("subject"),
        F.lit(NF_TO_PRED["part_of_inverse"]).alias("predicate"),
        ev.alias("object"),
    )

    # temporal ordering edges: event -> next event in the same conversation
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    nxt = (
        turns.withColumn("next_turn", F.lead("turn_idx").over(w))
        .filter(F.col("next_turn").isNotNull())
        .select(
            ev.alias("subject"),
            F.lit(NEXT_EVENT).alias("predicate"),
            F.concat(
                F.lit(NS_NG + "event/"),
                F.col("conv_id"),
                F.lit("/"),
                F.col("next_turn").cast("string"),
            ).alias("object"),
        )
    )

    # mention-derived triples
    m = mentions.select("conv_id", "turn_idx", "mention", "dimension")
    who = m.filter(F.col("dimension") == "who").select(
        event_uri_col().alias("subject"),
        F.lit(NF_TO_PRED["who"]).alias("predicate"),
        ent_uri(F.col("mention")).alias("object"),
    )
    where = m.filter(F.col("dimension") == "where").select(
        event_uri_col().alias("subject"),
        F.lit(NF_TO_PRED["where"]).alias("predicate"),
        ent_uri(F.col("mention")).alias("object"),
    )
    tools = m.filter(F.col("dimension") == "tool").select(
        event_uri_col().alias("subject"),
        F.lit(USED_TOOL).alias("predicate"),
        F.concat(F.lit(NS_NG + "tool/"), F.col("mention")).alias("object"),
    )

    # begin/end timestamps per event: min/max mentioned date; end:=begin when
    # only one (generic_kb_to_ng.py:170-175 A8 semantics); lexical ISO compare.
    dates = (
        m.filter(F.col("dimension") == "when")
        .groupBy("conv_id", "turn_idx")
        .agg(F.min("mention").alias("begin"), F.max("mention").alias("end"))
        .withColumn("end", F.coalesce("end", "begin"))
    )
    begin = dates.select(
        event_uri_col().alias("subject"),
        F.lit(NF_TO_PRED["when_bts"]).alias("predicate"),
        F.col("begin").alias("object"),
    )
    end = dates.select(
        event_uri_col().alias("subject"),
        F.lit(NF_TO_PRED["when_ets"]).alias("predicate"),
        F.col("end").alias("object"),
    )

    # conversation membership edge for lineage/navigation
    in_conv = turns.select(
        ev.alias("subject"),
        F.lit(IN_CONVERSATION).alias("predicate"),
        conv_uri_col().alias("object"),
    )

    out = (
        typing.unionByName(role_actor)
        .unionByName(sub_event)
        .unionByName(has_sub)
        .unionByName(nxt)
        .unionByName(who)
        .unionByName(where)
        .unionByName(tools)
        .unionByName(begin)
        .unionByName(end)
        .unionByName(in_conv)
    )
    return out.dropDuplicates(["subject", "predicate", "object"])


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
