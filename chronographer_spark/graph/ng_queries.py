"""Downstream queries over the constructed narrative graph.

The reference ships a set of SPARQL CONSTRUCT patterns its users run over
the built NG (reference: experiments_run/usage_ng/sparql_queries.py —
QUERY_SUB_EVENTS_OF_EVENT, QUERY_EVENT_TYPE_TIMESTAMPED, QUERY_INFO_ACTOR,
QUERY_INTERACTION_ACTOR; issued by usage_ng/save_prompts.py and
get_grounding_triples.py). Each is a basic graph pattern = a composition of
triple-pattern scans self-joined on shared variables; here they are
DataFrame programs over the triples table (subject, predicate, object).

Scale shape: every pattern starts from a predicate-restricted scan — with
the triples table partitioned by predicate (io/catalog.write_triples) each
restriction is partition-pruned, and the per-pattern joins key on event
URIs (high cardinality, well spread). Point lookups (VALUES ?event {..})
become broadcast one-row filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..vocab import (
    CAUSAL_FRAMES,
    HAS_SENTENCE,
    NF_TO_PRED,
    NS_FRAME,
    NS_SKOS,
    NS_WSJ,
    RDF_TYPE,
    RDF_VALUE,
    SEM_EVENT,
)

P_SUB_EVENT_OF = NF_TO_PRED["part_of"]
P_ACTOR = NF_TO_PRED["who"]
P_BEGIN = NF_TO_PRED["when_bts"]
P_END = NF_TO_PRED["when_ets"]


def _pattern(triples: DataFrame, predicate: str, s: str, o: str) -> DataFrame:
    """One triple pattern `(?s <predicate> ?o)` -> DataFrame(s, o).
    The predicate equality filter is the partition-pruning key."""
    return triples.filter(F.col("predicate") == predicate).select(
        F.col("subject").alias(s), F.col("object").alias(o)
    )


def sub_events_with_times(triples: DataFrame) -> DataFrame:
    """QUERY_SUB_EVENTS_OF_EVENT core: (event, sub_event, begin, end) for
    every sem:subEventOf edge whose sub-event carries a begin timestamp;
    end falls back to begin like the construction side (OPTIONAL blocks of
    the SPARQL become left joins)."""
    sub = _pattern(triples, P_SUB_EVENT_OF, "sub_event", "event")
    begin = _pattern(triples, P_BEGIN, "sub_event", "begin")
    end = _pattern(triples, P_END, "sub_event", "end")
    return (
        sub.join(begin, "sub_event")
        .join(end, "sub_event", "left")
        .select("event", "sub_event", "begin", F.coalesce("end", "begin").alias("end"))
    )


def events_in_period(triples: DataFrame, start_d: str, end_d: str) -> DataFrame:
    """QUERY_EVENT_TYPE_TIMESTAMPED filter: events whose begin OR end
    timestamp falls inside [start_d, end_d] — the reference's disjunctive
    FILTER (sparql_queries.py:100-104), lexical ISO compare (C9)."""
    begin = _pattern(triples, P_BEGIN, "event", "begin")
    end = _pattern(triples, P_END, "event", "end")
    joined = begin.join(end, "event", "outer")
    in_win = lambda c: (F.col(c) >= start_d) & (F.col(c) <= end_d)  # noqa: E731
    return joined.filter(in_win("begin") | in_win("end")).select(
        "event", "begin", "end"
    )


def events_of_actor(triples: DataFrame, actor: str) -> DataFrame:
    """QUERY_INFO_ACTOR core: (event, begin, end) for one actor's events."""
    ev = _pattern(triples, P_ACTOR, "event", "actor").filter(
        F.col("actor") == actor
    )
    begin = _pattern(triples, P_BEGIN, "event", "begin")
    end = _pattern(triples, P_END, "event", "end")
    return (
        ev.join(begin, "event", "left")
        .join(end, "event", "left")
        .select("event", "begin", "end")
    )


def actor_interaction(
    triples: DataFrame, actor1: str, actor2: str, via: str = P_SUB_EVENT_OF
) -> DataFrame:
    """QUERY_INTERACTION_ACTOR analog: containers (conversations / parent
    events, reached over `via` edges) in which BOTH actors participate,
    with per-actor event counts. Two semi-restricted scans of the actor
    pattern self-joined on the container — no crossJoin, no explosion."""
    actors = _pattern(triples, P_ACTOR, "event", "actor")
    up = _pattern(triples, via, "event", "container")
    tagged = actors.join(up, "event")

    def side(a: str, n: str) -> DataFrame:
        return (
            tagged.filter(F.col("actor") == a)
            .groupBy("container")
            .agg(F.count(F.lit(1)).alias(n))
        )

    return side(actor1, "n_actor1").join(side(actor2, "n_actor2"), "container")


def event_frames(triples: DataFrame) -> DataFrame:
    """QUERY_EVENT_FRAME core (reference sparql_queries.py:214): for every
    event, its frame annotations with trigger lemma and OPTIONAL mapped
    roles — event -> sentence -> annotation (onFrame/onLemma) -> role
    (withfnfe/rdf:value). The OPTIONAL role block of the SPARQL becomes a
    left join; every pattern starts predicate-restricted (partition-pruned
    with the predicate-partitioned triples layout)."""
    ev_sent = _pattern(triples, HAS_SENTENCE, "event", "sent")
    from_doc = _pattern(triples, NS_WSJ + "fromDocument", "annot", "sent")
    on_frame = _pattern(triples, NS_WSJ + "onFrame", "annot", "frame")
    on_lemma = _pattern(triples, NS_WSJ + "onLemma", "annot", "lemma")
    with_role = _pattern(triples, NS_WSJ + "withmappedrole", "annot", "role")
    fnfe = _pattern(triples, NS_WSJ + "withfnfe", "role", "gfe")
    # rdf:value is shared by sentences and roles; the join against role IRIs
    # disambiguates (self-join on the role variable, as in the SPARQL)
    role_val = _pattern(triples, RDF_VALUE, "role", "role_value")
    roles = with_role.join(fnfe, "role").join(role_val, "role")
    return (
        ev_sent.join(from_doc, "sent")
        .join(on_frame, "annot")
        .join(on_lemma, "annot")
        .join(roles, "annot", "left")
        .select("event", "frame", "lemma", "gfe", "role_value")
    )


def causes_consequences(
    triples: DataFrame, frames: list[str] | None = None
) -> DataFrame:
    """QUERY_INFO_CAUSES_CONSEQUENCES core (reference sparql_queries.py:58):
    restrict annotations to the causal frame set (the SPARQL's VALUES
    ?frame {...}), return their role elements with the OPTIONAL
    skos:related entity. The VALUES restriction is an isin filter pushed
    onto the predicate-pruned onFrame scan."""
    frames = frames if frames is not None else CAUSAL_FRAMES
    frame_uris = [NS_FRAME + f for f in frames]
    ev_sent = _pattern(triples, HAS_SENTENCE, "event", "sent")
    from_doc = _pattern(triples, NS_WSJ + "fromDocument", "annot", "sent")
    on_frame = _pattern(triples, NS_WSJ + "onFrame", "annot", "frame").filter(
        F.col("frame").isin(frame_uris)
    )
    with_role = _pattern(triples, NS_WSJ + "withmappedrole", "annot", "role")
    fnfe = _pattern(triples, NS_WSJ + "withfnfe", "role", "gfe")
    role_val = _pattern(triples, RDF_VALUE, "role", "role_value")
    related = _pattern(triples, NS_SKOS + "related", "role", "related")
    return (
        on_frame.join(from_doc, "annot")
        .join(ev_sent, "sent")
        .join(with_role, "annot")
        .join(fnfe, "role")
        .join(role_val, "role")
        .join(related, "role", "left")
        .select("event", "frame", "gfe", "role_value", "related")
    )


def node_star(triples: DataFrame, node: str, ingoing: bool = True) -> DataFrame:
    """QUERY_INFO_EVENT core: every triple touching a node (outgoing, plus
    ingoing when requested) — the reference interface's star expansion
    applied to the finished graph."""
    out = triples.filter(F.col("subject") == node)
    if not ingoing:
        return out
    return out.unionByName(triples.filter(F.col("object") == node))


def typed_events(triples: DataFrame) -> DataFrame:
    """All sem:Event nodes (the VALUES-free entry of several patterns)."""
    return (
        triples.filter(
            (F.col("predicate") == RDF_TYPE) & (F.col("object") == SEM_EVENT)
        )
        .select(F.col("subject").alias("event"))
        .dropDuplicates()
    )
