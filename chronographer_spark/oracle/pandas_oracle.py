"""Single-node pandas oracle of the transcript->SEM-triple semantics.

Written against the *rules* (SURVEY.md §5.3), independently of the Spark
implementation: plain pandas, per-row where that's clearest — this is the
trusted slow model the distributed engine must match at P/R >= 0.95
(target: exact match on fixtures).
"""

from __future__ import annotations

import re

import pandas as pd

from ..vocab import (
    IN_CONVERSATION,
    NEXT_EVENT,
    NF_TO_PRED,
    NS_ENT,
    NS_NG,
    PERSONS,
    PLACES,
    RDF_TYPE,
    SEM_EVENT,
    USED_TOOL,
)

DATE_RE = re.compile(r"\d{4}-\d{2}-\d{2}")


def _ent(m: str) -> str:
    return NS_ENT + m.replace(" ", "%20")


def _ev(conv_id: str, turn_idx: int) -> str:
    return f"{NS_NG}event/{conv_id}/{turn_idx}"


def _conv(conv_id: str) -> str:
    return f"{NS_NG}conversation/{conv_id}"


def _find_vocab(text: str, vocab: list[str]) -> list[str]:
    pat = "|".join(re.escape(v) for v in sorted(vocab, key=len, reverse=True))
    return re.findall(pat, text)


def oracle_mentions(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Expected mention rows for a transcripts frame."""
    rows = []
    df = transcripts.drop_duplicates(subset=["conv_id", "turn_idx"]).sort_values(
        ["conv_id", "turn_idx"]
    )
    for _, r in df.iterrows():
        text = r.text or ""
        for d in DATE_RE.findall(text):
            rows.append((r.conv_id, r.turn_idx, d, "when"))
        for p in _find_vocab(text, PERSONS):
            rows.append((r.conv_id, r.turn_idx, p, "who"))
        for p in _find_vocab(text, PLACES):
            rows.append((r.conv_id, r.turn_idx, p, "where"))
        if r.role == "tool" and (r.tool or "") != "":
            rows.append((r.conv_id, r.turn_idx, r.tool, "tool"))
    out = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "mention", "dimension"])
    return out.drop_duplicates().reset_index(drop=True)


def oracle_triples(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Expected SEM triples for a transcripts frame."""
    mentions = oracle_mentions(transcripts)
    turns = (
        transcripts.drop_duplicates(subset=["conv_id", "turn_idx"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    triples: set[tuple[str, str, str]] = set()

    for _, r in turns.iterrows():
        ev = _ev(r.conv_id, r.turn_idx)
        triples.add((ev, RDF_TYPE, SEM_EVENT))
        triples.add((ev, NF_TO_PRED["who"], f"{NS_NG}actor/{r.role}"))
        triples.add((ev, NF_TO_PRED["part_of"], _conv(r.conv_id)))
        triples.add((_conv(r.conv_id), NF_TO_PRED["part_of_inverse"], ev))
        triples.add((ev, IN_CONVERSATION, _conv(r.conv_id)))

    # temporal ordering edges (lead over turn_idx per conversation)
    for conv_id, grp in turns.groupby("conv_id"):
        idxs = sorted(grp.turn_idx.tolist())
        for a, b in zip(idxs, idxs[1:]):
            triples.add((_ev(conv_id, a), NEXT_EVENT, _ev(conv_id, b)))

    for _, m in mentions.iterrows():
        ev = _ev(m.conv_id, m.turn_idx)
        if m.dimension == "who":
            triples.add((ev, NF_TO_PRED["who"], _ent(m.mention)))
        elif m.dimension == "where":
            triples.add((ev, NF_TO_PRED["where"], _ent(m.mention)))
        elif m.dimension == "tool":
            triples.add((ev, USED_TOOL, f"{NS_NG}tool/{m.mention}"))

    # begin/end per event from date mentions; end := begin when single
    when = mentions[mentions.dimension == "when"]
    for (conv_id, turn_idx), grp in when.groupby(["conv_id", "turn_idx"]):
        ev = _ev(conv_id, turn_idx)
        begin, end = grp.mention.min(), grp.mention.max()
        triples.add((ev, NF_TO_PRED["when_bts"], begin))
        triples.add((ev, NF_TO_PRED["when_ets"], end))

    out = pd.DataFrame(
        sorted(triples), columns=["subject", "predicate", "object"]
    )
    return out


def precision_recall(
    got: pd.DataFrame, expected: pd.DataFrame
) -> tuple[float, float]:
    g = set(map(tuple, got[["subject", "predicate", "object"]].values))
    e = set(map(tuple, expected[["subject", "predicate", "object"]].values))
    tp = len(g & e)
    p = tp / len(g) if g else 0.0
    r = tp / len(e) if e else 0.0
    return p, r
