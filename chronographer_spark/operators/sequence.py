"""Ordered event-sequence (funnel) detection over event streams.

CEP-style multi-step pattern matching (cf. "Real-Time Multi-Pattern
Detection over Event Streams", SIGMOD 2019 — see PAPERS.md): find
occurrences of step_0 < step_1 < ... < step_k per key, each step bound to
the EARLIEST qualifying event after the previous step (skip-till-next
semantics, the deterministic greedy match), optionally constrained to a
time budget from the anchor. The batch analog of MATCH_RECOGNIZE /
`applyInPandasWithState` pattern automata, expressed as k-1 equi-joins +
per-anchor row_number picks — no Python, no state store.

Scale shape: each step joins on the key (high cardinality) and the
earliest-pick window partitions by (key, anchor ids) — also high
cardinality. For keys with very long histories the time-budget predicate
should ride a time-binned band join (operators/temporal.interval_self_join
pattern) instead of the plain range filter; the plain form is kept here
because funnels are usually anchored (step_0 prunes hard).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def match_sequence(
    events: DataFrame,
    steps: Sequence[str],
    on: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """-> one row per completed funnel: key cols, id_0..id_{k-1},
    span_seconds (last step - anchor).

    Each step matches the earliest event STRICTLY after the previous step's
    (ties at equal timestamp broken by min id); `within_seconds` bounds the
    whole sequence from the anchor event.
    """
    if len(steps) < 2:
        raise ValueError("need at least two steps")
    on = list(on)
    sec = F.unix_timestamp(F.col(ts_col))
    base = events.select(
        *on, F.col(type_col).alias("__t"), F.col(id_col).alias("__id"), sec.alias("__s")
    )
    cur = base.filter(F.col("__t") == steps[0]).select(
        *on, F.col("__id").alias("id_0"), F.col("__s").alias("s_0")
    )
    for i, step in enumerate(steps[1:], 1):
        nxt = base.filter(F.col("__t") == step).select(
            *on, F.col("__id").alias(f"id_{i}"), F.col("__s").alias(f"s_{i}")
        )
        cond = F.col(f"s_{i}") > F.col(f"s_{i-1}")
        if within_seconds is not None:
            cond = cond & (F.col(f"s_{i}") <= F.col("s_0") + within_seconds)
        anchor = [*on, *[f"id_{j}" for j in range(i)]]
        w = Window.partitionBy(*anchor).orderBy(F.asc(f"s_{i}"), F.asc(f"id_{i}"))
        cur = (
            cur.join(nxt, on)
            .filter(cond)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        )
    k = len(steps) - 1
    return cur.select(
        *on,
        *[f"id_{i}" for i in range(len(steps))],
        (F.col(f"s_{k}") - F.col("s_0")).alias("span_seconds"),
    )
