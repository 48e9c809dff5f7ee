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


def frequent_subsequences(
    df: DataFrame,
    seq_col: str = "conv_id",
    order_col: str = "turn_idx",
    item_col: str = "tool",
    min_support: int = 2,
    max_len: int = 3,
) -> DataFrame:
    """Frequent sequential patterns (PrefixSpan family, Pei et al. 2001)
    up to length ``max_len`` (≤3): patterns are order-preserving — NOT
    necessarily contiguous — item subsequences, supported once per
    sequence that contains them (standard sequence support). The
    sequence-mining complement to match_sequence (which finds matches of
    a GIVEN pattern; this DISCOVERS the patterns worth matching, e.g.
    recurring tool-call motifs across conversations).

    Returns (pattern STRING 'a>b>c', length INT, support BIGINT), only
    patterns with support >= min_support.

    Scale shape — levelwise with greedy witnesses, never position-level
    self-joins: one groupBy(seq,item) collapses each sequence to sorted
    position arrays + first/last (per-sequence payload bounded by the
    item VOCABULARY, not sequence length). Length-2 existence is
    first(a) < last(b); the length-3 extension binds b to its EARLIEST
    position after first(a) (array filter+min on the sorted positions —
    greedy/skip-till-next is sound and complete for existence) and needs
    only last(c) beyond it. Joins fan out per sequence by frequent-item
    count squared/cubed — vocabulary-bounded, the PrefixSpan projected-DB
    idea in columnar form. Infrequent items are pruned BEFORE any pair
    fan-out (anti-monotonicity), broadcast as a semi-join. The
    (seq,item) position table feeds three roles (a/b/c) and the support
    aggs, so it is eager-localCheckpointed once; pairs likewise feed
    both the L2 support agg and the L3 extension.
    """
    if max_len < 1 or max_len > 3:
        raise ValueError("max_len must be 1, 2, or 3")
    pos = (
        df.where(F.col(item_col).isNotNull() & (F.col(item_col) != ""))
        .groupBy(F.col(seq_col).alias("seq"), F.col(item_col).alias("item"))
        .agg(
            F.sort_array(F.collect_list(order_col)).alias("positions"),
            F.min(order_col).alias("first_pos"),
            F.max(order_col).alias("last_pos"),
        )
    )
    sup1 = pos.groupBy("item").agg(F.count(F.lit(1)).alias("support"))
    f1 = sup1.where(F.col("support") >= min_support)
    posf = pos.join(F.broadcast(f1.select("item")), "item").localCheckpoint(
        eager=True
    )
    out = f1.select(
        F.col("item").alias("pattern"), F.lit(1).alias("length"), "support"
    )
    if max_len == 1:
        return out
    a = posf.select(
        "seq",
        F.col("item").alias("i1"),
        F.col("first_pos").alias("fp1"),
    )
    b = posf.select(
        "seq",
        F.col("item").alias("i2"),
        F.col("positions").alias("pos2"),
        F.col("last_pos").alias("lp2"),
    )
    pairs = (
        a.join(b, "seq")
        .where(F.col("fp1") < F.col("lp2"))
        .localCheckpoint(eager=True)
    )
    sup2 = pairs.groupBy("i1", "i2").agg(F.count(F.lit(1)).alias("support"))
    f2 = sup2.where(F.col("support") >= min_support)
    out = out.unionByName(
        f2.select(
            F.concat_ws(">", "i1", "i2").alias("pattern"),
            F.lit(2).alias("length"),
            "support",
        )
    )
    if max_len == 2:
        return out
    ext = (
        pairs.join(F.broadcast(f2.select("i1", "i2")), ["i1", "i2"])
        .withColumn(
            "mid_pos",
            F.array_min(
                F.filter("pos2", lambda p: p > F.col("fp1"))
            ),
        )
    )
    c = posf.select(
        "seq", F.col("item").alias("i3"), F.col("last_pos").alias("lp3")
    )
    sup3 = (
        ext.join(c, "seq")
        .where(F.col("lp3") > F.col("mid_pos"))
        .groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    return out.unionByName(
        sup3.select(
            F.concat_ws(">", "i1", "i2", "i3").alias("pattern"),
            F.lit(3).alias("length"),
            "support",
        )
    )


def temporal_motifs(
    df: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within_seconds: int = 86400,
) -> DataFrame:
    """Consecutive temporal 3-motif census (the CONSECUTIVE-window
    restriction of Paranjape, Benson & Leskovec 2017 temporal motifs):
    per key, count each ordered triple of event types occurring as three
    consecutive events whose first->third span fits in
    ``within_seconds`` — the temporal-pattern profile behind behavioral
    fingerprinting and anomaly baselining. `match_sequence` asks "did
    THIS pattern occur" (skip-till-next); this asks "WHICH patterns
    occur, how often" — census, not matcher. The consecutive restriction
    is what keeps it one window pass instead of a k-way join: the full
    skip-till-any-event motif count is match_sequence's join shape, run
    per candidate pattern.

    One (key, ts, id) window exchange (two leads share it) + one
    map-side-combinable count; deterministic under ties via the id
    column in the sort.

    Returns (t0, t1, t2, n).
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col), F.col(id_col))
    trip = (
        df.select(
            F.col(key),
            F.col(type_col).alias("t0"),
            F.col(ts_col),
            F.col(id_col),
        )
        .withColumn("t1", F.lead("t0", 1).over(w))
        .withColumn("t2", F.lead("t0", 2).over(w))
        .withColumn("_ts2", F.lead(ts_col, 2).over(w))
        .filter(
            F.col("t2").isNotNull()
            & (
                F.unix_timestamp(F.col("_ts2"))
                - F.unix_timestamp(F.col(ts_col))
                <= within_seconds
            )
        )
    )
    return trip.groupBy("t0", "t1", "t2").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    on: Sequence[str] = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    within_seconds: int | None = None,
) -> DataFrame:
    """Conversion-funnel analytics over `match_sequence`: per step, how
    many anchors survive this far (skip-till-next semantics: one funnel
    instance per step-0 event) and the exact MEDIAN seconds from the
    previous step — the step-level report a product/agent dashboard
    shows, derived from the same matcher the CEP gate verifies.

    Step 0's count is the anchor population (every step-0 event); step
    L's count is completed L-step prefixes. Conversion is the exact
    integer share vs the PREVIOUS step; the latency column is the median
    seconds FROM THE ANCHOR to this step (the cumulative time-to-reach
    curve — monotone by construction), doubled-median exact
    (robust_outlier_report trick). Prefix matches run the matcher per
    prefix length — k−1 passes over the type-filtered base, each the
    documented match_sequence join shape; fine for dashboard-sized k.

    Returns (step_idx, step, n_matched, conv_from_prev_x1e6,
    med2_from_anchor_s).
    """
    if len(steps) < 2:
        raise ValueError("need at least two steps")
    spark = events.sparkSession
    anchors = events.filter(F.col(type_col) == steps[0]).count()
    rows = [(0, steps[0], int(anchors), 1000000, 0)]
    prev = anchors
    for length in range(2, len(steps) + 1):
        m = match_sequence(
            events,
            steps[:length],
            on=on,
            type_col=type_col,
            ts_col=ts_col,
            id_col=id_col,
            within_seconds=within_seconds,
        )
        i = length - 1
        agg = m.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(
                "CAST(percentile(span_seconds, 0.5) * 2 AS BIGINT)"
            ).alias("med2"),
        ).first()
        n = int(agg["n"] or 0)
        med2 = int(agg["med2"]) if agg["med2"] is not None else 0
        conv = n * 1000000 // prev if prev > 0 else 0
        rows.append((i, steps[i], n, int(conv), med2))
        prev = n
    return spark.createDataFrame(
        rows,
        "step_idx long, step string, n_matched long, "
        "conv_from_prev_x1e6 long, med2_from_anchor_s long",
    )


def viterbi_decode(
    df: DataFrame,
    states: Sequence[str],
    start: dict,
    trans: dict,
    emit: dict,
    key: str = "conv_id",
    idx: str = "turn_idx",
    obs: str = "obs",
    miss: int = -10,
) -> DataFrame:
    """Exact-integer Viterbi decoding per key: the max-plus dynamic
    program over an integer-scored HMM — which latent state sequence
    best explains each conversation's observation sequence. The
    sequence-LABELING family member beside `match_sequence` (pattern
    FINDING) and markov_tool_eval (likelihood SCORING): session-intent
    segmentation, bot/human phase tagging, error-spiral detection all
    reduce to this decode with different score matrices.

    All scores are plain integers (quantized log-likes — the repo's
    float discipline makes the argmax engine-exact); ties break to the
    EARLIEST state in `states` order, pinned identically in the oracle's
    greatest()+CASE replay. Unknown observations score `miss`.

    Shape — the one operator family where Python IS the right Spark
    plan: the recurrence v_i(s) = max_p(v_{i-1}(p) + T[p][s]) + E[s][o_i]
    is sequential in i, so it runs as ONE Arrow-batched applyInPandas
    pass per key (linear work, |states|² per step, state = two small
    arrays — the §2.12 pattern). The join-unrolled alternative costs a
    shuffle per TURN; `match_sequence`'s docstring economics invert here
    because sequence length, not pattern length, drives the rounds. At
    100 TB: one shuffle on the key, then embarrassingly parallel.

    Returns (key, n_turns, best_state, best_score, path) with path =
    '>'-joined decoded states (backtraced, standard Viterbi).
    """
    import pandas as pd

    state_list = list(states)
    schema = (
        f"{key} string, n_turns long, best_state string, "
        "best_score long, path string"
    )

    def _decode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx)
        seq = pdf[obs].tolist()
        k = str(pdf[key].iloc[0])
        v = {
            s: int(start[s]) + int(emit[s].get(seq[0], miss))
            for s in state_list
        }
        back = []
        for o in seq[1:]:
            nv, bk = {}, {}
            for s in state_list:
                best_p, best = None, None
                for p in state_list:  # earliest state wins ties
                    c = v[p] + int(trans[p][s])
                    if best is None or c > best:
                        best, best_p = c, p
                nv[s] = best + int(emit[s].get(o, miss))
                bk[s] = best_p
            v, _ = nv, back.append(bk)
        cur = max(state_list, key=lambda s: (v[s], -state_list.index(s)))
        path = [cur]
        for bk in reversed(back):
            cur = bk[cur]
            path.append(cur)
        path.reverse()
        return pd.DataFrame(
            {
                key: [k],
                "n_turns": [len(seq)],
                "best_state": [path[-1]],
                "best_score": [max(v.values())],
                "path": [">".join(path)],
            }
        )

    return (
        df.select(key, idx, obs)
        .groupBy(key)
        .applyInPandas(_decode, schema=schema)
    )


def weighted_interval_schedule(
    df: DataFrame,
    key: str = "user_id",
    start_col: str = "start",
    end_col: str = "end",
    weight_col: str = "w",
    id_col: str = "id",
) -> DataFrame:
    """Max-weight non-overlapping interval selection per key — the
    classic weighted-interval-scheduling DP, the curation primitive for
    "keep the most valuable non-overlapping session windows per user"
    (training-data windows, rate-limit budgeting, attention-span
    extraction). Two intervals conflict iff they overlap; touching
    endpoints (end == start) are compatible.

    Exactness: integer weights in, integer optimum out; ties need no
    pinning because only the optimal VALUE is emitted (every optimal
    schedule has the same total).

    Shape — the heavy part stays JVM-side: intervals are ranked by
    (end, start, id) per key, and each interval's compatibility index
    p(i) = #{j : end_j <= start_i} comes from the two-phase prefix-sum
    trick (union end-events and start-probes, ONE window per key over
    the tagged stream — no range join, no per-pair work; ends sort
    before probes at equal value so touching intervals count as
    compatible). Only the O(n)-per-key dp[i] = max(dp[i-1], w_i +
    dp[p_i]) recurrence runs in Arrow-batched applyInPandas (random
    access to dp[p] rules out a window). At 100 TB: one shuffle on the
    key, then embarrassingly parallel.

    Returns (key, n_intervals, best_total).
    """
    import pandas as pd

    base = df.select(
        F.col(key).cast("string").alias("__k"),
        F.col(start_col).cast("long").alias("__s"),
        F.col(end_col).cast("long").alias("__e"),
        F.col(weight_col).cast("long").alias("__w"),
        F.col(id_col).cast("long").alias("__id"),
    )
    wrank = Window.partitionBy("__k").orderBy("__e", "__s", "__id")
    # the ranked table feeds three consumers (both union branches of the
    # tagged stream + the final join) — checkpoint once or the rank
    # shuffle re-executes per branch (the minhash-band family)
    iv = base.withColumn("__rn", F.row_number().over(wrank)).localCheckpoint(
        eager=True
    )
    tagged = iv.select(
        "__k", F.col("__e").alias("__v"), F.lit(0).alias("__kind"),
        "__rn",
    ).unionByName(
        iv.select(
            "__k", F.col("__s").alias("__v"), F.lit(1).alias("__kind"),
            "__rn",
        )
    )
    wrun = (
        Window.partitionBy("__k")
        .orderBy("__v", "__kind", "__rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    probes = (
        tagged.withColumn(
            "__p",
            F.sum(F.when(F.col("__kind") == 0, 1).otherwise(0)).over(wrun),
        )
        .filter(F.col("__kind") == 1)
        .select("__k", "__rn", "__p")
    )
    rows = iv.join(probes, ["__k", "__rn"]).select(
        "__k", "__rn", "__w", "__p"
    )

    schema = f"{key} string, n_intervals long, best_total long"

    def _dp(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__rn")
        n = len(pdf)
        dp = [0] * (n + 1)
        ws = pdf["__w"].tolist()
        ps = pdf["__p"].tolist()
        for i in range(1, n + 1):
            take = ws[i - 1] + dp[ps[i - 1]]
            dp[i] = take if take > dp[i - 1] else dp[i - 1]
        return pd.DataFrame(
            {
                key: [str(pdf["__k"].iloc[0])],
                "n_intervals": [n],
                "best_total": [dp[n]],
            }
        )

    return rows.groupBy("__k").applyInPandas(_dp, schema=schema)


def lis_length(
    df: DataFrame,
    key: str = "conv_id",
    idx: str = "turn_idx",
    val: str = "v",
) -> DataFrame:
    """Longest strictly-increasing subsequence length per key — the
    monotone-run readout (how long a best-case "numbers keep going up"
    story each sequence supports: engagement ramps, escalating error
    codes, price walks). Patience algorithm: one pass maintaining the
    sorted tails array, O(n log n) per key, in ONE Arrow-batched
    applyInPandas pass (dp needs bisect random access, so no window
    expresses it); the DuckDB oracle replays the identical tails
    evolution by carrying the array as a LIST in a recursive CTE
    (list_filter count = bisect_left, slice-splice = replace).

    Integer values only (the repo's float discipline); equal values do
    NOT extend a run (strict). Returns (key, n_turns, lis_len).
    """
    import pandas as pd
    from bisect import bisect_left

    schema = f"{key} string, n_turns long, lis_len long"

    def _lis(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(idx)
        tails: list = []
        for x in pdf[val].tolist():
            pos = bisect_left(tails, x)
            if pos == len(tails):
                tails.append(x)
            else:
                tails[pos] = x
        return pd.DataFrame(
            {
                key: [str(pdf[key].iloc[0])],
                "n_turns": [len(pdf)],
                "lis_len": [len(tails)],
            }
        )

    return (
        df.select(
            F.col(key).cast("string").alias(key),
            F.col(idx).cast("long").alias(idx),
            F.col(val).cast("long").alias(val),
        )
        .groupBy(key)
        .applyInPandas(_lis, schema=schema)
    )
