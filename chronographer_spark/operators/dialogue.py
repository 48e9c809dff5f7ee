"""Conversation-level dialogue metrics over a transcripts-shaped table.

The reference keeps corpus statistics driver-side in pandas frames
(reference: src/framework.py:155-161 `subgraph_info` / `self.info` — per
iteration, whole-corpus). At 10^12-turn scale the per-conversation stats a
curation pipeline filters on (turn counts, role alternation, response
latency) must be computed distributed; this operator produces them in one
pass so downstream eligibility filters (cf. operators/text.py quality
gates) can join on `conv_id`.

Plan shape: one window over (conv_id ORDER BY turn_idx) for the lag-based
gap/switch columns, then a groupBy on the SAME key — Catalyst reuses the
window's hash partitioning for the aggregation, so the whole operator costs
exactly ONE shuffle regardless of input size. All outputs are integral
(counts + microsecond sums via unix_micros), so cross-engine comparison
needs no float discipline.

Skew: a single conversation's turns are one partition-group; conversation
length is bounded in practice (even a 10^6-turn outlier conversation is a
single task's sort, not a cluster problem), and AQE skew-split covers the
pathological case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "comention_graph",
    "conversation_metrics",
    "tool_transitions",
    "topic_boundaries",
]


def conversation_metrics(tx: DataFrame, long_gap_s: int = 300) -> DataFrame:
    """Per-conversation dialogue statistics.

    tx: transcripts-shaped DataFrame (conv_id, turn_idx, role, text, tool, ts).
    long_gap_s: a turn-to-turn gap strictly greater than this many seconds
        counts as a "stall" (n_long_gaps) — the signal a curation pipeline
        uses to split or discard idle conversations.

    Returns one row per conv_id:
      n_turns, n_tool_turns      counts
      n_role_switches            consecutive-turn role changes
      duration_us                last ts - first ts (microseconds)
      sum_gap_us, max_gap_us     turn-to-turn ts gaps (microseconds)
      n_long_gaps                gaps > long_gap_s
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(us).over(w)
    prev_role = F.lag("role").over(w)
    gap = us - prev_us

    turns = tx.select(
        "conv_id",
        us.alias("ts_us"),
        F.when(F.col("tool") != "", 1).otherwise(0).alias("is_tool"),
        F.when(prev_role.isNotNull() & (prev_role != F.col("role")), 1)
        .otherwise(0)
        .alias("is_switch"),
        gap.alias("gap_us"),
    )
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("is_tool").alias("n_tool_turns"),
        F.sum("is_switch").alias("n_role_switches"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
        F.coalesce(F.sum("gap_us"), F.lit(0)).alias("sum_gap_us"),
        F.coalesce(F.max("gap_us"), F.lit(0)).alias("max_gap_us"),
        F.sum(
            F.when(
                F.col("gap_us") > F.lit(long_gap_s).cast("long") * 1_000_000, 1
            ).otherwise(0)
        ).alias("n_long_gaps"),
    )


def tool_transitions(tx: DataFrame) -> DataFrame:
    """Tool-call transition counts over agent transcripts: for each
    conversation, order the tool-invoking turns by turn_idx and count the
    (previous tool -> next tool) bigrams corpus-wide — the Markov-chain
    statistics an agent-behavior analysis reads (which tool follows which,
    where loops form). The reference has no agent-tooling layer; this
    serves the transcripts payload the engine ingests (TRANSCRIPT_SCHEMA's
    `tool` column).

    Two shuffles by construction: one hash partition by conv_id for the
    lag window (conversations are independent), one for the global
    (tool_from, tool_to) count — the second is map-side combined, so the
    exchange carries at most |tools|^2 rows per task regardless of corpus
    size.

    Returns (tool_from, tool_to, n_transitions) sorted nowhere (caller
    orders); counts are longs.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = tx.filter(F.col("tool") != "").select(
        "conv_id", "turn_idx", F.col("tool").alias("tool_to")
    )
    pairs = calls.withColumn("tool_from", F.lag("tool_to").over(w)).filter(
        F.col("tool_from").isNotNull()
    )
    return pairs.groupBy("tool_from", "tool_to").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def topic_boundaries(tx: DataFrame, threshold_x1e6: int = 600_000) -> DataFrame:
    """Topic-shift segmentation over conversations: a turn starts a new
    topic when its token overlap with the PREVIOUS turn falls below a
    Jaccard threshold — the lexical-cohesion segmentation (TextTiling's
    core signal) a transcript pipeline runs before per-topic event
    grouping. The reference segments per document; conversations need the
    per-turn variant.

    Everything is integer arithmetic: per-turn distinct token counts, the
    adjacent-pair common-token count via an equi-join on
    (conv_id, turn_idx-1, token), and the boundary test cross-multiplied
    (n_common * 10^6 < threshold_x1e6 * union) so no float division needs
    cross-engine reconciling. threshold_x1e6 is Jaccard scaled by 10^6.

    Scale shape: token explode is map-only; the common-token join and both
    counts are keyed by (conv_id, turn_idx) — conversations never shuffle
    against each other, and per-turn token sets bound the join fan-out.

    Returns one row per turn with turn_idx >= 1:
    (conv_id, turn_idx, n_common, n_prev, n_cur, ov_x1e6, is_boundary).
    """
    toks = tx.select(
        "conv_id",
        "turn_idx",
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
            )
        ).alias("tok"),
    ).filter(F.col("tok") != "").dropDuplicates(["conv_id", "turn_idx", "tok"]).localCheckpoint(
        eager=True
    )  # toks feeds per_turn, the shifted copy, and the common join
    per_turn = toks.groupBy("conv_id", "turn_idx").agg(
        F.count(F.lit(1)).alias("n_toks")
    )
    nxt = toks.select(
        "conv_id", (F.col("turn_idx") - 1).alias("turn_idx"), "tok"
    )
    common = (
        toks.join(nxt, ["conv_id", "turn_idx", "tok"])
        .groupBy("conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # pair row for turn t (t >= 1): prev counts come from turn t-1
    pairs = (
        per_turn.select(
            "conv_id",
            (F.col("turn_idx") + 1).alias("turn_idx"),
            F.col("n_toks").alias("n_prev"),
        )
        .join(
            per_turn.select("conv_id", "turn_idx", F.col("n_toks").alias("n_cur")),
            ["conv_id", "turn_idx"],
        )
        .join(
            common.select(
                "conv_id", (F.col("turn_idx") + 1).alias("turn_idx"), "n_common"
            ),
            ["conv_id", "turn_idx"],
            "left",
        )
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0).cast("long")))
    )
    union = F.col("n_prev") + F.col("n_cur") - F.col("n_common")
    return pairs.select(
        "conv_id",
        "turn_idx",
        "n_common",
        "n_prev",
        "n_cur",
        F.expr("CAST(n_common * 1000000 DIV (n_prev + n_cur - n_common) AS BIGINT)")
        .alias("ov_x1e6"),
        F.when(
            F.col("n_common") * F.lit(1_000_000)
            < F.lit(int(threshold_x1e6)).cast("long") * union,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_boundary"),
    )


def comention_graph(
    mentions: DataFrame,
    conv_col: str = "conv_id",
    mention_col: str = "mention",
    max_df: int = 1000,
) -> DataFrame:
    """Conversation co-mention graph: project the bipartite
    (conversation, mention) relation onto conversations — an edge links two
    conversations that share a mention, weighted by how many distinct
    mentions they share. This is the cross-conversation linking signal the
    KG side consumes: conversations co-mentioning the same entities are
    candidates for shared-event merging (cf. the entity-linking join the
    reference applies within one corpus, src/framework.py:155-161 subgraph
    bookkeeping).

    Hub control is the `max_df` cap: a mention appearing in more than
    `max_df` conversations (the corpus's stopword-entity) is dropped
    BEFORE the pair join, exactly like the contamination op's
    max_train_df guard — an uncapped hub mention alone contributes
    O(df^2) pairs. With the cap, pair fan-out per mention is bounded by
    max_df^2 and the join stays linear in mention-postings volume.

    Returns (conv_a, conv_b, n_shared) with conv_a < conv_b.
    """
    # cm feeds the df count AND the capped join; kept feeds both sides of
    # the pair self-join — eager checkpoints execute each subtree once
    # (the tf/df re-execution family, CLAUDE.md)
    cm = (
        mentions.select(
            F.col(conv_col).alias("conv"), F.col(mention_col).alias("mention")
        )
        .dropDuplicates(["conv", "mention"])
        .localCheckpoint(eager=True)
    )
    df_counts = cm.groupBy("mention").agg(F.count(F.lit(1)).alias("df"))
    kept = cm.join(
        df_counts.filter(F.col("df") <= max_df).select("mention"), "mention"
    ).localCheckpoint(eager=True)
    a = kept.select(F.col("conv").alias("conv_a"), "mention")
    b = kept.select(F.col("conv").alias("conv_b"), "mention")
    return (
        a.join(b, "mention")
        .filter(F.col("conv_a") < F.col("conv_b"))
        .groupBy("conv_a", "conv_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def context_windows(tx: DataFrame, k: int = 4) -> DataFrame:
    """SFT training-example assembler: for every turn, the concatenated
    context of the previous min(k, turn_idx) turns plus the turn itself as
    the target — the (context, target) pair construction every dialogue
    fine-tuning pipeline runs between curation and packing. Context lines
    are "role: text" joined by newline, oldest first.

    One conv_id-keyed exchange (the same partitioning every per-
    conversation window in this engine rides); the frame is ROWS BETWEEN k
    PRECEDING AND 1 PRECEDING, so per-turn state is bounded by k turns
    regardless of conversation length — the map-side expansion is the
    O(k · turn_len) write amplification any context builder pays, tunable
    by k, never quadratic in conversation length. The collected frame is
    sort_array'd on turn_idx before formatting: window collect_list order
    is not contractual in either engine, the sort makes it deterministic.

    Returns (conv_id, turn_idx, n_context_turns, context_text,
    target_role, target_text).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    ctx = F.sort_array(
        F.collect_list(F.struct("turn_idx", "role", "text")).over(w)
    )
    return tx.select(
        "conv_id",
        "turn_idx",
        F.size(ctx).alias("n_context_turns"),
        F.concat_ws(
            "\n",
            F.transform(ctx, lambda s: F.concat_ws(": ", s["role"], s["text"])),
        ).alias("context_text"),
        F.col("role").alias("target_role"),
        F.col("text").alias("target_text"),
    )


def tool_loop_runs(
    tx: DataFrame,
    min_len: int = 3,
) -> DataFrame:
    """Stuck-agent loop detection over transcripts: maximal runs of
    CONSECUTIVE tool turns invoking the SAME tool within a conversation,
    reported when the run reaches ``min_len`` — the agent-trajectory
    pathology (retry loops, oscillating tool calls) a training-data
    pipeline drops or downweights before SFT, and a live-ops alarm on
    agent fleets. Consecutiveness is defined on the conversation's
    tool-turn subsequence (intervening user/assistant turns don't break
    a run; a different tool does).

    One conv_id-keyed window pass (the sessionize/SCD-2 lag/island
    idiom): rank tool turns, change-point on tool, running-sum island,
    per-island agg. Scales with tool-turn count, shuffles once.

    Returns (conv_id, tool, run_len, first_turn, last_turn).
    """
    from pyspark.sql.window import Window

    tools = tx.filter(
        (F.col("role") == "tool") & (F.coalesce("tool", F.lit("")) != "")
    ).select("conv_id", "turn_idx", "tool")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = tools.withColumn(
        "__chg",
        F.when(F.lag("tool").over(w).eqNullSafe(F.col("tool")), 0).otherwise(1),
    ).withColumn(
        "__isl", F.sum("__chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        flagged.groupBy("conv_id", "__isl")
        .agg(
            F.first("tool").alias("tool"),
            F.count(F.lit(1)).cast("long").alias("run_len"),
            F.min("turn_idx").cast("long").alias("first_turn"),
            F.max("turn_idx").cast("long").alias("last_turn"),
        )
        .filter(F.col("run_len") >= min_len)
        .select("conv_id", "tool", "run_len", "first_turn", "last_turn")
    )


def transcript_conformance(tx: DataFrame) -> DataFrame:
    """Schema-conformance validator for the transcripts contract
    (conv_id, turn_idx, role, text, tool, ts) — the ingest gate a
    transcript pipeline runs BEFORE extraction so malformed conversations
    are quarantined, not propagated into the KG: per check, how many
    violations and how many conversations are affected.

    Checks (all window/lag derived, ONE (conv_id, turn_idx) sort):
      role_repeat   consecutive turns with the same role
      ts_inversion  ts strictly decreasing while turn_idx increases
      empty_text    NULL or whitespace-only text
      idx_gap       turn_idx not exactly prev+1 (dropped/duplicated turns)

    One window pass computes every flag, then the check fan EXPLODES the
    flagged row (the minhash-bands rule — never a UNION of per-check
    passes over the corpus); the rollup is 4 rows.

    Returns (check, n_violations, n_convs_affected).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = tx.select(
        "conv_id", "turn_idx", "role", "text", "ts",
        F.lag("role").over(w).alias("__pr"),
        F.lag("ts").over(w).alias("__pt"),
        F.lag("turn_idx").over(w).alias("__pi"),
    )
    flagged = lagged.select(
        "conv_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("role_repeat").alias("check"),
                    (F.col("__pr") == F.col("role")).cast("int").alias("flag"),
                ),
                F.struct(
                    F.lit("ts_inversion").alias("check"),
                    (F.col("__pt") > F.col("ts")).cast("int").alias("flag"),
                ),
                F.struct(
                    F.lit("empty_text").alias("check"),
                    (
                        F.col("text").isNull() | (F.trim("text") == "")
                    ).cast("int").alias("flag"),
                ),
                F.struct(
                    F.lit("idx_gap").alias("check"),
                    (
                        F.col("__pi").isNotNull()
                        & (F.col("turn_idx") != F.col("__pi") + 1)
                    ).cast("int").alias("flag"),
                ),
            )
        ).alias("__x"),
    ).select("conv_id", F.col("__x.check").alias("check"),
             F.coalesce(F.col("__x.flag"), F.lit(0)).alias("flag"))
    return (
        flagged.groupBy("check")
        .agg(
            F.sum("flag").cast("long").alias("n_violations"),
            F.countDistinct(
                F.when(F.col("flag") == 1, F.col("conv_id"))
            ).cast("long").alias("n_convs_affected"),
        )
    )


def tool_cache_hits(
    tx: DataFrame,
    arg_expr=None,
) -> DataFrame:
    """Tool-call memoization profile: per conversation, how many tool
    invocations repeat a (tool, argument) pair already issued EARLIER in
    the same conversation — the cache-hit-rate readout that quantifies
    how much latency/cost a tool-result cache would recover. Distinct
    from `tool_loop_runs` (consecutive identical calls = a stuck agent):
    here any earlier occurrence counts, and the adjacent subset is broken
    out so the two diagnoses stay separable.

    ``arg_expr`` extracts the memoization key from the turn text
    (default: the full text). Shape: ONE (conv, tool, arg) window for
    first-seen marking plus a lag over the conversation's tool turns for
    adjacency, then a per-conversation combinable rollup — two window
    exchanges on conversation-bounded partitions, no self-join.

    Returns (conv_id, n_tool_turns, n_repeats, n_adjacent_repeats,
    hit_share_x1e6).
    """
    from pyspark.sql.window import Window

    arg = arg_expr if arg_expr is not None else F.col("text")
    calls = tx.filter(
        F.col("tool").isNotNull() & (F.col("tool") != "")
    ).select("conv_id", "turn_idx", "tool", arg.alias("arg"))
    seen_w = Window.partitionBy("conv_id", "tool", "arg").orderBy("turn_idx")
    adj_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    flagged = calls.withColumn(
        "is_repeat",
        F.when(F.row_number().over(seen_w) > 1, 1).otherwise(0),
    ).withColumn(
        "is_adjacent_repeat",
        F.when(
            (F.lag("tool").over(adj_w) == F.col("tool"))
            & (F.lag("arg").over(adj_w) == F.col("arg")),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tool_turns"),
        F.sum("is_repeat").cast("long").alias("n_repeats"),
        F.sum("is_adjacent_repeat").cast("long").alias("n_adjacent_repeats"),
        F.expr(
            "CAST(sum(is_repeat) * 1000000 DIV greatest(count(1), 1) AS BIGINT)"
        ).alias("hit_share_x1e6"),
    )


def markov_next_tool_eval(
    train_tx: DataFrame,
    test_tx: DataFrame,
) -> DataFrame:
    """Train/test evaluation of the first-order Markov next-tool model:
    fit `tool_transitions` counts on the training conversations, predict
    each test transition's next tool as the argmax next tool of its
    predecessor (count desc, tool asc tie-break — deterministic), and
    score top-1 accuracy per predecessor tool. The agent-behavior model
    eval: how predictable is the NEXT tool call, and for which tools —
    the baseline any learned tool-policy must beat.

    Shape: two conv_id-window passes (one per split), one |tools|²-row
    transition aggregate, the argmax picked by one struct-max over the
    TINY transition table, broadcast onto the test transitions, one
    combinable rollup. Test transitions whose predecessor was never seen
    in training are scored in their own '(unseen)' row rather than
    dropped — coverage gaps are the finding, not noise. Tie-break on
    equal counts: lexicographically LARGER tool wins (struct-max order;
    binary string comparison in both engines).

    Returns (tool_from, n_test, n_correct, acc_x1e6).
    """
    model = (
        tool_transitions(train_tx)
        .groupBy("tool_from")
        .agg(
            F.max(
                F.struct(F.col("n_transitions"), F.col("tool_to"))
            )["tool_to"].alias("predicted")
        )
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = test_tx.filter(F.col("tool") != "").select(
        "conv_id", "turn_idx", F.col("tool").alias("tool_to")
    )
    pairs = calls.withColumn("tool_from", F.lag("tool_to").over(w)).filter(
        F.col("tool_from").isNotNull()
    )
    scored = pairs.join(F.broadcast(model), "tool_from", "left").select(
        F.when(F.col("predicted").isNull(), F.lit("(unseen)"))
        .otherwise(F.col("tool_from"))
        .alias("tool_from"),
        F.when(F.col("predicted") == F.col("tool_to"), 1).otherwise(0).alias(
            "hit"
        ),
    )
    return scored.groupBy("tool_from").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum("hit").cast("long").alias("n_correct"),
        F.expr(
            "CAST(sum(hit) * 1000000 DIV greatest(count(1), 1) AS BIGINT)"
        ).alias("acc_x1e6"),
    )


def rephrase_spans(
    tx: DataFrame,
    role: str = "user",
    num: int = 3,
    den: int = 10,
) -> DataFrame:
    """Self-repair / rephrase detection per conversation: consecutive
    same-role turns whose texts are nearly identical by edit distance —
    the transcript-quality signal a curation pass uses to find users
    re-asking the same thing (model failure) and near-duplicate
    assistant boilerplate. Reference parity: the reference dedups
    verbatim repeats only (src/preprocessing.py drop_duplicates); this
    is the graded generalization.

    A pair counts as a rephrase when den·lev(prev, cur) <=
    num·greatest(len(prev), len(cur)) AND lev > 0 (exact repeats are
    `dedup`'s business, not a rephrase) — integer cross-multiplication,
    no float ratio. `levenshtein` is a built-in with identical classic
    semantics in Spark and DuckDB, so the whole readout hash-gates.

    Shape: one (conv_id) window over the role-filtered turns (lag +
    pair metrics), one combinable rollup. Levenshtein is O(len²) per
    pair JVM-side — bounded by turn length, the same contract as the
    SNM blocking pass.

    Returns (conv_id, n_role_turns, n_pairs, n_rephrase, sum_lev).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (
        tx.filter(F.col("role") == role)
        .select("conv_id", "turn_idx", "text")
        .withColumn("__prev", F.lag("text").over(w))
    )
    lev = F.levenshtein(F.col("__prev"), F.col("text"))
    is_pair = F.col("__prev").isNotNull()
    is_rephrase = (
        is_pair
        & (lev > 0)
        & (
            F.lit(den) * lev
            <= F.lit(num) * F.greatest(F.length("__prev"), F.length("text"))
        )
    )
    return pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_role_turns"),
        F.sum(is_pair.cast("long")).cast("long").alias("n_pairs"),
        F.sum(is_rephrase.cast("long")).cast("long").alias("n_rephrase"),
        F.coalesce(
            F.sum(F.when(is_pair, lev)), F.lit(0)
        ).cast("long").alias("sum_lev"),
    )


def preference_pairs(tx: DataFrame, role: str = "assistant") -> DataFrame:
    """DPO/RLHF preference-pair construction from multi-turn transcripts:
    per conversation, pair the best and worst `role` turns under a
    deterministic quality proxy (text length here; swap the len expression
    for a model score in production — the pairing plumbing is the operator).
    Chosen = (len desc, turn_idx asc) rank 1; rejected = (len asc,
    turn_idx desc) rank 1 — pinned ties, provably distinct once a
    conversation has >= 2 role turns (all-equal lengths pair first vs last).

    One conv_id-keyed exchange: both ranks and the turn count ride the same
    partitioning; conversations are bounded, so no skew concern. Returns
    (conv_id, chosen_turn, rejected_turn, chosen_len, rejected_len,
    margin)."""
    from pyspark.sql.window import Window

    a = tx.filter(F.col("role") == role).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.length("text").cast("long").alias("len"),
    )
    wc = Window.partitionBy("conv_id").orderBy(
        F.desc("len"), F.asc("turn_idx")
    )
    wr = Window.partitionBy("conv_id").orderBy(
        F.asc("len"), F.desc("turn_idx")
    )
    wn = Window.partitionBy("conv_id")
    ranked = (
        a.withColumn("rc", F.row_number().over(wc))
        .withColumn("rr", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .filter(F.col("n") >= 2)
    )
    chosen = ranked.filter(F.col("rc") == 1).select(
        "conv_id",
        F.col("turn_idx").alias("chosen_turn"),
        F.col("len").alias("chosen_len"),
    )
    rejected = ranked.filter(F.col("rr") == 1).select(
        "conv_id",
        F.col("turn_idx").alias("rejected_turn"),
        F.col("len").alias("rejected_len"),
    )
    return chosen.join(rejected, "conv_id").select(
        "conv_id",
        "chosen_turn",
        "rejected_turn",
        "chosen_len",
        "rejected_len",
        (F.col("chosen_len") - F.col("rejected_len")).alias("margin"),
    )


def chat_render(tx: DataFrame, newline: str = "\n") -> DataFrame:
    """Chat-template rendering: serialize each conversation into a single
    training-ready string (`<|role|>text` per turn, tool turns tagged
    `<|tool:NAME|>`), in stable turn order. This is the formatting stage an
    SFT-data pipeline runs right before tokenization/packing (cf.
    operators/packing.py); the reference serializes per-document driver-side
    (reference src/framework.py writes one folder per doc) — at 10^12 turns
    the render must be a distributed agg.

    Plan shape: ONE shuffle (groupBy conv_id); the per-conversation sort is
    array_sort over the collected struct list, bounded by conversation
    length, never a global sort. Output: (conv_id, n_turns, rendered,
    n_chars) — all deterministic strings/ints, no float discipline needed.
    """
    line = F.concat(
        F.lit("<|"),
        F.when(
            F.col("tool") != "", F.concat(F.lit("tool:"), F.col("tool"))
        ).otherwise(F.col("role")),
        F.lit("|>"),
        F.col("text"),
    )
    per = tx.select(
        "conv_id", F.struct(F.col("turn_idx"), line.alias("line")).alias("s")
    )
    out = per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["line"]
            ),
            newline,
        ).alias("rendered"),
    )
    return out.withColumn("n_chars", F.length("rendered").cast("long"))


def context_tail(tx: DataFrame, budget_tokens: int = 64) -> DataFrame:
    """Context-window tail selection: keep the LAST turns of each
    conversation whose running (reverse) whitespace-token total fits a
    token budget — the truncate-from-the-left step every chat-model data
    pipeline applies before packing. A turn is kept iff the suffix sum
    from the conversation end up to and including it is <= budget.

    One window over (conv_id ORDER BY turn_idx DESC) for the suffix sum,
    then a groupBy on the same key — one shuffle total (same family as
    conversation_metrics). Emits per conversation: n_turns, total_tokens,
    kept_turns, kept_tokens, first_kept_idx (NULL when even the final
    turn alone exceeds the budget).
    """
    toks = F.size(
        F.filter(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            ),
            lambda t: t != F.lit(""),
        )
    ).cast("long")
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    turns = tx.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        toks.alias("tok")
    ).withColumn("sfx", F.sum("tok").over(w))
    keep = F.col("sfx") <= F.lit(budget_tokens)
    return turns.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("tok").alias("total_tokens"),
        F.sum(F.when(keep, 1).otherwise(0)).alias("kept_turns"),
        F.coalesce(
            F.sum(F.when(keep, F.col("tok"))), F.lit(0)
        ).alias("kept_tokens"),
        F.min(F.when(keep, F.col("turn_idx"))).alias("first_kept_idx"),
    )


def latest_wins_compact(tx: DataFrame) -> DataFrame:
    """Regeneration compaction: when a conversation carries multiple
    attempts for the same turn slot (retried assistant generations,
    editor re-runs — duplicate (conv_id, turn_idx) rows), keep the latest
    attempt per slot (max ts, ties broken lexicographically on
    text/role/tool so the pick is deterministic; fully identical attempts
    collapse to the same row either way) and report how many attempts the
    slot saw. This is the MERGE-style latest-wins read a transcript store
    compacts with (same family as temporal.scd2_compact, which tracks
    value CHANGES; this dedups SLOTS).

    One shuffle: a single window over (conv_id, turn_idx) computes both
    the attempt rank and the attempt count. Emits one row per kept slot:
    (conv_id, turn_idx, n_attempts, role, text).
    """
    wo = Window.partitionBy("conv_id", "turn_idx").orderBy(
        F.col("ts").desc(), F.col("text").desc(), F.col("role").desc(),
        F.col("tool").desc()
    )
    wn = Window.partitionBy("conv_id", "turn_idx")
    ranked = tx.withColumn("rn", F.row_number().over(wo)).withColumn(
        "n_attempts", F.count(F.lit(1)).over(wn)
    )
    return ranked.filter(F.col("rn") == 1).select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.col("n_attempts").cast("long").alias("n_attempts"),
        "role",
        "text",
    )


def distinct_n_diversity(tx: DataFrame, n: int = 2) -> DataFrame:
    """Distinct-n generation-diversity metric per role (Li et al. 2016):
    distinct unigrams / total unigrams and distinct n-grams / total
    n-grams over all of a role's turns — the mode-collapse screen every
    generation pipeline tracks (a low distinct-2 assistant means the
    model repeats itself across conversations). Token n-grams come from
    the house whitespace normalization; short turns (< n tokens)
    contribute no n-grams (the sequence(1, size−n+1) short-circuit —
    Spark's sequence DESCENDS on an empty range, so the guard is
    explicit).

    Two map-side-combined aggregations over one exploded token/ngram
    pass. Emits per role: (role, total_1, distinct_1, d1_x1e6, total_n,
    distinct_n, dn_x1e6).
    """
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
        ),
        lambda t: t != F.lit(""),
    )
    grams = F.when(
        F.size(toks) >= n,
        F.expr(
            f"transform(sequence(1, size(filter(split(regexp_replace("
            f"lower(trim(text)), '\\\\s+', ' '), ' '), t -> t != '')) - {n} + 1),"
            f" i -> concat_ws(' ', slice(filter(split(regexp_replace("
            f"lower(trim(text)), '\\\\s+', ' '), ' '), t -> t != ''), i, {n})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    uni = tx.select("role", F.explode(toks).alias("g")).groupBy("role").agg(
        F.count(F.lit(1)).alias("total_1"),
        F.countDistinct("g").alias("distinct_1"),
    )
    ng = tx.select("role", F.explode(grams).alias("g")).groupBy("role").agg(
        F.count(F.lit(1)).alias("total_n"),
        F.countDistinct("g").alias("distinct_n"),
    )
    return (
        uni.join(ng, "role", "left")
        .select(
            "role",
            F.col("total_1").cast("long").alias("total_1"),
            F.col("distinct_1").cast("long").alias("distinct_1"),
            F.expr("distinct_1 * 1000000 DIV greatest(total_1, 1)")
            .cast("long")
            .alias("d1_x1e6"),
            F.coalesce(F.col("total_n"), F.lit(0)).cast("long").alias("total_n"),
            F.coalesce(F.col("distinct_n"), F.lit(0))
            .cast("long")
            .alias("distinct_n"),
            F.expr(
                "coalesce(distinct_n, 0) * 1000000"
                " DIV greatest(coalesce(total_n, 0), 1)"
            ).cast("long").alias("dn_x1e6"),
        )
    )


def duplicate_turn_rate(tx: DataFrame) -> DataFrame:
    """Cross-conversation duplicate-turn rate per role: how many of a
    role's turns repeat a normalized text already used ANYWHERE in the
    corpus (boilerplate greetings, templated tool outputs, copy-paste
    user prompts) — the transcript-level exact-dedup pressure gauge; a
    high assistant rate means SFT data is teaching repetition. Exact:
    n_turns vs distinct normalized texts per role, dup_rate = 1 −
    distinct/total, plus the most-repeated text's occurrence count (the
    worst offender's size — a count, so no tie-break needed).

    One (role, text) aggregation + one role rollup. Emits per role:
    (role, n_turns, n_distinct, dup_rate_x1e6, top_repeat_n).
    """
    normed = tx.select(
        "role",
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias(
            "t"
        ),
    )
    per_text = normed.groupBy("role", "t").agg(F.count(F.lit(1)).alias("c"))
    mx = per_text.groupBy("role").agg(F.max("c").alias("mc"))
    return (
        per_text.groupBy("role")
        .agg(
            F.sum("c").alias("n_turns"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .join(mx, "role")
        .select(
            "role",
            F.col("n_turns").cast("long").alias("n_turns"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            F.expr(
                "(n_turns - n_distinct) * 1000000 DIV greatest(n_turns, 1)"
            ).cast("long").alias("dup_rate_x1e6"),
            F.col("mc").cast("long").alias("top_repeat_n"),
        )
    )


def markov_entropy_rate(tx: DataFrame) -> DataFrame:
    """Entropy rate of the tool-transition Markov chain: per source tool
    the msb16-quantized conditional entropy H(next | src) of where the
    workflow goes next, plus the chain's overall entropy rate
    Σ p(src)·H(next|src) as a `__rate__` row — the how-predictable-is-
    the-agent readout that markov_next_tool_eval's top-1 accuracy only
    lower-bounds. Same pinned device as vmeasure: Σ_t n_st·msb16(n_s·2^20
    DIV n_st) = 16·n_s·H + 320·n_s with the offset removed exactly;
    h_x1e3 is bits ×1e3.

    Transition counts are tool²-sized; everything after the lag window +
    count collapse is tiny. Emits (src, n_out, h_x1e3).
    """
    from .sampling import _msb16_sql as _m16

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    calls = tx.filter(F.col("tool") != "").select(
        "conv_id", "turn_idx", F.col("tool").alias("t_to")
    )
    pairs = calls.withColumn("t_from", F.lag("t_to").over(w)).filter(
        F.col("t_from").isNotNull()
    )
    cnt = pairs.groupBy("t_from", "t_to").agg(F.count(F.lit(1)).alias("n_st"))
    src = cnt.groupBy("t_from").agg(F.sum("n_st").alias("n_s"))
    per = (
        cnt.join(src, "t_from")
        .groupBy("t_from")
        .agg(
            F.max("n_s").alias("n_s"),
            F.sum(
                F.expr(f"n_st * ({_m16('n_s * 1048576 DIV n_st')})")
            ).alias("s16"),
        )
        .localCheckpoint(eager=True)
    )
    rows = per.select(
        F.col("t_from").alias("src"),
        F.col("n_s").cast("long").alias("n_out"),
        F.expr("(s16 - 320 * n_s) * 1000 DIV (16 * n_s)")
        .cast("long")
        .alias("h_x1e3"),
    )
    overall = per.agg(
        F.lit("__rate__").alias("src"),
        F.sum("n_s").cast("long").alias("n_out"),
        F.expr(
            "(sum(s16) - 320 * sum(n_s)) * 1000 DIV (16 * sum(n_s))"
        ).cast("long").alias("h_x1e3"),
    )
    return rows.unionByName(overall)
