"""Gale-Shapley deferred acceptance: stable one-to-one assignment.

The assignment step AFTER pairwise ER scoring (blocking -> FS/agreement
scores -> THIS): greedy per-pair thresholding can match one record to many
twins; deferred acceptance produces a one-to-one matching with NO blocking
pair (no (p, a) who both prefer each other over their assigned partners) —
the stability guarantee record-linkage literature imports from matching
theory (Gale & Shapley 1962).

Determinism story (why the oracle needs no replay of THIS code): with
strict preferences the proposer-optimal stable matching is UNIQUE and
independent of proposal order (McVitie & Wilson 1971), so Spark's
synchronous rounds and any other correct implementation must return the
same pairs. Ties are made strict by pinning: proposers prefer
(score desc, acceptor asc), acceptors prefer (score desc, proposer asc).
The round count is still pinned (`rounds`) because truncated runs must
match exactly; a converged state is a fixpoint, so running extra rounds is
idempotent and R >= total-proposal bound guarantees full convergence
(R >= max pref-list length * |proposers| worst case; in practice a few
times the list length — the gate asserts convergence via the test).

Scale shape: state is one row per proposer; each round is one rank-join
of free proposers into the (Zipf-truncated) preference table + ONE
acceptor-keyed argmax window + union — the CC/PageRank iterative family
with per-round eager localCheckpoint. Preference lists should be
pre-truncated to top-K (blocked candidates), which bounds rounds and
memory; full lists at crawl scale are an anti-pattern regardless of
matcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def stable_matching(
    prefs: DataFrame,
    rounds: int,
    proposer_col: str = "p",
    acceptor_col: str = "a",
    score_col: str = "score",
) -> DataFrame:
    """Run `rounds` synchronous deferred-acceptance rounds over the
    (proposer, acceptor, score) preference table (one row per candidate
    pair, both sides share the score; (p, a) unique).

    Returns the full final state: (p, ptr, a, s) — matched proposers
    carry their partner and score, unmatched carry NULLs with ptr =
    number of permanent rejections taken.
    """
    pr = prefs.select(
        F.col(proposer_col).alias("p"),
        F.col(acceptor_col).alias("a"),
        F.col(score_col).cast("long").alias("s"),
    )
    wpr = Window.partitionBy("p").orderBy(F.desc("s"), F.asc("a"))
    ranked = (
        pr.withColumn("prank", F.row_number().over(wpr).cast("long"))
        .localCheckpoint(eager=True)
    )
    a_type = dict(ranked.dtypes)["a"]
    state = ranked.select("p").dropDuplicates().select(
        "p",
        F.lit(0).cast("long").alias("ptr"),
        F.lit(None).cast(a_type).alias("a"),
        F.lit(None).cast("long").alias("s"),
    )
    wacc = Window.partitionBy("__ca").orderBy(F.desc("__cs"), F.asc("p"))
    for _ in range(rounds):
        j = state.join(
            ranked.select(
                F.col("p").alias("__pp"),
                F.col("a").alias("__pa"),
                F.col("s").alias("__ps"),
                "prank",
            ),
            (F.col("p") == F.col("__pp"))
            & F.col("a").isNull()
            & (F.col("prank") == F.col("ptr") + 1),
            "left",
        ).select(
            "p",
            "ptr",
            F.coalesce("a", "__pa").alias("__ca"),
            F.coalesce("s", "__ps").alias("__cs"),
        )
        ranked_round = j.withColumn("rn", F.row_number().over(wacc))
        state = ranked_round.select(
            "p",
            F.when(
                F.col("__ca").isNull() | (F.col("rn") == 1), F.col("ptr")
            )
            .otherwise(F.col("ptr") + 1)
            .alias("ptr"),
            F.when(F.col("__ca").isNotNull() & (F.col("rn") == 1), F.col("__ca"))
            .alias("a"),
            F.when(F.col("__ca").isNotNull() & (F.col("rn") == 1), F.col("__cs"))
            .cast("long")
            .alias("s"),
        ).localCheckpoint(eager=True)
    return state
