"""Transcript / dialogue / preference-pair queries."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph

from ._shared import (
    TX_SQL,
    _duck_msb16,
    _t,
)

def q_anaphora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-turn anaphora resolution (extraction/mentions.py
    resolve_anaphora) over the transcript view: user turns contribute
    entity mentions (the event type), assistant turns contribute an 'it'
    pronoun; each pronoun resolves to the latest strictly-earlier entity
    in its conversation via one RANGE-frame struct-max window. The
    oracle replays the identical window."""
    from chronographer_spark.extraction.mentions import resolve_anaphora

    tx = transcripts_from_events(spark, sf_dir)
    ents = tx.filter(F.col("role") == "user").select(
        "conv_id",
        "turn_idx",
        F.lit("entity").alias("kind"),
        F.split("text", " ")[1].alias("surface"),
    )
    pros = tx.filter(F.col("role") == "assistant").select(
        "conv_id",
        "turn_idx",
        F.lit("pronoun").alias("kind"),
        F.lit("it").alias("surface"),
    )
    return resolve_anaphora(ents.unionByName(pros))

ANAPHORA_SQL = f"""
{TX_SQL},
m AS (
  SELECT conv_id, turn_idx, 'entity' AS kind,
         string_split(text, ' ')[2] AS surface
  FROM tx WHERE role = 'user'
  UNION ALL
  SELECT conv_id, turn_idx, 'pronoun', 'it' FROM tx WHERE role = 'assistant'
),
r AS (
  SELECT conv_id, turn_idx, kind, surface,
         max(CASE WHEN kind = 'entity'
                  THEN struct_pack(o := turn_idx, s := surface) END)
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS a
  FROM m
)
SELECT conv_id, turn_idx, surface, coalesce(a.s, '') AS antecedent
FROM r WHERE kind = 'pronoun'
"""

def q_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-agent tool-loop detection (operators/dialogue.py
    tool_loop_runs, min_len=3) over the transcript view: maximal runs of
    identical consecutive tool calls per conversation. The oracle
    replays the tool-subsequence island windows."""
    from chronographer_spark.operators.dialogue import tool_loop_runs

    tx = transcripts_from_events(spark, sf_dir)
    return tool_loop_runs(tx, min_len=3)

TOOL_LOOPS_SQL = f"""
{TX_SQL},
tools AS (
  SELECT conv_id, turn_idx, tool FROM tx
  WHERE role = 'tool' AND coalesce(tool, '') <> ''
),
flagged AS (
  SELECT *, CASE WHEN lag(tool) OVER w IS NOT DISTINCT FROM tool
                 THEN 0 ELSE 1 END AS chg
  FROM tools
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
)
SELECT conv_id, min(tool) AS tool,
       CAST(count(*) AS BIGINT) AS run_len,
       CAST(min(turn_idx) AS BIGINT) AS first_turn,
       CAST(max(turn_idx) AS BIGINT) AS last_turn
FROM isl GROUP BY conv_id, island
HAVING count(*) >= 3
"""

# ---------------------------------------------------------------------------
# Q: conversation dialogue metrics (curation-filter inputs per conv)
# ---------------------------------------------------------------------------


def q_dialogue_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.dialogue import conversation_metrics

    tx = transcripts_from_events(spark, sf_dir)
    return conversation_metrics(tx, long_gap_s=3600)

DIALOGUE_METRICS_SQL = f"""
{TX_SQL},
lagged AS (
  SELECT conv_id,
         epoch_us(ts) AS ts_us,
         CASE WHEN tool <> '' THEN 1 ELSE 0 END AS is_tool,
         CASE WHEN lag(role) OVER w IS NOT NULL
               AND lag(role) OVER w <> role THEN 1 ELSE 0 END AS is_switch,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM tx
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(is_tool) AS BIGINT) AS n_tool_turns,
       CAST(sum(is_switch) AS BIGINT) AS n_role_switches,
       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
       CAST(coalesce(sum(gap_us), 0) AS BIGINT) AS sum_gap_us,
       CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN gap_us > CAST(3600 AS BIGINT) * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_long_gaps
FROM lagged
GROUP BY conv_id
"""

# ---------------------------------------------------------------------------
# Q: tool transition counts (agent-behavior Markov statistics)
# ---------------------------------------------------------------------------


def q_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.dialogue import tool_transitions

    tx = transcripts_from_events(spark, sf_dir)
    return tool_transitions(tx)

TOOL_TRANSITIONS_SQL = f"""
{TX_SQL},
calls AS (
  SELECT conv_id, turn_idx, tool AS tool_to FROM tx WHERE tool <> ''
),
pairs AS (
  SELECT lag(tool_to) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_from,
         tool_to
  FROM calls
)
SELECT tool_from, tool_to, CAST(count(*) AS BIGINT) AS n_transitions
FROM pairs WHERE tool_from IS NOT NULL
GROUP BY tool_from, tool_to
"""

# ---------------------------------------------------------------------------
# Q: topic-shift boundaries (lexical-cohesion segmentation per conversation)
# ---------------------------------------------------------------------------


def q_topic_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.dialogue import topic_boundaries

    tx = transcripts_from_events(spark, sf_dir)
    return topic_boundaries(tx, threshold_x1e6=600_000)

TOPIC_BOUNDARIES_SQL = f"""
{TX_SQL},
tk AS (
  SELECT DISTINCT conv_id, turn_idx, tok FROM (
    SELECT conv_id, turn_idx, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM tx
  ) WHERE tok <> ''
),
pt AS (
  SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n_toks
  FROM tk GROUP BY conv_id, turn_idx
),
cm AS (
  SELECT a.conv_id, a.turn_idx, CAST(count(*) AS BIGINT) AS n_common
  FROM tk a JOIN tk b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1 AND a.tok = b.tok
  GROUP BY a.conv_id, a.turn_idx
),
p AS (
  SELECT c.conv_id, c.turn_idx,
         CAST(coalesce(m.n_common, 0) AS BIGINT) AS n_common,
         pv.n_toks AS n_prev, c.n_toks AS n_cur
  FROM pt c
  JOIN pt pv ON pv.conv_id = c.conv_id AND pv.turn_idx = c.turn_idx - 1
  LEFT JOIN cm m ON m.conv_id = c.conv_id AND m.turn_idx = c.turn_idx - 1
)
SELECT conv_id, turn_idx, n_common, n_prev, n_cur,
       CAST(n_common * 1000000 // (n_prev + n_cur - n_common) AS BIGINT)
         AS ov_x1e6,
       CAST(CASE WHEN n_common * 1000000
                      < 600000 * (n_prev + n_cur - n_common)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_boundary
FROM p
"""

# ---------------------------------------------------------------------------
# Q: co-mention conversation graph (bipartite projection, df-capped hubs)
# ---------------------------------------------------------------------------


def q_comention_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mentions are (event_type | integer value) pairs extracted from the
    transcript text (1062 distinct at sf0.01, df 1..43); max_df=40 drops
    the few real hub mentions, so the gate exercises the cap, not just
    the join."""
    from chronographer_spark.operators.dialogue import comention_graph

    tx = transcripts_from_events(spark, sf_dir)
    mentions = tx.select(
        "conv_id",
        F.concat(
            F.regexp_extract("text", r"event ([a-z]+) with", 1),
            F.lit("|"),
            F.regexp_extract("text", r"value (\d+) recorded", 1),
        ).alias("mention"),
    )
    return comention_graph(mentions, max_df=40)

COMENTION_SQL = f"""
{TX_SQL},
cm AS (
  SELECT DISTINCT conv_id AS conv,
         regexp_extract(text, 'event ([a-z]+) with', 1) || '|'
           || regexp_extract(text, 'value (\\d+) recorded', 1) AS mention
  FROM tx
),
dfc AS (SELECT mention, count(*) AS df FROM cm GROUP BY mention),
kept AS (
  SELECT cm.conv, cm.mention FROM cm
  JOIN dfc ON cm.mention = dfc.mention AND dfc.df <= 40
)
SELECT a.conv AS conv_a, b.conv AS conv_b, CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.mention = b.mention AND a.conv < b.conv
GROUP BY conv_a, conv_b
"""

# ---------------------------------------------------------------------------
# Q: topic segments (cumulative boundary sum -> per-segment stats)
# ---------------------------------------------------------------------------


def q_topic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the segmentation the boundary flags imply: segment id =
    1 + running sum of boundaries up to each turn (one window on the
    conv-keyed partitioning), then per-(conv, segment) stats — the units a
    per-topic event grouping consumes downstream."""
    from chronographer_spark.operators.dialogue import topic_boundaries

    tx = transcripts_from_events(spark, sf_dir)
    b = topic_boundaries(tx, threshold_x1e6=600_000).select(
        "conv_id", "turn_idx", "is_boundary"
    )
    turns = tx.select("conv_id", "turn_idx").join(
        b, ["conv_id", "turn_idx"], "left"
    ).withColumn("is_boundary", F.coalesce("is_boundary", F.lit(0).cast("long")))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = turns.withColumn("segment", (F.sum("is_boundary").over(w) + 1).cast("long"))
    return seg.groupBy("conv_id", "segment").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min("turn_idx").alias("first_turn"),
        F.max("turn_idx").alias("last_turn"),
    )

TOPIC_SEGMENTS_SQL = f"""
{TX_SQL},
tk AS (
  SELECT DISTINCT conv_id, turn_idx, tok FROM (
    SELECT conv_id, turn_idx, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM tx
  ) WHERE tok <> ''
),
pt AS (
  SELECT conv_id, turn_idx, CAST(count(*) AS BIGINT) AS n_toks
  FROM tk GROUP BY conv_id, turn_idx
),
cm AS (
  SELECT a.conv_id, a.turn_idx, CAST(count(*) AS BIGINT) AS n_common
  FROM tk a JOIN tk b
    ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1 AND a.tok = b.tok
  GROUP BY a.conv_id, a.turn_idx
),
flags AS (
  SELECT c.conv_id, c.turn_idx,
         CASE WHEN coalesce(m.n_common, 0) * 1000000
                   < 600000 * (pv.n_toks + c.n_toks - coalesce(m.n_common, 0))
              THEN 1 ELSE 0 END AS is_boundary
  FROM pt c
  JOIN pt pv ON pv.conv_id = c.conv_id AND pv.turn_idx = c.turn_idx - 1
  LEFT JOIN cm m ON m.conv_id = c.conv_id AND m.turn_idx = c.turn_idx - 1
),
seg AS (
  SELECT t.conv_id, t.turn_idx,
         1 + sum(coalesce(f.is_boundary, 0)) OVER (
           PARTITION BY t.conv_id ORDER BY t.turn_idx
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS segment
  FROM (SELECT conv_id, turn_idx FROM tx) t
  LEFT JOIN flags f ON f.conv_id = t.conv_id AND f.turn_idx = t.turn_idx
)
SELECT conv_id, CAST(segment AS BIGINT) AS segment,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(min(turn_idx) AS INT) AS first_turn,
       CAST(max(turn_idx) AS INT) AS last_turn
FROM seg GROUP BY conv_id, segment
"""

def q_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(context, target) SFT pairs with a 4-turn rolling context over the
    transcripts (operators/dialogue.context_windows); the frame is
    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING so per-turn state is bounded
    by k regardless of conversation length."""
    from chronographer_spark.operators.dialogue import context_windows

    return context_windows(transcripts_from_events(spark, sf_dir), k=4)

CONTEXT_WINDOWS_SQL = f"""
{TX_SQL},
c AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(list(struct_pack(turn_idx := turn_idx, role := role, text := text))
           OVER (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING), []) AS ctx
  FROM tx
)
SELECT conv_id, turn_idx,
       CAST(len(ctx) AS INT) AS n_context_turns,
       coalesce(array_to_string(
         list_transform(list_sort(ctx), s -> s.role || ': ' || s.text),
         chr(10)
       ), '') AS context_text,
       role AS target_role,
       text AS target_text
FROM c
"""

def q_distant_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision pattern profile (extraction/distant.py,
    Mintz 2009) over the documents corpus: spot the 5-word vocab_mentions
    dictionary, form <=4-gap co-occurrence pairs, label them against a
    4-triple seed KB, and report per between-text pattern the pair count,
    doc count, KB hit count, pinned relation and exact integer precision.
    The word-soup vocabulary keeps the pattern space dense enough that
    the min_pairs=2 floor still leaves hundreds of rows at sf0.01."""
    from chronographer_spark.extraction.distant import distant_supervision_patterns

    docs = _t(spark, sf_dir, "documents")
    kb = spark.createDataFrame(
        [
            ("join", "needs", "merge"),
            ("merge", "precedes", "join"),
            ("spark", "runs", "join"),
            ("customer", "filters", "window"),
        ],
        "subj string, pred string, obj string",
    )
    return distant_supervision_patterns(
        docs,
        ["spark", "join", "merge", "customer", "window"],
        kb,
        max_gap=4,
        min_pairs=2,
    )

DISTANT_PATTERNS_SQL = """
WITH t AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
  FROM documents
),
m AS (
  SELECT doc_id, u.tok AS tok, CAST(u.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
             i -> struct_pack(pos := i, tok := l[i]))) AS u
    FROM t
  )
  WHERE u.tok IN ('spark', 'join', 'merge', 'customer', 'window')
),
p AS (
  SELECT a.doc_id, a.tok AS e1, b.tok AS e2, a.pos AS p1, b.pos AS p2
  FROM m a JOIN m b
    ON a.doc_id = b.doc_id AND b.pos > a.pos
   AND b.pos - a.pos <= 4 AND b.tok <> a.tok
),
pat AS (
  SELECT p.doc_id, e1, e2,
         coalesce(
           array_to_string(l[CAST(p1 + 1 AS INT):CAST(p2 - 1 AS INT)], ' '),
           '') AS pattern
  FROM p JOIN t ON p.doc_id = t.doc_id
),
kb(subj, pred, obj) AS (
  VALUES ('join', 'needs', 'merge'), ('merge', 'precedes', 'join'),
         ('spark', 'runs', 'join'), ('customer', 'filters', 'window')
),
lab AS (
  SELECT pat.doc_id, pat.pattern, kb.pred
  FROM pat LEFT JOIN kb ON pat.e1 = kb.subj AND pat.e2 = kb.obj
)
SELECT pattern,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kb,
       max(pred) AS top_pred,
       CAST(sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS kb_precision_x1e6
FROM lab GROUP BY 1 HAVING count(*) >= 2
"""

def q_snowball_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowball/Mintz bootstrap round (extraction/distant.py
    snowball_extract): patterns with >=2 pairs and exact precision
    >=600000 against the 4-triple seed KB apply back to the corpus and
    emit the NEW (subj, pred, obj) triples they cover, with support.
    Same dictionary/KB fixture as distant_patterns."""
    from chronographer_spark.extraction.distant import snowball_extract

    docs = _t(spark, sf_dir, "documents")
    kb = spark.createDataFrame(
        [
            ("join", "needs", "merge"),
            ("merge", "precedes", "join"),
            ("spark", "runs", "join"),
            ("customer", "filters", "window"),
        ],
        "subj string, pred string, obj string",
    )
    return snowball_extract(
        docs,
        ["spark", "join", "merge", "customer", "window"],
        kb,
        max_gap=4,
        min_pattern_pairs=2,
        min_precision_x1e6=600000,
    )

SNOWBALL_TRIPLES_SQL = """
WITH t AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
  FROM documents
),
m AS (
  SELECT doc_id, u.tok AS tok, CAST(u.pos AS BIGINT) AS pos
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(l) + 1),
             i -> struct_pack(pos := i, tok := l[i]))) AS u
    FROM t
  )
  WHERE u.tok IN ('spark', 'join', 'merge', 'customer', 'window')
),
p AS (
  SELECT a.doc_id, a.tok AS e1, b.tok AS e2, a.pos AS p1, b.pos AS p2
  FROM m a JOIN m b
    ON a.doc_id = b.doc_id AND b.pos > a.pos
   AND b.pos - a.pos <= 4 AND b.tok <> a.tok
),
pat AS (
  SELECT p.doc_id, e1, e2,
         coalesce(
           array_to_string(l[CAST(p1 + 1 AS INT):CAST(p2 - 1 AS INT)], ' '),
           '') AS pattern
  FROM p JOIN t ON p.doc_id = t.doc_id
),
kb(subj, pred, obj) AS (
  VALUES ('join', 'needs', 'merge'), ('merge', 'precedes', 'join'),
         ('spark', 'runs', 'join'), ('customer', 'filters', 'window')
),
lab AS (
  SELECT pat.doc_id, pat.pattern, kb.pred
  FROM pat LEFT JOIN kb ON pat.e1 = kb.subj AND pat.e2 = kb.obj
),
rel AS (
  SELECT pattern, max(pred) AS pred
  FROM lab GROUP BY 1
  HAVING count(*) >= 2 AND max(pred) IS NOT NULL
     AND sum(CASE WHEN pred IS NOT NULL THEN 1 ELSE 0 END) * 1000000
         // count(*) >= 600000
),
nw AS (
  SELECT pat.e1, rel.pred, pat.e2, pat.doc_id
  FROM pat JOIN rel USING (pattern)
  LEFT JOIN (SELECT DISTINCT subj, obj FROM kb) k
    ON pat.e1 = k.subj AND pat.e2 = k.obj
  WHERE k.subj IS NULL
)
SELECT e1 AS subj, pred, e2 AS obj,
       CAST(count(*) AS BIGINT) AS support,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM nw GROUP BY 1, 2, 3
"""

def q_gazetteer_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gazetteer entity spotting (extraction/gazetteer.py — the scalable
    stand-in for the reference's per-text Spotlight annotator,
    src/dbpedia_spotlight.py:25-44): dictionary = the corpus's top-20
    bigrams (count desc, bigram asc — pinned), matched back over the
    corpus via the rarest-token-anchored join plan; per phrase the total
    occurrence count and distinct-document frequency. The oracle counts
    occurrences by the direct definition (adjacent-token join), so the
    anchor/verify machinery is checked against the semantics, not itself."""
    from chronographer_spark.extraction.gazetteer import gazetteer_match

    docs = _t(spark, sf_dir, "documents")
    w = F.split(F.lower(F.col("text")), " ")
    bigrams = docs.filter(F.size(w) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i), F.element_at(w, i + 1)
                ),
            )
        ).alias("bigram")
    )
    top = (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("bigram"))
        .limit(20)
        .select(F.col("bigram").alias("phrase"))
    )
    occ = gazetteer_match(docs, top)
    return occ.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )

GAZETTEER_MENTIONS_SQL = """
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
                               i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM ws WHERE len(w) >= 2
),
top AS (
  SELECT bigram AS phrase, count(*) AS c FROM bg
  GROUP BY 1 ORDER BY c DESC, bigram LIMIT 20
),
toks AS (
  SELECT doc_id, generate_subscripts(w, 1) - 1 AS pos, unnest(w) AS tok
  FROM ws
),
occ AS (
  SELECT t0.doc_id, tp.phrase
  FROM toks t0
  JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
  JOIN top tp ON tp.phrase = t0.tok || ' ' || t1.tok
)
SELECT phrase, CAST(count(*) AS BIGINT) AS n_occ,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM occ GROUP BY 1
"""

# ---------------------------------------------------------------------------
# Q: transcript schema-conformance report with injected corruptions
# ---------------------------------------------------------------------------


def q_tx_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic transcripts are conformant by construction, so three
    corruption kinds are injected deterministically in-query (text blanked
    on idx%13==5, ts pushed back 2 days on idx%17==9, role forced 'user'
    on idx%11==4 — the last also creates repeats with natural user turns);
    the validator counts exactly those plus any idx gaps (none)."""
    from chronographer_spark.operators.dialogue import transcript_conformance

    tx = transcripts_from_events(spark, sf_dir).select(
        "conv_id", "turn_idx",
        F.when(F.col("turn_idx") % 11 == 4, F.lit("user"))
        .otherwise(F.col("role")).alias("role"),
        F.when(F.col("turn_idx") % 13 == 5, F.lit(""))
        .otherwise(F.col("text")).alias("text"),
        "tool",
        F.when(
            F.col("turn_idx") % 17 == 9,
            F.col("ts") - F.expr("INTERVAL 2 DAYS"),
        ).otherwise(F.col("ts")).alias("ts"),
    )
    return transcript_conformance(tx).select(
        "check", "n_violations", "n_convs_affected"
    )

TX_CONFORMANCE_SQL = f"""
{TX_SQL},
cor AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 11 = 4 THEN 'user' ELSE role END AS role,
         CASE WHEN turn_idx % 13 = 5 THEN '' ELSE text END AS text,
         CASE WHEN turn_idx % 17 = 9 THEN ts - INTERVAL 2 DAY ELSE ts END
           AS ts
  FROM tx
),
lagged AS (
  SELECT conv_id, turn_idx, role, text, ts,
         lag(role) OVER w AS pr, lag(ts) OVER w AS pt,
         lag(turn_idx) OVER w AS pi
  FROM cor
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
fan AS (
  SELECT conv_id, x.chk AS chk, coalesce(x.flag, 0) AS flag
  FROM lagged, unnest([
    struct_pack(chk := 'role_repeat',
                flag := CAST(pr = role AS INT)),
    struct_pack(chk := 'ts_inversion',
                flag := CAST(pt > ts AS INT)),
    struct_pack(chk := 'empty_text',
                flag := CAST(text IS NULL OR trim(text) = '' AS INT)),
    struct_pack(chk := 'idx_gap',
                flag := CAST(pi IS NOT NULL AND turn_idx <> pi + 1 AS INT))
  ]) AS t(x)
)
SELECT chk AS "check", CAST(sum(flag) AS BIGINT) AS n_violations,
       CAST(count(DISTINCT CASE WHEN flag = 1 THEN conv_id END) AS BIGINT)
         AS n_convs_affected
FROM fan GROUP BY chk
"""

# ---------------------------------------------------------------------------
# Q: tool-call memoization (cache-hit) profile per conversation
# ---------------------------------------------------------------------------


def q_tool_cache_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cache-hit profile over the transcript view's tool turns, keyed on
    (tool, date argument) — the last 10 chars of the templated turn text;
    repeats mark the memoization opportunities a tool-result cache would
    recover. Only conversations with at least one repeat are returned
    (bounded, interesting rows)."""
    from chronographer_spark.operators.dialogue import tool_cache_hits

    tx = transcripts_from_events(spark, sf_dir)
    out = tool_cache_hits(
        tx, arg_expr=F.substring(F.col("text"), -10, 10)
    )
    return out.filter(F.col("n_repeats") > 0)

TOOL_CACHE_HITS_SQL = f"""
{TX_SQL},
calls AS (
  SELECT conv_id, turn_idx, tool,
         substr(text, length(text) - 9, 10) AS arg
  FROM tx WHERE tool IS NOT NULL AND tool <> ''
),
flagged AS (
  SELECT conv_id, turn_idx, tool, arg,
         CASE WHEN row_number() OVER (
                PARTITION BY conv_id, tool, arg ORDER BY turn_idx
              ) > 1 THEN 1 ELSE 0 END AS is_repeat,
         CASE WHEN lag(tool) OVER (
                PARTITION BY conv_id ORDER BY turn_idx) = tool
               AND lag(arg) OVER (
                PARTITION BY conv_id ORDER BY turn_idx) = arg
              THEN 1 ELSE 0 END AS is_adjacent_repeat
  FROM calls
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_tool_turns,
       CAST(sum(is_repeat) AS BIGINT) AS n_repeats,
       CAST(sum(is_adjacent_repeat) AS BIGINT) AS n_adjacent_repeats,
       CAST(CAST(sum(is_repeat) AS BIGINT) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS hit_share_x1e6
FROM flagged
GROUP BY conv_id
HAVING sum(is_repeat) > 0
"""

# ---------------------------------------------------------------------------
# Q: Markov next-tool model eval, even->odd conversation split
# ---------------------------------------------------------------------------


def q_markov_tool_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the transition model on even-numbered conversations, score
    top-1 next-tool accuracy on odd ones — the predictability baseline
    any learned tool policy must beat, per predecessor tool."""
    from chronographer_spark.operators.dialogue import markov_next_tool_eval

    tx = transcripts_from_events(spark, sf_dir)
    num = F.substring("conv_id", 5, 6).cast("long")
    train = tx.filter(num % 2 == 0)
    test = tx.filter(num % 2 == 1)
    return markov_next_tool_eval(train, test)

MARKOV_TOOL_EVAL_SQL = f"""
{TX_SQL},
split AS (
  SELECT *, CAST(substr(conv_id, 5, 6) AS BIGINT) % 2 AS par FROM tx
),
tr_calls AS (
  SELECT conv_id, turn_idx, tool AS tool_to
  FROM split WHERE tool <> '' AND par = 0
),
tr_pairs AS (
  SELECT lag(tool_to) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS tool_from,
         tool_to
  FROM tr_calls
),
model AS (
  SELECT tool_from, tool_to AS predicted
  FROM (
    SELECT tool_from, tool_to,
           row_number() OVER (
             PARTITION BY tool_from
             ORDER BY count(*) DESC, tool_to DESC) AS rk
    FROM tr_pairs WHERE tool_from IS NOT NULL
    GROUP BY tool_from, tool_to
  ) WHERE rk = 1
),
te_calls AS (
  SELECT conv_id, turn_idx, tool AS tool_to
  FROM split WHERE tool <> '' AND par = 1
),
te_pairs AS (
  SELECT * FROM (
    SELECT lag(tool_to) OVER (PARTITION BY conv_id ORDER BY turn_idx)
             AS tool_from,
           tool_to
    FROM te_calls
  ) WHERE tool_from IS NOT NULL
),
scored AS (
  SELECT CASE WHEN m.predicted IS NULL THEN '(unseen)'
              ELSE p.tool_from END AS tool_from,
         CASE WHEN m.predicted = p.tool_to THEN 1 ELSE 0 END AS hit
  FROM te_pairs p LEFT JOIN model m ON m.tool_from = p.tool_from
)
SELECT tool_from,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(hit) AS BIGINT) AS n_correct,
       CAST(CAST(sum(hit) AS BIGINT) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS acc_x1e6
FROM scored GROUP BY tool_from
"""

# ---------------------------------------------------------------------------
# Q: Viterbi decode of latent session state per conversation
# ---------------------------------------------------------------------------

VITERBI_STATES = ("ok", "confused", "acting")

VITERBI_START = {"ok": 0, "confused": -2, "acting": -3}

VITERBI_TRANS = {
    "ok": {"ok": 0, "confused": -3, "acting": -1},
    "confused": {"ok": -2, "confused": 0, "acting": -4},
    "acting": {"ok": -1, "confused": -3, "acting": -2},
}

VITERBI_EMIT = {
    "ok": {"user": 0, "assistant": 0, "lookup": -2, "action": -3},
    "confused": {"user": -1, "assistant": -2, "lookup": 0, "action": -5},
    "acting": {"user": -3, "assistant": -2, "lookup": -1, "action": 0},
}

def q_viterbi_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-plus Viterbi decode of a 3-state session-intent HMM over each
    conversation's (role, tool-kind) observation stream — the DuckDB
    oracle replays the identical integer DP as a recursive CTE carrying
    the whole state vector as columns (no aggregation in the recursive
    member needed for a fixed small state set)."""
    from chronographer_spark.data.transcripts import transcripts_from_events
    from chronographer_spark.operators.sequence import viterbi_decode

    tx = transcripts_from_events(spark, sf_dir)
    o = tx.select(
        "conv_id",
        "turn_idx",
        F.when(
            F.col("role") == "tool",
            F.when(F.col("tool").isin("click", "view"), F.lit("lookup"))
            .otherwise(F.lit("action")),
        )
        .otherwise(F.col("role"))
        .alias("obs"),
    )
    out = viterbi_decode(
        o,
        states=VITERBI_STATES,
        start=VITERBI_START,
        trans=VITERBI_TRANS,
        emit=VITERBI_EMIT,
    )
    return out.select("conv_id", "n_turns", "best_state", "best_score")

_VIT_E_OK = "CASE {o} WHEN 'user' THEN 0 WHEN 'assistant' THEN 0 WHEN 'lookup' THEN -2 ELSE -3 END"

_VIT_E_CF = "CASE {o} WHEN 'user' THEN -1 WHEN 'assistant' THEN -2 WHEN 'lookup' THEN 0 ELSE -5 END"

_VIT_E_AC = "CASE {o} WHEN 'user' THEN -3 WHEN 'assistant' THEN -2 WHEN 'lookup' THEN -1 ELSE 0 END"

VITERBI_SESSIONS_SQL = (
    TX_SQL.replace("WITH ev_rn", "WITH RECURSIVE ev_rn", 1)
    + f""",
obs AS (
  SELECT conv_id, turn_idx,
         CASE WHEN role = 'tool'
              THEN CASE WHEN tool IN ('click', 'view')
                        THEN 'lookup' ELSE 'action' END
              ELSE role END AS o
  FROM tx
),
lastt AS (SELECT conv_id, max(turn_idx) AS last FROM obs GROUP BY 1),
v(conv_id, i, vok, vcf, vac) AS (
  SELECT conv_id, 0,
         0 + {_VIT_E_OK.format(o='o')},
         -2 + {_VIT_E_CF.format(o='o')},
         -3 + {_VIT_E_AC.format(o='o')}
  FROM obs WHERE turn_idx = 0
  UNION ALL
  SELECT o.conv_id, v.i + 1,
         greatest(vok + 0, vcf + (-2), vac + (-1)) + {_VIT_E_OK.format(o='o.o')},
         greatest(vok + (-3), vcf + 0, vac + (-3)) + {_VIT_E_CF.format(o='o.o')},
         greatest(vok + (-1), vcf + (-4), vac + (-2)) + {_VIT_E_AC.format(o='o.o')}
  FROM v JOIN obs o ON o.conv_id = v.conv_id AND o.turn_idx = v.i + 1
)
SELECT v.conv_id, CAST(l.last + 1 AS BIGINT) AS n_turns,
       CASE WHEN vok >= vcf AND vok >= vac THEN 'ok'
            WHEN vcf >= vac THEN 'confused' ELSE 'acting' END AS best_state,
       CAST(greatest(vok, vcf, vac) AS BIGINT) AS best_score
FROM v JOIN lastt l ON l.conv_id = v.conv_id AND v.i = l.last
"""
)

# ---------------------------------------------------------------------------
# Q: rephrase / self-repair detection over consecutive user turns
# ---------------------------------------------------------------------------


def q_rephrase_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive user-turn rephrase screen on the transcripts view:
    templated texts make adjacent user turns near-identical whenever
    type and date coincide, so the
    threshold (lev <= 0.1 of max length — one field differing) splits
    the pair population ~20/80 instead of flagging everything the
    default 0.3 would on ~45-char templated texts."""
    from chronographer_spark.data.transcripts import transcripts_from_events
    from chronographer_spark.operators.dialogue import rephrase_spans

    tx = transcripts_from_events(spark, sf_dir)
    return rephrase_spans(tx, role="user", num=1, den=10)

REPHRASE_TURNS_SQL = (
    TX_SQL
    + """,
ut AS (
  SELECT conv_id, turn_idx, text,
         lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
  FROM tx WHERE role = 'user'
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_role_turns,
       CAST(count(prev) AS BIGINT) AS n_pairs,
       CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
                     AND levenshtein(prev, text) > 0
                     AND 10 * levenshtein(prev, text)
                         <= 1 * greatest(length(prev), length(text))
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_rephrase,
       CAST(coalesce(sum(CASE WHEN prev IS NOT NULL
                THEN levenshtein(prev, text) END), 0) AS BIGINT) AS sum_lev
FROM ut
GROUP BY conv_id
"""
)

def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference pairs over the transcript view: best-vs-worst
    assistant turn per conversation under the deterministic length proxy,
    pinned ties both directions, margin emitted. The oracle replays both
    rank windows and the >=2-turn admission."""
    from chronographer_spark.operators.dialogue import preference_pairs

    tx = transcripts_from_events(spark, sf_dir)
    return preference_pairs(tx, role="assistant")

PREFERENCE_PAIRS_SQL = f"""
{TX_SQL.strip()},
a AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         CAST(length(text) AS BIGINT) AS len
  FROM tx WHERE role = 'assistant'
),
ranked AS (
  SELECT conv_id, turn_idx, len,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY len DESC, turn_idx ASC) AS rc,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY len ASC, turn_idx DESC) AS rr,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM a
),
c AS (SELECT conv_id, turn_idx AS chosen_turn, len AS chosen_len
      FROM ranked WHERE rc = 1 AND n >= 2),
r AS (SELECT conv_id, turn_idx AS rejected_turn, len AS rejected_len
      FROM ranked WHERE rr = 1 AND n >= 2)
SELECT c.conv_id, c.chosen_turn, r.rejected_turn, c.chosen_len,
       r.rejected_len, c.chosen_len - r.rejected_len AS margin
FROM c JOIN r ON c.conv_id = r.conv_id
"""

# ---------------------------------------------------------------------------
# Q: chat-template rendering / context-tail truncation / regen compaction
# (transcript formatting stage of an SFT-data pipeline)
# ---------------------------------------------------------------------------


def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template render per conversation (dialogue.chat_render): the
    serialize-before-tokenize step; one conv_id shuffle, per-conversation
    array_sort, byte-stable strings both engines."""
    from chronographer_spark.operators.dialogue import chat_render

    return chat_render(transcripts_from_events(spark, sf_dir))

CHAT_RENDER_SQL = f"""
{TX_SQL},
r AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         string_agg(
           '<|' || CASE WHEN tool <> '' THEN 'tool:' || tool ELSE role END
                || '|>' || text,
           chr(10) ORDER BY turn_idx) AS rendered
  FROM tx GROUP BY conv_id
)
SELECT conv_id, n_turns, rendered,
       CAST(length(rendered) AS BIGINT) AS n_chars
FROM r
"""

def q_context_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget tail truncation (dialogue.context_tail, budget=64):
    reverse suffix-sum window + same-key agg, one shuffle; NULL
    first_kept_idx marks conversations whose final turn alone busts the
    budget."""
    from chronographer_spark.operators.dialogue import context_tail

    return context_tail(transcripts_from_events(spark, sf_dir), budget_tokens=64)

CONTEXT_TAIL_SQL = f"""
{TX_SQL},
turns AS (
  SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
         CAST(len(list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS BIGINT) AS tok
  FROM tx
),
sfx AS (
  SELECT conv_id, turn_idx, tok,
         sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sfx
  FROM turns
)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN sfx <= 64 THEN 1 ELSE 0 END) AS BIGINT) AS kept_turns,
       CAST(coalesce(sum(CASE WHEN sfx <= 64 THEN tok END), 0) AS BIGINT)
         AS kept_tokens,
       CAST(min(CASE WHEN sfx <= 64 THEN turn_idx END) AS BIGINT)
         AS first_kept_idx
FROM sfx GROUP BY conv_id
"""

def q_regen_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins regeneration compaction (dialogue.latest_wins_compact)
    over a deterministic retry fixture: conversations with conv_no % 3 == 0
    get their turn slots halved (turn_idx DIV 2), so each slot carries two
    attempts; the compactor keeps the latest by (ts, text, role, tool) and
    counts attempts per slot."""
    from chronographer_spark.operators.dialogue import latest_wins_compact

    tx = transcripts_from_events(spark, sf_dir)
    remap = tx.withColumn(
        "turn_idx",
        F.expr(
            "CASE WHEN CAST(substring(conv_id, 5, 6) AS INT) % 3 = 0 "
            "THEN turn_idx DIV 2 ELSE turn_idx END"
        ).cast("int"),
    )
    return latest_wins_compact(remap)

REGEN_LATEST_WINS_SQL = f"""
{TX_SQL},
remap AS (
  SELECT conv_id,
         CASE WHEN CAST(substring(conv_id, 5, 6) AS INT) % 3 = 0
              THEN turn_idx // 2 ELSE turn_idx END AS turn_idx,
         role, text, tool, ts
  FROM tx
),
ranked AS (
  SELECT conv_id, turn_idx, role, text,
         row_number() OVER (PARTITION BY conv_id, turn_idx
                            ORDER BY ts DESC, text DESC, role DESC, tool DESC)
           AS rn,
         count(*) OVER (PARTITION BY conv_id, turn_idx) AS n_attempts
  FROM remap
)
SELECT conv_id, CAST(turn_idx AS BIGINT) AS turn_idx,
       CAST(n_attempts AS BIGINT) AS n_attempts, role, text
FROM ranked WHERE rn = 1
"""

# ---------------------------------------------------------------------------
# Q: generation diversity (distinct-n) + duplicate-turn rate per role
# ---------------------------------------------------------------------------


def q_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/distinct-2 per role (dialogue.distinct_n_diversity):
    the mode-collapse screen over each role's turn text."""
    from chronographer_spark.operators.dialogue import distinct_n_diversity

    return distinct_n_diversity(transcripts_from_events(spark, sf_dir), n=2)

DISTINCT_N_SQL = f"""
{TX_SQL},
toks AS (
  SELECT role, list_filter(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
    t -> t <> '') AS tk
  FROM tx
),
uni AS (
  SELECT role, CAST(count(*) AS BIGINT) AS total_1,
         CAST(count(DISTINCT g) AS BIGINT) AS distinct_1
  FROM (SELECT role, unnest(tk) AS g FROM toks) GROUP BY role
),
ng AS (
  SELECT role, CAST(count(*) AS BIGINT) AS total_n,
         CAST(count(DISTINCT g) AS BIGINT) AS distinct_n
  FROM (
    SELECT role,
           unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
             i -> array_to_string(tk[i : i + 1], ' '))) AS g
    FROM toks WHERE len(tk) >= 2
  ) GROUP BY role
)
SELECT u.role, total_1, distinct_1,
  CAST(distinct_1 * 1000000 // greatest(total_1, 1) AS BIGINT) AS d1_x1e6,
  CAST(coalesce(total_n, 0) AS BIGINT) AS total_n,
  CAST(coalesce(distinct_n, 0) AS BIGINT) AS distinct_n,
  CAST(coalesce(distinct_n, 0) * 1000000
       // greatest(coalesce(total_n, 0), 1) AS BIGINT) AS dn_x1e6
FROM uni u LEFT JOIN ng USING (role)
"""

def q_dup_turn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-conversation duplicate-turn rate per role
    (dialogue.duplicate_turn_rate): templated/copy-paste turn pressure
    on the SFT corpus."""
    from chronographer_spark.operators.dialogue import duplicate_turn_rate

    return duplicate_turn_rate(transcripts_from_events(spark, sf_dir))

DUP_TURN_RATE_SQL = f"""
{TX_SQL},
normed AS (SELECT role,
                  regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
           FROM tx),
per_text AS (SELECT role, t, CAST(count(*) AS BIGINT) AS c
             FROM normed GROUP BY role, t),
mx AS (SELECT role, CAST(max(c) AS BIGINT) AS mc FROM per_text GROUP BY role),
agg AS (SELECT role, CAST(sum(c) AS BIGINT) AS n_turns,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM per_text GROUP BY role)
SELECT a.role, n_turns, n_distinct,
  CAST((n_turns - n_distinct) * 1000000 // greatest(n_turns, 1) AS BIGINT)
    AS dup_rate_x1e6,
  mc AS top_repeat_n
FROM agg a JOIN mx USING (role)
"""

# ---------------------------------------------------------------------------
# Q: Markov entropy rate + conversation near-dups + sessionizer agreement
# ---------------------------------------------------------------------------


def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-transition entropy rate (dialogue.markov_entropy_rate):
    per-source conditional entropy + the `__rate__` row, msb16 device
    with exact offset removal."""
    from chronographer_spark.operators.dialogue import markov_entropy_rate

    return markov_entropy_rate(transcripts_from_events(spark, sf_dir))

def _markov_entropy_sql() -> str:
    m16 = _duck_msb16("n_s * 1048576 // n_st")
    return f"""
{TX_SQL},
calls AS (SELECT conv_id, turn_idx, tool AS t_to FROM tx WHERE tool <> ''),
pairs AS (
  SELECT lag(t_to) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS t_from,
         t_to
  FROM calls
),
cnt AS (SELECT t_from, t_to, CAST(count(*) AS BIGINT) AS n_st
        FROM pairs WHERE t_from IS NOT NULL GROUP BY t_from, t_to),
src AS (SELECT t_from, CAST(sum(n_st) AS BIGINT) AS n_s FROM cnt GROUP BY t_from),
per AS (
  SELECT cnt.t_from, max(src.n_s) AS n_s,
         CAST(sum(n_st * ({m16})) AS BIGINT) AS s16
  FROM cnt JOIN src USING (t_from) GROUP BY cnt.t_from
)
SELECT t_from AS src, CAST(n_s AS BIGINT) AS n_out,
       CAST((s16 - 320 * n_s) * 1000 // (16 * n_s) AS BIGINT) AS h_x1e3
FROM per
UNION ALL
SELECT '__rate__', CAST(sum(n_s) AS BIGINT),
       CAST((sum(s16) - 320 * sum(n_s)) * 1000 // (16 * sum(n_s)) AS BIGINT)
FROM per
"""

MARKOV_ENTROPY_SQL = _markov_entropy_sql()

QUERIES = {
    "markov_entropy_rate": q_markov_entropy,
    "distinct_n_diversity": q_distinct_n,
    "duplicate_turn_rate": q_dup_turn_rate,
    "chat_render": q_chat_render,
    "context_tail_budget": q_context_tail,
    "regen_latest_wins": q_regen_latest_wins,
    "dialogue_metrics": q_dialogue_metrics,
    "tool_transitions": q_tool_transitions,
    "gazetteer_mentions": q_gazetteer_mentions,
    "distant_patterns": q_distant_patterns,
    "snowball_triples": q_snowball_triples,
    "context_windows": q_context_windows,
    "anaphora_resolution": q_anaphora,
    "tool_loop_runs": q_tool_loops,
    "topic_boundaries": q_topic_boundaries,
    "comention_graph": q_comention_graph,
    "topic_segments": q_topic_segments,
    "tx_conformance": q_tx_conformance,
    "tool_cache_hits": q_tool_cache_hits,
    "markov_tool_eval": q_markov_tool_eval,
    "viterbi_sessions": q_viterbi_sessions,
    "rephrase_turns": q_rephrase_turns,
    "preference_pairs": q_preference_pairs,
}

ORACLE_SQL = {
    "markov_entropy_rate": MARKOV_ENTROPY_SQL,
    "distinct_n_diversity": DISTINCT_N_SQL,
    "duplicate_turn_rate": DUP_TURN_RATE_SQL,
    "chat_render": CHAT_RENDER_SQL,
    "context_tail_budget": CONTEXT_TAIL_SQL,
    "regen_latest_wins": REGEN_LATEST_WINS_SQL,
    "dialogue_metrics": DIALOGUE_METRICS_SQL,
    "tool_transitions": TOOL_TRANSITIONS_SQL,
    "gazetteer_mentions": GAZETTEER_MENTIONS_SQL,
    "distant_patterns": DISTANT_PATTERNS_SQL,
    "snowball_triples": SNOWBALL_TRIPLES_SQL,
    "context_windows": CONTEXT_WINDOWS_SQL,
    "anaphora_resolution": ANAPHORA_SQL,
    "tool_loop_runs": TOOL_LOOPS_SQL,
    "topic_boundaries": TOPIC_BOUNDARIES_SQL,
    "comention_graph": COMENTION_SQL,
    "topic_segments": TOPIC_SEGMENTS_SQL,
    "tx_conformance": TX_CONFORMANCE_SQL,
    "tool_cache_hits": TOOL_CACHE_HITS_SQL,
    "markov_tool_eval": MARKOV_TOOL_EVAL_SQL,
    "viterbi_sessions": VITERBI_SESSIONS_SQL,
    "rephrase_turns": REPHRASE_TURNS_SQL,
    "preference_pairs": PREFERENCE_PAIRS_SQL,
}
