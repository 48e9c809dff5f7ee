"""Operator inventory for the driver's correctness gate.

Each entry pairs a Spark implementation (QUERIES[name](spark, sf_dir)) with a
DuckDB oracle (ORACLE_SQL[name]) over the same parquet tables. Column names
and value representations are pinned identically on both sides; floats are
emitted as scaled BIGINTs (floor(x*K + 0.5)) so value hashes are portable.

Keys map to SURVEY.md §2 operator IDs (noted per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .data.transcripts import transcripts_from_events
from .extraction.mentions import extract_mentions
from .graph.materialize import materialize_event_graph


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Shared SQL fragment: the transcripts view derived from `events`
# (mirrors data/transcripts.py::transcripts_from_events exactly)
# ---------------------------------------------------------------------------

TX_SQL = """
WITH ev_rn AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
tx AS (
  SELECT
    'conv' || lpad(CAST(user_id AS VARCHAR), 6, '0') AS conv_id,
    CAST(rn - 1 AS INT) AS turn_idx,
    ['user','assistant','tool'][CAST((rn - 1) % 3 AS INT) + 1] AS role,
    'event ' || event_type || ' with value '
      || CAST(CAST(floor(value) AS BIGINT) AS VARCHAR)
      || ' recorded on ' || strftime(ts, '%Y-%m-%d') AS text,
    CASE WHEN (rn - 1) % 3 = 2 THEN event_type ELSE '' END AS tool,
    ts
  FROM ev_rn
)
"""

# compact CURIE namespaces (see vocab.PREFIXES; expanded only at TTL export)
NS_NG = "ng:"
NS_SEM = "sem:"
RDF_TYPE = "rdf:type"


# ---------------------------------------------------------------------------
# Q: flagship — full transcript -> SEM event graph (extraction UDF + emission)
# ---------------------------------------------------------------------------


def q_flagship_event_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .data.transcripts import conv_string_expr, transcripts_from_events_longkey
    from .graph.materialize import build_event_graph

    # binary-id hot path (r4): conv key stays a BIGINT through every
    # exchange/window; the 'conv%06d' string appears only in post-shuffle
    # URI projections. Output bit-identical to the string-keyed path
    # (scripts/bench_binids.py check), +6% at 32 cores and one fewer
    # exchange (the user_id ordering partitioning is reused).
    tx = transcripts_from_events_longkey(spark, sf_dir)
    return build_event_graph(tx, conv_expr=conv_string_expr())


FLAGSHIP_SQL = f"""
{TX_SQL},
e AS (
  SELECT tx.*,
    '{NS_NG}event/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS ev_uri,
    '{NS_NG}conversation/' || conv_id AS conv_uri,
    regexp_extract(text, '\\d{{4}}-\\d{{2}}-\\d{{2}}') AS day
  FROM tx
)
SELECT subject, predicate, object FROM (
  SELECT ev_uri AS subject, '{RDF_TYPE}' AS predicate, '{NS_SEM}Event' AS object FROM e
  UNION
  SELECT ev_uri, '{NS_SEM}hasActor', '{NS_NG}actor/' || role FROM e
  UNION
  SELECT ev_uri, '{NS_SEM}subEventOf', conv_uri FROM e
  UNION
  SELECT conv_uri, '{NS_SEM}hasSubEvent', ev_uri FROM e
  UNION
  SELECT ev_uri, '{NS_NG}inConversation', conv_uri FROM e
  UNION
  SELECT '{NS_NG}event/' || conv_id || '/' || CAST(turn_idx AS VARCHAR),
         '{NS_NG}nextEvent',
         '{NS_NG}event/' || conv_id || '/' || CAST(nt AS VARCHAR)
  FROM (SELECT conv_id, turn_idx,
               lead(turn_idx) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS nt
        FROM e)
  WHERE nt IS NOT NULL
  UNION
  SELECT ev_uri, '{NS_NG}usedTool', '{NS_NG}tool/' || tool
  FROM e WHERE role = 'tool' AND tool <> ''
  UNION
  SELECT ev_uri, '{NS_SEM}hasBeginTimeStamp', day FROM e WHERE day <> ''
  UNION
  SELECT ev_uri, '{NS_SEM}hasEndTimeStamp', day FROM e WHERE day <> ''
)
"""


# ---------------------------------------------------------------------------
# Q: transcripts view itself (derivation determinism check)
# ---------------------------------------------------------------------------


def q_transcripts_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcripts_from_events(spark, sf_dir).select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
    )


TX_VIEW_SQL = f"""
{TX_SQL}
SELECT conv_id, turn_idx, role, text, tool,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
FROM tx
"""


def q_anaphora(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-turn anaphora resolution (extraction/mentions.py
    resolve_anaphora) over the transcript view: user turns contribute
    entity mentions (the event type), assistant turns contribute an 'it'
    pronoun; each pronoun resolves to the latest strictly-earlier entity
    in its conversation via one RANGE-frame struct-max window. The
    oracle replays the identical window."""
    from .extraction.mentions import resolve_anaphora

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


# ---------------------------------------------------------------------------
# A1: occurrence counting (path popularity)
# ---------------------------------------------------------------------------


def q_occurrence_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("cnt"))


# ---------------------------------------------------------------------------
# A2/A3: entropy score + deterministic argmax (ranker semantics,
# reference src/ranker.py:40-64 with pinned (score desc, key asc) tie-break)
# ---------------------------------------------------------------------------


def q_entropy_rank_top1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    # deliberate single-partition window: `counts` is a handful of rows (one
    # per distinct path key — SURVEY.md §4 sizes the occurrence table as
    # tiny), so Spark's "No Partition Defined ... moving all data to a
    # single partition" warning is expected and harmless HERE; treat the
    # same warning on any large table as a real regression.
    w = Window.partitionBy()
    scored = counts.withColumn("tot", F.sum("cnt").over(w)).withColumn(
        "score",
        -(F.col("cnt") / F.col("tot")) * F.log(F.col("cnt") / F.col("tot")),
    )
    top = scored.orderBy(F.desc("score"), F.asc("event_type")).limit(1)
    return top.select(
        "event_type",
        F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long").alias("score_x1e6"),
    )


ENTROPY_SQL = """
WITH counts AS (SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type),
scored AS (
  SELECT event_type,
         -(CAST(cnt AS DOUBLE) / SUM(cnt) OVER ()) * ln(CAST(cnt AS DOUBLE) / SUM(cnt) OVER ()) AS score
  FROM counts
)
SELECT event_type,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_x1e6
FROM scored ORDER BY score DESC, event_type ASC LIMIT 1
"""


# ---------------------------------------------------------------------------
# J1/J2: frontier expansion join (set-oriented; one hash join per iteration)
# ---------------------------------------------------------------------------


def q_frontier_expand_outgoing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    frontier = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    triples = orders.select(
        F.concat(F.lit("cust:"), F.col("o_custkey").cast("string")).alias("subject"),
        F.lit("placed").alias("predicate"),
        F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")).alias("object"),
        F.col("o_custkey"),
    )
    # broadcast the small frontier side — no shuffle of the big triple table
    return (
        triples.join(
            F.broadcast(frontier), triples.o_custkey == frontier.c_custkey, "left_semi"
        )
        .select("subject", "predicate", "object")
        .dropDuplicates()
    )


FRONTIER_OUT_SQL = """
SELECT DISTINCT 'cust:' || CAST(o_custkey AS VARCHAR) AS subject,
       'placed' AS predicate,
       'order:' || CAST(o_orderkey AS VARCHAR) AS object
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
"""


# ---------------------------------------------------------------------------
# J3: two-hop specific-outgoing (frontier -> neighbors -> their type/date rows)
# ---------------------------------------------------------------------------


def q_two_hop_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    frontier = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    hop1 = orders.join(
        F.broadcast(frontier), orders.o_custkey == frontier.c_custkey, "inner"
    ).select("o_orderkey", "o_custkey")
    hop2 = li.join(hop1, li.l_orderkey == hop1.o_orderkey, "inner")
    return hop2.groupBy("o_custkey").agg(
        F.count("*").alias("n_lineitems"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )


TWO_HOP_SQL = """
SELECT o.o_custkey AS o_custkey, count(*) AS n_lineitems,
       count(DISTINCT l.l_partkey) AS n_parts
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY o.o_custkey
"""


# ---------------------------------------------------------------------------
# F11/U2: pending-minus-visited anti-join
# ---------------------------------------------------------------------------


def q_anti_join_visited(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    visited = ev.filter(F.col("event_type") == "signup").select("user_id").dropDuplicates()
    return (
        ev.join(visited, "user_id", "left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )


ANTI_JOIN_SQL = """
SELECT user_id, count(*) AS n_events FROM events
WHERE user_id NOT IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# F5: temporal range discard (string-lexical ISO compare, filtering.py:52-63)
# ---------------------------------------------------------------------------


def q_temporal_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # each event is a node with a point-in-time date; discard iff the date
    # falls outside the window — lexical ISO compare, exactly filtering.py:56-63
    ev = _t(spark, sf_dir, "events")
    lo, hi = "2024-03-01", "2024-09-30"
    nodes = ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd").alias("point_in_time")
    )
    return nodes.filter(
        (F.col("point_in_time") < F.lit(lo)) | (F.col("point_in_time") > F.lit(hi))
    )


TEMPORAL_DISCARD_SQL = """
SELECT event_id, strftime(ts, '%Y-%m-%d') AS point_in_time FROM events
WHERE strftime(ts, '%Y-%m-%d') < '2024-03-01'
   OR strftime(ts, '%Y-%m-%d') > '2024-09-30'
"""


# ---------------------------------------------------------------------------
# F6: URI-year regex discard (filtering.py:65-97 semantics: extract \d{4},
# default to window-start year, discard outside [start_year, end_year])
# ---------------------------------------------------------------------------


def q_regex_year_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    uris = li.select(
        F.concat(
            F.lit("evt_"), F.date_format("l_shipdate", "yyyy"), F.lit("_item")
        ).alias("uri")
    ).dropDuplicates()
    year = F.coalesce(
        F.nullif(F.regexp_extract("uri", r"(\d{4})", 1), F.lit("")), F.lit("1995")
    )
    return uris.withColumn("year", year).filter(
        (F.col("year") < "1996") | (F.col("year") > "1999")
    )


REGEX_DISCARD_SQL = """
WITH uris AS (
  SELECT DISTINCT 'evt_' || strftime(l_shipdate, '%Y') || '_item' AS uri FROM lineitem
)
SELECT uri, coalesce(nullif(regexp_extract(uri, '(\\d{4})', 1), ''), '1995') AS year
FROM uris
WHERE coalesce(nullif(regexp_extract(uri, '(\\d{4})', 1), ''), '1995') < '1996'
   OR coalesce(nullif(regexp_extract(uri, '(\\d{4})', 1), ''), '1995') > '1999'
"""


# ---------------------------------------------------------------------------
# J4: superclass annotation via broadcast joins (ordering.py:146-174 analog)
# ---------------------------------------------------------------------------


def q_superclass_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    closure = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey"), F.col("n_name"), F.col("r_name"))
    return (
        cust.join(F.broadcast(closure), cust.c_nationkey == closure.n_nationkey)
        .select(
            "c_custkey",
            F.col("n_name").alias("class"),
            F.col("r_name").alias("superclass"),
        )
    )


SUPERCLASS_SQL = """
SELECT c.c_custkey, n.n_name AS class, r.r_name AS superclass
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


# ---------------------------------------------------------------------------
# Window ops (§2.5): lead ordering edges + first-mention dedup
# ---------------------------------------------------------------------------


def q_window_lead_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id", F.lead("event_id").over(w).alias("next_event_id")
    )


WINDOW_LEAD_SQL = """
SELECT user_id, event_id,
       lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
FROM events
"""


def q_window_first_mention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id")
    )


WINDOW_FIRST_SQL = """
SELECT user_id, event_type, event_id FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# A8: min-start/max-end with end:=start fallback (generic_kb_to_ng.py:152-177)
# ---------------------------------------------------------------------------


def q_minmax_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.date_format(
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))), "yyyy-MM-dd"
        ).alias("begin"),
        F.date_format(
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))), "yyyy-MM-dd"
        ).alias("end_raw"),
    )
    return (
        agg.filter(F.col("begin").isNotNull())
        .withColumn("end", F.coalesce("end_raw", "begin"))
        .select("user_id", "begin", "end")
    )


MINMAX_SQL = """
WITH agg AS (
  SELECT user_id,
    strftime(min(CASE WHEN event_type = 'signup' THEN ts END), '%Y-%m-%d') AS begin,
    strftime(max(CASE WHEN event_type = 'purchase' THEN ts END), '%Y-%m-%d') AS end_raw
  FROM events GROUP BY user_id
)
SELECT user_id, begin, coalesce(end_raw, begin) AS "end"
FROM agg WHERE begin IS NOT NULL
"""


# ---------------------------------------------------------------------------
# F13: exact dedup; U4: set difference; A4: unique-event count
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.countDistinct("text").alias("n_unique"), F.count("*").alias("n_rows")
    )


DEDUP_EXACT_SQL = """
SELECT lang, source, count(DISTINCT text) AS n_unique, count(*) AS n_rows
FROM documents GROUP BY lang, source
"""


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # triple-set difference (sem_comparison.py:52-55 analog) on word sets
    docs = _t(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    w0 = words.filter(F.col("doc_id") == 0).select("word").distinct()
    w1 = words.filter(F.col("doc_id") == 1).select("word").distinct()
    return w0.subtract(w1)


SET_EXCEPT_SQL = """
SELECT DISTINCT w AS word FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                                FROM documents) WHERE doc_id = 0
EXCEPT
SELECT DISTINCT w FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                        FROM documents) WHERE doc_id = 1
"""


def q_count_unique_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.countDistinct("event_id").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


COUNT_UNIQUE_SQL = """
SELECT count(DISTINCT event_id) AS n_events, count(DISTINCT user_id) AS n_users
FROM events
"""


# ---------------------------------------------------------------------------
# A6: event-level P/R/F1 (metrics.py:62-94) — integer-scaled
# ---------------------------------------------------------------------------


def q_event_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    gold = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    found = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    tp = found.join(gold, "user_id", "inner").count()
    fp = found.join(gold, "user_id", "left_anti").count()
    fn = gold.join(found, "user_id", "left_anti").count()
    spark_df = spark.createDataFrame([(tp, fp, fn)], ["tp", "fp", "fn"])
    return spark_df.selectExpr(
        "tp",
        "fp",
        "fn",
        "CAST(tp * 1000000 DIV (tp + fp) AS BIGINT) AS p_x1e6",
        "CAST(tp * 1000000 DIV (tp + fn) AS BIGINT) AS r_x1e6",
    )


PRF1_SQL = """
WITH gold AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'),
found AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
c AS (
  SELECT
    (SELECT count(*) FROM found WHERE user_id IN (SELECT user_id FROM gold)) AS tp,
    (SELECT count(*) FROM found WHERE user_id NOT IN (SELECT user_id FROM gold)) AS fp,
    (SELECT count(*) FROM gold WHERE user_id NOT IN (SELECT user_id FROM found)) AS fn
)
SELECT tp, fp, fn,
       CAST((tp * 1000000) // (tp + fp) AS BIGINT) AS p_x1e6,
       CAST((tp * 1000000) // (tp + fn) AS BIGINT) AS r_x1e6
FROM c
"""


# ---------------------------------------------------------------------------
# Text analysis ops over documents
# ---------------------------------------------------------------------------


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )


TOKEN_COUNT_SQL = """
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.floor(
            (F.size(F.array_distinct(words)) * 10000).cast("double") / F.size(words)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("distinct_ratio_x1e4"),
        F.size(words).cast("long").alias("n_tokens"),
    )


QUALITY_SQL = """
SELECT doc_id,
  CAST(floor(CAST(len(list_distinct(string_split(text, ' '))) * 10000 AS DOUBLE)
       / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS distinct_ratio_x1e4,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop = F.size(F.expr("filter(split(text, ' '), w -> w IN ('the', 'a'))"))
    return docs.select(
        "doc_id",
        F.floor((stop * 10000).cast("double") / F.size(words) + F.lit(0.5))
        .cast("long")
        .alias("stopword_ratio_x1e4"),
    )


LANG_ID_SQL = """
SELECT doc_id,
  CAST(floor(CAST(len(list_filter(string_split(text, ' '), w -> w IN ('the', 'a'))) * 10000 AS DOUBLE)
       / len(string_split(text, ' ')) + 0.5) AS BIGINT) AS stopword_ratio_x1e4
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", F.md5("text").alias("fp"))


FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fp FROM documents"


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    return w.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("word")))).alias(f"h{i}")
            for i in range(4)
        ]
    )


MINHASH_SQL = """
SELECT doc_id,
  min(md5('s0|' || w)) AS h0, min(md5('s1|' || w)) AS h1,
  min(md5('s2|' || w)) AS h2, min(md5('s3|' || w)) AS h3
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY doc_id
"""


def q_vocab_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    vocab = ["spark", "join", "merge", "customer", "window"]
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word").isin(vocab))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


VOCAB_MENTIONS_SQL = """
SELECT w AS word, count(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
WHERE w IN ('spark', 'join', 'merge', 'customer', 'window')
GROUP BY w
"""


# ---------------------------------------------------------------------------
# Similarity: brute-force cosine top-k (rank output; scaled sim for stability)
# ---------------------------------------------------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    qv = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    dot = F.aggregate(
        F.zip_with("v", "q", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sims = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (dot / (norm("v") * norm("q"))).alias("sim"),
        )
    )
    # top-k via orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # heap + driver merge) — no single-partition global window shuffle
    topk = sims.orderBy(F.desc("sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("sim"), F.asc("vec_id"))  # 10 rows only
    return topk.withColumn("rank", F.row_number().over(w)).select("vec_id", "rank")


COSINE_TOPK_SQL = """
WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS q FROM embeddings WHERE vec_id = 0),
sims AS (
  SELECT e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.q)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.q, q.q))) AS sim
  FROM embeddings e, q WHERE e.vec_id <> 0
)
SELECT vec_id, CAST(row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS INT) AS rank
FROM sims ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# G7: connected components canonicalization (chain-edge fixture; expected
# canonical = min custkey per nation, trivially SQL-checkable)
# ---------------------------------------------------------------------------


def q_cc_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .linking.canonicalize import connected_components

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    edges = (
        cust.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("c_custkey").alias("src"), F.col("nxt").alias("dst"))
    )
    singletons = cust.select(F.col("c_custkey").alias("node"))
    # chain fixture = bounded degree, no hubs, high diameter -> window
    # strategy (1-exchange rounds) + per-partition union-find precontraction
    # (collapses in-partition chain segments; ~2-4x measured at sf0.1);
    # hub-skewed alias graphs use the default "agg" without precontract
    cc = connected_components(
        edges, all_nodes=singletons, strategy="window", precontract=True
    )
    return cc.select("node", "component").withColumnRenamed("component", "canonical")


CC_SQL = """
SELECT c_custkey AS node, min(c_custkey) OVER (PARTITION BY c_nationkey) AS canonical
FROM customer
"""


# ---------------------------------------------------------------------------
# Dedup / similarity / text-analysis operator families
# ---------------------------------------------------------------------------


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, num_hashes=8, bands=2, shingle_n=1
    )


MINHASH_LSH_SQL = """
WITH words AS (
  SELECT doc_id, unnest(list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS w
  FROM documents
),
sig AS (
  SELECT doc_id,
    min(md5('s0|' || w)) AS h0, min(md5('s1|' || w)) AS h1,
    min(md5('s2|' || w)) AS h2, min(md5('s3|' || w)) AS h3,
    min(md5('s4|' || w)) AS h4, min(md5('s5|' || w)) AS h5,
    min(md5('s6|' || w)) AS h6, min(md5('s7|' || w)) AS h7
  FROM words GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sig
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def q_lang_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import language_id

    docs = _t(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang_pred")


LANG_ID_MULTI_SQL = """
WITH words AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
ratios AS (
  SELECT doc_id, 'en' AS lang,
    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
      / greatest(len(w), 1) AS ratio FROM words
  UNION ALL
  SELECT doc_id, 'fr',
    CAST(len(list_filter(w, x -> x IN ('le','la','de','et','les','des','un','une','dans','est'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
  UNION ALL
  SELECT doc_id, 'de',
    CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','von','mit','den','ein','zu'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
)
SELECT doc_id, lang AS lang_pred FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY ratio DESC, lang DESC) AS rn
  FROM ratios
) WHERE rn = 1
"""


def q_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import token_counts

    docs = _t(spark, sf_dir, "documents")
    return token_counts(docs).select(
        "doc_id",
        F.col("n_ws_tokens").cast("long").alias("n_ws_tokens"),
        F.col("n_subword_est").cast("long").alias("n_subword_est"),
    )


SUBWORD_SQL = r"""
SELECT doc_id,
  CAST(len(string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS BIGINT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '([A-Za-z]{1,4}|\d|[^\sA-Za-z\d])', 1)) AS BIGINT) AS n_subword_est
FROM documents
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import embedding_near_dups

    emb = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.3, n_planes=4, n_tables=2, dim=64)
    return pairs.select(
        "id_a",
        "id_b",
        F.floor(F.col("cosine") * 10000 + F.lit(0.5)).cast("long").alias("cos_x1e4"),
    )


# Shared SQL fragment: md5-derived ±1 hyperplanes + per-vector LSH bucket
# signature — mirrors similarity.portable_hyperplanes/_portable_sign exactly
# (sign component (t,p,d) = parity of the first 8 md5 hex chars of "h|t|p|d").
def _lsh_sig_sql(n_tables: int, n_planes: int, dim: int) -> str:
    return f"""
emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
planes AS (
  SELECT t, p,
    list(CASE WHEN CAST(concat('0x', substr(md5(
           'h|' || CAST(t AS VARCHAR) || '|' || CAST(p AS VARCHAR) || '|' || CAST(d AS VARCHAR)
         ), 1, 8)) AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END ORDER BY d) AS hv
  FROM (SELECT unnest(range({n_tables})) AS t),
       (SELECT unnest(range({n_planes})) AS p),
       (SELECT unnest(range({dim})) AS d)
  GROUP BY t, p
),
sig AS (
  SELECT e.vec_id, pl.t,
    string_agg(CASE WHEN list_dot_product(e.v, pl.hv) >= 0 THEN '1' ELSE '0' END,
               '' ORDER BY pl.p) AS bucket
  FROM emb2 e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
)"""


EMB_NEAR_DUP_SQL = f"""
WITH {_lsh_sig_sql(2, 4, 64)},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.id_a, c.id_b,
  CAST(floor(list_dot_product(ea.v, eb.v)
    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v)))
    * 10000 + 0.5) AS BIGINT) AS cos_x1e4
FROM cand c
JOIN emb2 ea ON ea.vec_id = c.id_a
JOIN emb2 eb ON eb.vec_id = c.id_b
WHERE list_dot_product(ea.v, eb.v)
    / (sqrt(list_dot_product(ea.v, ea.v)) * sqrt(list_dot_product(eb.v, eb.v))) >= 0.3
"""


def q_lsh_topk_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN with md5-portable planes — the gate-verified
    twin of the xxhash64 lsh_topk (same algorithm; the JVM-hash variant stays
    as the bench fast path and its agreement test)."""
    from .operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_topk(emb, queries, k=5, n_planes=4, n_tables=2, portable=True, dim=64)
    return out.select("query_id", F.col("vec_id"), "rank")


LSH_TOPK_SQL = f"""
WITH {_lsh_sig_sql(2, 4, 64)},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM sig c JOIN sig q ON c.t = q.t AND c.bucket = q.bucket
  WHERE q.vec_id < 3
),
scored AS (
  SELECT c.query_id, c.vec_id,
    list_dot_product(ec.v, eq.v)
      / (sqrt(list_dot_product(ec.v, ec.v)) * sqrt(list_dot_product(eq.v, eq.v))) AS cosine
  FROM cand c
  JOIN emb2 ec ON ec.vec_id = c.vec_id
  JOIN emb2 eq ON eq.vec_id = c.query_id
)
SELECT query_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM scored)
WHERE rn <= 5
"""


def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 + exact-top1 placement of the portable LSH ANN against the
    integer-exact quantized-cosine ranking, per query vector — the eval
    harness composing two already-gated rankings into set/rank algebra."""
    from .operators.similarity import ann_recall_report, lsh_topk, quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = quantized_topk(emb, queries, k=5)
    approx = lsh_topk(emb, queries, k=5, n_planes=4, n_tables=2, portable=True, dim=64)
    return ann_recall_report(exact, approx, k=5)


ANN_RECALL_SQL = f"""
WITH {_lsh_sig_sql(2, 4, 64)},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM sig c JOIN sig q ON c.t = q.t AND c.bucket = q.bucket
  WHERE q.vec_id < 3
),
scored AS (
  SELECT c.query_id, c.vec_id,
    list_dot_product(ec.v, eq.v)
      / (sqrt(list_dot_product(ec.v, ec.v)) * sqrt(list_dot_product(eq.v, eq.v))) AS cosine
  FROM cand c
  JOIN emb2 ec ON ec.vec_id = c.vec_id
  JOIN emb2 eq ON eq.vec_id = c.query_id
),
approx AS (
  SELECT query_id, vec_id, rn AS arank FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM scored)
  WHERE rn <= 5
),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb2
),
ex AS (
  SELECT query_id, vec_id, rn AS erank FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST(list_sum(list_transform(list_zip(c.q, q.q), x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
          / sqrt(CAST(list_sum(list_transform(c.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))
                 * list_sum(list_transform(q.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS DOUBLE)) DESC,
        c.vec_id ASC) AS rn
    FROM qz c JOIN qz q ON q.vec_id < 3)
  WHERE rn <= 5
)
SELECT e.query_id,
  CAST(count(a.arank) AS BIGINT) AS n_hits,
  CAST(max(CASE WHEN e.erank = 1 THEN coalesce(a.arank, 0) END) AS BIGINT) AS top1_rank,
  CAST((count(a.arank) * 1000000) // 5 AS BIGINT) AS recall_x1e6
FROM ex e LEFT JOIN approx a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload decode pipeline with the portable stub codec: assets
    derive from `documents` (payload = utf-8 text bytes), the Arrow-batched
    mapInPandas emits md5-arithmetic features, and the oracle replays every
    feature value — the plumbing AND the values are gate-verified."""
    from .operators.multimodal import assets_from_documents, decode_and_featurize

    docs = _t(spark, sf_dir, "documents")
    assets = assets_from_documents(docs, limit=30)
    out = decode_and_featurize(assets, dim=8)
    return out.select(
        "asset_id",
        "modality",
        F.posexplode("feat").alias("j", "feat"),
        "out_width",
        "out_height",
    ).select(
        "asset_id",
        "modality",
        "j",
        F.floor(F.col("feat") * 1000000 + F.lit(0.5)).cast("long").alias("feat_x1e6"),
        "out_width",
        "out_height",
    )


MULTIMODAL_FEATURES_SQL = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 30),
j AS (SELECT unnest(range(8)) AS j)
SELECT d.doc_id AS asset_id,
  ['image','audio','video'][CAST(d.doc_id % 3 AS INT) + 1] AS modality,
  CAST(j.j AS INT) AS j,
  CAST(CAST(concat('0x', substr(md5(d.text || '|' || CAST(j.j AS VARCHAR)), 1, 8)) AS BIGINT)
       % 2000000 - 1000000 AS BIGINT) AS feat_x1e6,
  224 AS out_width, 224 AS out_height
FROM d, j
"""


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over video assets: native sequence-explode for frame
    times, stub decode for per-frame fingerprints (md5(payload || '|f' || idx)
    — oracle-replayable)."""
    from .operators.multimodal import assets_from_documents, sample_frames

    docs = _t(spark, sf_dir, "documents")
    assets = assets_from_documents(docs, limit=30)
    return sample_frames(assets, every_ms=1000)


MULTIMODAL_FRAMES_SQL = """
WITH v AS (
  SELECT doc_id, text, 40 * n_chars AS duration_ms
  FROM documents WHERE doc_id < 30 AND doc_id % 3 = 2
),
f AS (
  SELECT doc_id, text,
         unnest(range(greatest(duration_ms // 1000, 1))) AS frame_idx
  FROM v
)
SELECT doc_id AS asset_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(frame_idx * 1000 AS BIGINT) AS frame_ms,
       md5(text || '|f' || CAST(frame_idx AS VARCHAR)) AS frame_fp
FROM f
"""


# ---------------------------------------------------------------------------
# F1-F4: scan-level filter chain; G4-G6: iterative graph algorithms
# ---------------------------------------------------------------------------


def q_scan_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F4 chain, mirroring the reference's two scan paths: namespace/affix
    filters on the URI-object path (interface.py:74-110), literal
    normalization on the spec-outgoing path (interface.py:86-117)."""
    from .operators.scan_filters import (
        filter_namespace,
        filter_node_affixes,
        filter_predicates,
        normalize_literals,
    )

    li = _t(spark, sf_dir, "lineitem")
    item = F.concat(
        F.lit("http://ex/item/"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_linenumber").cast("string"),
    )
    # URI-object triples: odd suppkeys live in a foreign namespace
    uri_triples = li.select(
        item.alias("subject"),
        F.when(F.col("l_linenumber") == 1, F.lit("ex:dropme"))
        .otherwise(F.lit("ex:supplied_by"))
        .alias("predicate"),
        F.when(
            F.col("l_suppkey") % 2 == 1,
            F.concat(F.lit("http://other/sup/"), F.col("l_suppkey").cast("string")),
        )
        .otherwise(
            F.concat(F.lit("http://ex/sup/"), F.col("l_suppkey").cast("string"))
        )
        .alias("object"),
    )
    uri_out = filter_predicates(uri_triples, ["ex:dropme"], keep=False)
    uri_out = filter_namespace(uri_out, "http://ex/")
    uri_out = filter_node_affixes(uri_out, drop_prefixes=["http://ex/sup/13"])

    # literal-object triples: typed dateTime literals -> ISO day slice
    lit_triples = li.select(
        item.alias("subject"),
        F.lit("ex:shipped").alias("predicate"),
        F.concat(
            F.lit('"'), F.date_format("l_shipdate", "yyyy-MM-dd"),
            F.lit('T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>'),
        ).alias("object"),
    )
    lit_out = normalize_literals(lit_triples)
    return uri_out.unionByName(lit_out).dropDuplicates()


SCAN_FILTER_SQL = """
WITH uri_t AS (
  SELECT 'http://ex/item/' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS subject,
         CASE WHEN l_linenumber = 1 THEN 'ex:dropme' ELSE 'ex:supplied_by' END AS predicate,
         CASE WHEN l_suppkey % 2 = 1 THEN 'http://other/sup/' || CAST(l_suppkey AS VARCHAR)
              ELSE 'http://ex/sup/' || CAST(l_suppkey AS VARCHAR) END AS object
  FROM lineitem
),
lit_t AS (
  SELECT 'http://ex/item/' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS subject,
         'ex:shipped' AS predicate,
         substr('"' || strftime(l_shipdate, '%Y-%m-%d') || 'T00:00:00"', 2, 10) AS object
  FROM lineitem
)
SELECT DISTINCT subject, predicate, object FROM (
  SELECT * FROM uri_t
  WHERE predicate <> 'ex:dropme'
    AND object LIKE 'http://ex/%'
    AND object NOT LIKE 'http://ex/sup/13%'
  UNION ALL
  SELECT * FROM lit_t
)
"""


def q_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph_algos import transitive_closure

    cust = _t(spark, sf_dir, "customer")
    # binary-tree edges on custkeys: child k -> parent k/2 (depth ~log2 n)
    edges = cust.filter(F.col("c_custkey") > 0).select(
        F.col("c_custkey").alias("child"),
        F.floor(F.col("c_custkey") / 2).cast("long").alias("parent"),
    )
    return transitive_closure(edges)


TRANSITIVE_SQL = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS child, CAST(floor(c_custkey / 2) AS BIGINT) AS ancestor
  FROM customer WHERE c_custkey > 0
  UNION
  SELECT a.child, CAST(floor(a.ancestor / 2) AS BIGINT) FROM anc a WHERE a.ancestor > 0
)
SELECT child, ancestor FROM anc
"""


def q_n_hop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph_algos import n_hop_neighbors

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e1 = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("dst"),
    )
    e2 = li.select(
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    seeds = cust.filter(F.col("c_acctbal") > 9500).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
    )
    return n_hop_neighbors(edges, seeds, hops=2)


N_HOP_SQL = """
WITH seeds AS (
  SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node FROM customer WHERE c_acctbal > 9500
),
hop1 AS (
  SELECT DISTINCT 'o' || CAST(o_orderkey AS VARCHAR) AS node FROM orders
  WHERE 'c' || CAST(o_custkey AS VARCHAR) IN (SELECT node FROM seeds)
),
hop2 AS (
  SELECT DISTINCT 'p' || CAST(l_partkey AS VARCHAR) AS node FROM lineitem
  WHERE 'o' || CAST(l_orderkey AS VARCHAR) IN (SELECT node FROM hop1)
    AND 'p' || CAST(l_partkey AS VARCHAR) NOT IN (SELECT node FROM seeds)
)
SELECT node, 0 AS hop FROM seeds
UNION ALL
SELECT node, 1 FROM hop1 WHERE node NOT IN (SELECT node FROM seeds)
UNION ALL
SELECT node, 2 FROM hop2 WHERE node NOT IN (SELECT node FROM hop1)
"""


def q_pagerank_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over an order->customer->nation edge graph
    (every node has out-degree <= 1 here, but the operator handles general
    graphs); the oracle unrolls both iterations as CTEs — the same
    verification pattern as the 2-iteration search loop."""
    from .operators.graph_algos import pagerank

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    e1 = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    e2 = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    out = pagerank(e1.unionByName(e2), damping=0.85, iterations=2)
    return out.select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("long").alias("rank_x1e6"),
    )


PAGERANK_SQL = """
WITH e AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 AS r FROM nodes),
r1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r0.r / o.d) AS m
    FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
r2 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r1.r / o.d) AS m
    FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)
SELECT node, CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rank_x1e6 FROM r2
"""


def q_clustering_coef(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (operators/graph_algos
    clustering_coefficient) over the same triangle-per-customer
    customer/nation/region membership graph as the global triangle gate:
    customers close exactly one triangle (lcc = 1e6), nation/region hubs
    get graded quotients. Exact integer arithmetic end to end — the
    oracle replays orientation, single-corner enumeration, 3-corner
    credit, and the (2·t·1e6) DIV (d·(d−1)) quotient."""
    from .operators.graph_algos import clustering_coefficient

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cn = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    cr = cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"]).select(
        F.col("c_custkey").alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    nr = nat.select(
        (F.col("n_nationkey") + 1000000).alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    return clustering_coefficient(cn.unionByName(cr).unionByName(nr))


CLUSTERING_COEF_SQL = """
WITH raw AS (
  SELECT c_custkey AS s, c_nationkey + 1000000 AS t FROM customer
  UNION ALL
  SELECT c.c_custkey, n.n_regionkey + 2000000
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT n_nationkey + 1000000, n_regionkey + 2000000 FROM nation
),
e AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
  FROM raw WHERE s <> t
),
deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM e UNION ALL SELECT b FROM e
  ) GROUP BY n
),
oriented AS (
  SELECT CASE WHEN lf THEN a ELSE b END AS u,
         CASE WHEN lf THEN b ELSE a END AS v,
         CASE WHEN lf THEN db ELSE da END AS dv
  FROM (
    SELECT e.a, e.b, da.d AS da, db.d AS db,
           (da.d < db.d OR (da.d = db.d AND e.a < e.b)) AS lf
    FROM e JOIN deg da ON e.a = da.n JOIN deg db ON e.b = db.n
  )
),
wedges AS (
  SELECT w1.u, w1.v AS x, w2.v AS y
  FROM oriented w1 JOIN oriented w2 ON w1.u = w2.u
  WHERE w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v)
),
tri AS (
  SELECT w.u, w.x, w.y
  FROM wedges w JOIN oriented o ON w.x = o.u AND w.y = o.v
),
corners AS (
  SELECT n, count(*) AS t FROM (
    SELECT u AS n FROM tri UNION ALL SELECT x FROM tri
    UNION ALL SELECT y FROM tri
  ) GROUP BY n
)
SELECT deg.n AS node,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(c.t, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN deg.d >= 2
                 THEN (2 * coalesce(c.t, 0) * 1000000) // (deg.d * (deg.d - 1))
                 ELSE 0 END AS BIGINT) AS lcc_x1e6
FROM deg LEFT JOIN corners c ON deg.n = c.n
"""


def q_luby_mis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Luby MIS (operators/graph_algos.luby_mis, 2 rounds)
    over the symmetrized order<->customer<->nation graph: order leaves
    mostly decide in round 1 (their only neighbor is their customer),
    customer/nation hubs contend on md5 priority; some nodes stay
    undecided after 2 rounds — all three states realized. The oracle
    unrolls both rounds with the identical zero-padded (md5_32, node)
    priority strings."""
    from .operators.graph_algos import luby_mis

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    e1 = orders.select(
        (F.col("o_orderkey") + 2000000).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    e2 = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    e = e1.unionByName(e2)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return luby_mis(sym, rounds=2).select(
        "node", "state", F.col("decided_round").cast("long").alias("decided_round")
    )


LUBY_MIS_SQL = """
WITH e0 AS (
  SELECT o_orderkey + 2000000 AS src, o_custkey AS dst FROM orders
  UNION ALL
  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
nodes AS (
  SELECT DISTINCT node
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
u0 AS (
  SELECT node,
         printf('%010d%019d',
                CAST(concat('0x', substr(md5(CAST(node AS VARCHAR)), 1, 8))
                     AS BIGINT),
                node) AS p
  FROM nodes
),
m1 AS (
  SELECT e.dst AS node, min(u.p) AS np
  FROM e JOIN u0 u ON e.src = u.node GROUP BY e.dst
),
w1 AS (
  SELECT u.node FROM u0 u LEFT JOIN m1 ON u.node = m1.node
  WHERE m1.np IS NULL OR u.p < m1.np
),
x1 AS (
  SELECT DISTINCT e.dst AS node FROM e JOIN w1 ON e.src = w1.node
  WHERE e.dst NOT IN (SELECT node FROM w1)
),
u1 AS (
  SELECT * FROM u0
  WHERE node NOT IN (SELECT node FROM w1)
    AND node NOT IN (SELECT node FROM x1)
),
m2 AS (
  SELECT e.dst AS node, min(u.p) AS np
  FROM e JOIN u1 u ON e.src = u.node GROUP BY e.dst
),
w2 AS (
  SELECT u.node FROM u1 u LEFT JOIN m2 ON u.node = m2.node
  WHERE m2.np IS NULL OR u.p < m2.np
),
x2 AS (
  SELECT DISTINCT e.dst AS node FROM e JOIN w2 ON e.src = w2.node
  WHERE e.dst IN (SELECT node FROM u1)
    AND e.dst NOT IN (SELECT node FROM w2)
),
u2 AS (
  SELECT * FROM u1
  WHERE node NOT IN (SELECT node FROM w2)
    AND node NOT IN (SELECT node FROM x2)
)
SELECT node, 'in' AS state, CAST(1 AS BIGINT) AS decided_round FROM w1
UNION ALL
SELECT node, 'out', CAST(1 AS BIGINT) FROM x1
UNION ALL
SELECT node, 'in', CAST(2 AS BIGINT) FROM w2
UNION ALL
SELECT node, 'out', CAST(2 AS BIGINT) FROM x2
UNION ALL
SELECT node, 'undecided', CAST(0 AS BIGINT) FROM u2
"""


def q_ppr_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/graph_algos.personalized_pagerank,
    2 iterations) from seed customers c0/c1 over the SYMMETRIZED
    order<->customer<->nation graph: mass reaches the seeds' nations and
    orders in round 1, sibling customers in round 2, and the rank table
    stays sparse throughout (only the seed neighborhood, never V). The
    oracle unrolls both rounds with the same sparse full-join-on-seeds
    recurrence; ranks scaled to 1e6 like the global pagerank gates."""
    from .operators.graph_algos import personalized_pagerank

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    e1 = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    e2 = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    e = e1.unionByName(e2)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = personalized_pagerank(sym, seeds=["c0", "c1"], iterations=2)
    return out.select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("long").alias("rank_x1e6"),
    )


PPR_SEEDS_SQL = """
WITH e0 AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
seeds AS (SELECT 'c0' AS node, CAST(0.5 AS DOUBLE) AS p
          UNION ALL SELECT 'c1', CAST(0.5 AS DOUBLE)),
r0 AS (SELECT node, p AS rank FROM seeds),
c1 AS (
  SELECT e.dst AS node, sum(r.rank / o.d) AS m
  FROM e JOIN r0 r ON e.src = r.node JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
r1 AS (
  SELECT coalesce(c.node, s.node) AS node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             * coalesce(s.p, CAST(0 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(c.m, CAST(0 AS DOUBLE)) AS rank
  FROM c1 c FULL JOIN seeds s ON c.node = s.node
),
c2 AS (
  SELECT e.dst AS node, sum(r.rank / o.d) AS m
  FROM e JOIN r1 r ON e.src = r.node JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
r2 AS (
  SELECT coalesce(c.node, s.node) AS node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             * coalesce(s.p, CAST(0 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(c.m, CAST(0 AS DOUBLE)) AS rank
  FROM c2 c FULL JOIN seeds s ON c.node = s.node
)
SELECT node, CAST(floor(rank * 1000000 + 0.5) AS BIGINT) AS rank_x1e6 FROM r2
"""


def q_entity_type_discard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 standalone — entity-type discard (reference filtering.py:99-110):
    nodes typed with any of the WHERE/WHO class URIs. Type triples derive
    from customer nations; nations 1-3 play the 'place class' list."""
    from .operators.filtering import discard_by_entity_type

    cust = _t(spark, sf_dir, "customer")
    type_date = cust.select(
        F.concat(F.lit("http://ex/cust/"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("predicate"),
        F.concat(F.lit("ex:class/Nation"), F.col("c_nationkey").cast("string")).alias("object"),
    )
    return discard_by_entity_type(
        type_date, ["ex:class/Nation1", "ex:class/Nation2", "ex:class/Nation3"]
    )


ENTITY_DISCARD_SQL = """
SELECT DISTINCT 'http://ex/cust/' || CAST(c_custkey AS VARCHAR) AS node
FROM customer WHERE c_nationkey IN (1, 2, 3)
"""


def q_frame_count_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A9 analog: distinct mentions per (event, dimension)
    tx = transcripts_from_events(spark, sf_dir)
    m = extract_mentions(tx, carry_text=False)
    return m.groupBy("conv_id", "turn_idx", "dimension").agg(
        F.countDistinct("mention").alias("n_mentions")
    )


FRAME_COUNT_SQL = f"""
{TX_SQL},
m AS (
  SELECT conv_id, turn_idx, regexp_extract(text, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) AS mention,
         'when' AS dimension
  FROM tx WHERE regexp_extract(text, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) <> ''
  UNION ALL
  SELECT conv_id, turn_idx, tool, 'tool' FROM tx WHERE role = 'tool' AND tool <> ''
)
SELECT conv_id, turn_idx, dimension, count(DISTINCT mention) AS n_mentions
FROM m GROUP BY conv_id, turn_idx, dimension
"""


def q_sem_emission_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-2 generic emission (generic_kb_to_ng.py semantics) over a triple
    view derived from supplier/nation/orders + inline vocab tables."""
    from .graph.materialize import emit_sem_from_triples

    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat_triples = sup.select(
        F.concat(F.lit("http://ex/sup/"), F.col("s_suppkey").cast("string")).alias("subject"),
        F.lit("http://ex/prop/nation").alias("predicate"),
        F.concat(F.lit("http://ex/nation/"), F.col("s_nationkey").cast("string")).alias("object"),
    )
    date_triples = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("subject"),
        F.lit("http://ex/prop/startDate").alias("predicate"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("object"),
    )
    triples = nat_triples.unionByName(date_triples)

    pred_labels = spark.createDataFrame(
        [("http://ex/prop/nation", "country"), ("http://ex/prop/startDate", "start time")],
        ["predicate", "label"],
    )
    pred_domain = spark.createDataFrame(
        [], "predicate string, classes array<string>"
    )
    pred_range = spark.createDataFrame(
        [("http://ex/prop/nation", ["http://ex/class/Nation"])],
        "predicate string, classes array<string>",
    )
    superclasses = spark.createDataFrame(
        [("http://ex/class/Nation", ["http://ex/class/Country"])],
        "class string, ancestors array<string>",
    )
    return emit_sem_from_triples(
        triples, pred_labels, pred_domain, pred_range, superclasses,
        start_d="1995-01-01", end_d="2002-12-31",
    )


SEM_EMISSION_SQL = """
WITH nat AS (
  SELECT 'http://ex/sup/' || CAST(s_suppkey AS VARCHAR) AS subject,
         'http://ex/nation/' || CAST(s_nationkey AS VARCHAR) AS object
  FROM supplier
),
dts AS (
  SELECT 'http://ex/order/' || CAST(o_orderkey AS VARCHAR) AS subject,
         strftime(o_orderdate, '%Y-%m-%d') AS object
  FROM orders WHERE o_orderkey % 100 = 0
),
subjects AS (SELECT DISTINCT subject FROM (SELECT subject FROM nat UNION ALL SELECT subject FROM dts))
SELECT DISTINCT subject, predicate, object FROM (
  -- event typing for every subject (generic_kb_to_ng.py:220-221)
  SELECT subject, 'rdf:type' AS predicate, 'sem:Event' AS object FROM subjects
  UNION ALL
  -- range rule: class Nation -> superclass Country -> label 'country' -> where
  SELECT subject, 'sem:hasPlace', object FROM nat
  UNION ALL
  -- label-substring rule: label 'country' contains 'country' -> where
  SELECT subject, 'sem:hasPlace', object FROM nat
  UNION ALL
  -- temporal: begin = min in-window date, end := begin (only start labels)
  SELECT subject, 'sem:hasBeginTimeStamp', min(object) FROM dts
  WHERE object >= '1995-01-01' AND object <= '2002-12-31' GROUP BY subject
  UNION ALL
  SELECT subject, 'sem:hasEndTimeStamp', min(object) FROM dts
  WHERE object >= '1995-01-01' AND object <= '2002-12-31' GROUP BY subject
)
"""


# ---------------------------------------------------------------------------
# D1-D6: iterative candidate-event search (non-SQL-expressible: iterative
# ranking loop -> rows-only oracle check)
# ---------------------------------------------------------------------------


def q_event_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two genuine iterations of the informed search, gate-verified against
    an UNROLLED per-iteration oracle (EVENT_SEARCH_SQL documents the replay):

    iter 1 expands the seed customer: the entropy ranker restricts to the
    best priority class (ex:placed carries superclass Event via Order ->
    priority 1, ex:inNation priority 3), chooses the `placed` path, and the
    temporal filter discards orders outside the date window — the subgraph
    gains (cust, placed, order) for in-window orders.
    iter 2 expands those orders: their lineitems are typed ex:class/Line
    (ancestor Event -> admitted), so the subgraph gains
    (order, hasLine, line) rows. Reference loop: framework.py:704-857.
    """
    import tempfile

    from .operators.filtering import FilteringConfig
    from .search.driver import GraphSearch, SearchConfig

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # triple view: customer --placed--> order --hasLine--> lineitem,
    # plus rdf:type and date rows for orders and lines
    placed = orders.select(
        F.concat(F.lit("http://ex/cust/"), F.col("o_custkey").cast("string")).alias("subject"),
        F.lit("ex:placed").alias("predicate"),
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("object"),
    )
    types = orders.select(
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("subject"),
        F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("predicate"),
        F.lit("ex:class/Order").alias("object"),
    )
    dates = orders.select(
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("subject"),
        F.lit("ex:prop/date").alias("predicate"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("object"),
    )
    nat = cust.select(
        F.concat(F.lit("http://ex/cust/"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("ex:inNation").alias("predicate"),
        F.concat(F.lit("http://ex/nation/"), F.col("c_nationkey").cast("string")).alias("object"),
    )
    line_uri = F.concat(
        F.lit("http://ex/line/"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_linenumber").cast("string"),
    )
    has_line = li.select(
        F.concat(F.lit("http://ex/order/"), F.col("l_orderkey").cast("string")).alias("subject"),
        F.lit("ex:hasLine").alias("predicate"),
        line_uri.alias("object"),
    )
    line_types = li.select(
        line_uri.alias("subject"),
        F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("predicate"),
        F.lit("ex:class/Line").alias("object"),
    )
    triples = (
        placed.unionByName(types).unionByName(dates).unionByName(nat)
        .unionByName(has_line).unionByName(line_types)
    )

    pred_range = spark.createDataFrame(
        [
            ("ex:placed", ["ex:class/Order"]),
            ("ex:hasLine", ["ex:class/Line"]),
        ],
        "predicate string, classes array<string>",
    )
    superclasses = spark.createDataFrame(
        [
            ("ex:class/Order", ["ex:class/Event"]),
            ("ex:class/Line", ["ex:class/Event"]),
        ],
        "class string, ancestors array<string>",
    )
    cfg = SearchConfig(
        start="http://ex/cust/1",
        iterations=2,
        target_types=["ex:class/Event"],
        type_ranking="entropy_pred_object_freq",
        dates=("1995-01-01", "2002-12-31"),
        max_uri=500,
    )
    filt = FilteringConfig(
        point_in_time=["ex:prop/date"], start_dates=[], end_dates=[],
        places=[], people=[], dataset_type="synthetic",  # no URI-year regex
    )
    gs = GraphSearch(
        spark, triples, cfg, filt,
        pred_domain=None, pred_range=pred_range, superclasses=superclasses,
        checkpoint_dir=tempfile.mkdtemp(prefix="cg_search_"), run_id="entryq",
    )
    gs.run()
    state = gs.final_state()
    return state["subgraph"].select("subject", "predicate", "object").dropDuplicates()


# Unrolled replay of the 2-iteration informed search on the fixture above.
# iter 1: frontier={cust/1}; expansion joins find placed/inNation outgoing;
#   type+date lookup admits orders (typed Order, ancestor Event) whose date
#   lies in the window (temporal discard F5, lexical ISO compare); the
#   entropy ranker's priority restriction picks `placed` (priority 1 beats
#   inNation's 3) => subgraph += (cust/1, placed, win_order).
# iter 2: frontier = win_orders (path resolution J7, visited-pruned);
#   expansion finds hasLine outgoing; lines typed Line (ancestor Event) are
#   admitted, nothing discards them => subgraph += (order, hasLine, line).
EVENT_SEARCH_SQL = """
WITH win_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey = 1
    AND o_orderdate >= DATE '1995-01-01' AND o_orderdate <= DATE '2002-12-31'
),
iter1 AS (
  SELECT 'http://ex/cust/1' AS subject,
         'ex:placed' AS predicate,
         'http://ex/order/' || CAST(o_orderkey AS VARCHAR) AS object
  FROM win_orders
),
iter2 AS (
  SELECT 'http://ex/order/' || CAST(l.l_orderkey AS VARCHAR) AS subject,
         'ex:hasLine' AS predicate,
         'http://ex/line/' || CAST(l.l_orderkey AS VARCHAR) || '-'
           || CAST(l.l_linenumber AS VARCHAR) AS object
  FROM lineitem l JOIN win_orders w ON l.l_orderkey = w.o_orderkey
)
SELECT DISTINCT subject, predicate, object
FROM (SELECT * FROM iter1 UNION ALL SELECT * FROM iter2)
"""


def q_info_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — per-iteration diagnostics (reference src/ordering.py:110-143):
    total pending rows, rows whose predicate closure annotated a nonempty
    superclass list, rows whose superclasses hit the focus set. The fixture
    pins all three counters to DIFFERENT values: placed rows annotate to
    [Event] (relevant), inNation rows to [Place] (annotated, not relevant),
    date rows have no closure entry (counted in the total only)."""
    from .operators.ordering import annotate_superclass, build_pred_closure, info_counters

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    placed = orders.select(
        F.concat(F.lit("http://ex/cust/"), F.col("o_custkey").cast("string")).alias("subject"),
        F.lit("ex:placed").alias("predicate"),
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("object"),
    )
    nat = cust.select(
        F.concat(F.lit("http://ex/cust/"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("ex:inNation").alias("predicate"),
        F.concat(F.lit("http://ex/nation/"), F.col("c_nationkey").cast("string")).alias("object"),
    )
    dates = orders.select(
        F.concat(F.lit("http://ex/order/"), F.col("o_orderkey").cast("string")).alias("subject"),
        F.lit("ex:prop/date").alias("predicate"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("object"),
    )
    pending = placed.unionByName(nat).unionByName(dates)
    pred_range = spark.createDataFrame(
        [
            ("ex:placed", ["ex:class/Order"]),
            ("ex:inNation", ["ex:class/Nation"]),
        ],
        "predicate string, classes array<string>",
    )
    superclasses = spark.createDataFrame(
        [
            ("ex:class/Order", ["ex:class/Event"]),
            ("ex:class/Nation", ["ex:class/Place"]),
        ],
        "class string, ancestors array<string>",
    )
    closure = build_pred_closure(pred_range, superclasses)
    annotated = annotate_superclass(pending, closure)
    return info_counters(annotated, "outgoing", ["ex:class/Event"])


INFO_COUNTERS_SQL = """
SELECT
  CAST(2 * (SELECT count(*) FROM orders) + (SELECT count(*) FROM customer) AS BIGINT)
    AS outgoing,
  CAST((SELECT count(*) FROM orders) + (SELECT count(*) FROM customer) AS BIGINT)
    AS outgoing_annotated,
  CAST((SELECT count(*) FROM orders) AS BIGINT) AS outgoing_relevant
"""


def q_apply_referents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .linking.canonicalize import apply_referents

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey")
    referents = cust.select(
        F.col("c_custkey").alias("alias"),
        F.min("c_custkey").over(w).alias("canonical"),
    ).filter(F.col("alias") != F.col("canonical"))
    out = apply_referents(
        cust.select("c_custkey", "c_nationkey"), referents, "c_custkey"
    )
    return out.select(F.col("c_custkey").alias("canonical_key"), "c_nationkey")


APPLY_REFERENTS_SQL = """
SELECT min(c_custkey) OVER (PARTITION BY c_nationkey) AS canonical_key, c_nationkey
FROM customer
"""


# ---------------------------------------------------------------------------
# Temporal joins (beyond the reference's equi-joins): as-of, interval, session
# ---------------------------------------------------------------------------


def q_asof_join_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event, the most recent prior purchase by the same
    user (backward-inclusive as-of join; union+window, one shuffle)."""
    from .operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        # one row per (user, ts): ties pinned to max event_id on BOTH engines
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("p_id"))
    )
    out = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        right_cols=["p_id"],
        tie_col="p_id",
    )
    return out.select(
        "event_id",
        F.col("p_id_asof").alias("prior_purchase_id"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_asof").cast("timestamp"))
        ).alias("gap_us"),
    )


ASOF_SQL = """
WITH clicks AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, max(event_id) AS p_id
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id,
       p.p_id AS prior_purchase_id,
       date_diff('microsecond', p.ts, c.ts) AS gap_us
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_interval_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-user event pairs within 24h — the time-binned band join."""
    from .operators.temporal import interval_self_join

    ev = _t(spark, sf_dir, "events")
    return interval_self_join(
        ev, on=["user_id"], ts_col="ts", id_col="event_id", max_gap_seconds=86400
    )


INTERVAL_SQL = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
)
SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
       b.sec - a.sec AS gap_seconds
FROM e a JOIN e b
  ON a.user_id = b.user_id AND b.sec > a.sec AND b.sec <= a.sec + 86400
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (1h) per user — lag + running sum, one shuffle."""
    from .operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, on=["user_id"], ts_col="ts", tie_col="event_id", gap_seconds=3600)
    return out.select("user_id", "event_id", F.col("session_seq").cast("long").alias("session_seq"))


SESSIONIZE_SQL = """
WITH o AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec,
         ts
  FROM events
)
SELECT user_id, event_id,
  CAST(sum(CASE WHEN prev_sec IS NULL OR sec - prev_sec > 3600 THEN 1 ELSE 0 END)
    OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM o
"""


def q_allen_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allen interval relations between each user's per-event-type activity
    spans [min ts, max ts] — pure comparisons on the canonical pair order,
    so labels are engine-exact."""
    from .operators.temporal import allen_relations

    ev = _t(spark, sf_dir, "events")
    iv = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("begin"), F.max("ts").alias("end")
    )
    return allen_relations(
        iv, on=["user_id"], id_col="event_type", begin_col="begin", end_col="end"
    )


ALLEN_SQL = """
WITH iv AS (
  SELECT user_id, event_type, min(ts) AS bg, max(ts) AS en
  FROM events GROUP BY 1, 2
)
SELECT x.user_id, x.event_type AS id_a, y.event_type AS id_b,
  CASE
    WHEN x.bg = y.bg AND x.en = y.en THEN 'equals'
    WHEN x.bg = y.bg THEN 'starts'
    WHEN x.en < y.bg THEN 'before'
    WHEN x.en = y.bg THEN 'meets'
    WHEN x.en < y.en THEN 'overlaps'
    WHEN x.en = y.en THEN 'finished_by'
    ELSE 'contains'
  END AS relation
FROM iv x JOIN iv y
  ON x.user_id = y.user_id
 AND (x.bg, x.en, x.event_type) < (y.bg, y.en, y.event_type)
"""


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-round k=3 core peel of the user<->event-type bipartite graph.
    exact_rounds pins the round count so the unrolled oracle replays it
    even if the fixpoint lands earlier."""
    from .operators.graph_algos import k_core

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return k_core(edges, k=3, max_rounds=4, exact_rounds=True)


def _k_core_rounds_sql(k: int, rounds: int) -> str:
    parts = []
    for r in range(1, rounds + 1):
        parts.append(
            f"k{r} AS (SELECT src FROM e{r-1} GROUP BY src HAVING count(*) >= {k}),\n"
            f"e{r} AS (SELECT e.src, e.dst FROM e{r-1} e\n"
            f"  JOIN k{r} a ON e.src = a.src JOIN k{r} b ON e.dst = b.src)"
        )
    return ",\n".join(parts)


K_CORE_SQL = f"""
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
    FROM events
    UNION ALL
    SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) FROM events
  )
),
{_k_core_rounds_sql(3, 4)}
SELECT src AS node, count(*) AS degree FROM e4 GROUP BY src
"""


def q_neighborhood_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor / neighborhood-Jaccard link-prediction features over
    the user<->event-type bipartite graph: user pairs sharing >= 4 event
    types (and type pairs sharing >= 4 users) — the merge-candidate ranking
    primitive for entity canonicalization."""
    from .operators.graph_algos import neighborhood_overlap

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return neighborhood_overlap(edges, min_common=4)


NEIGHBORHOOD_OVERLAP_SQL = """
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
    FROM events
    UNION ALL
    SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) FROM events
  )
),
deg AS (SELECT src, count(*) AS deg FROM e0 GROUP BY src),
w AS (
  SELECT a.src AS node_a, b.src AS node_b, count(*) AS n_common
  FROM e0 a JOIN e0 b ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
  HAVING count(*) >= 4
)
SELECT w.node_a, w.node_b, w.n_common, da.deg AS deg_a, db.deg AS deg_b,
  CAST(floor(CAST(w.n_common AS DOUBLE) / (da.deg + db.deg - w.n_common)
             * 1000000 + 0.5) AS BIGINT) AS jac_x1e6
FROM w
JOIN deg da ON da.src = w.node_a
JOIN deg db ON db.src = w.node_b
"""


# ---------------------------------------------------------------------------
# IVF ANN (partition-pruned scale path) — fully oracle-replayed
# ---------------------------------------------------------------------------


def q_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (signup -> click -> purchase) per user within
    7 days: skip-till-next CEP matching as joins + earliest-pick windows."""
    from .operators.sequence import match_sequence

    ev = _t(spark, sf_dir, "events")
    return match_sequence(
        ev,
        steps=["signup", "click", "purchase"],
        on=["user_id"],
        within_seconds=604800,
    )


FUNNEL_SQL = """
WITH b AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
s0 AS (SELECT user_id, event_id AS id_0, s AS s_0 FROM b WHERE event_type = 'signup'),
m1 AS (
  SELECT s0.user_id, s0.id_0, s0.s_0, b.event_id AS id_1, b.s AS s_1
  FROM s0 JOIN b ON b.user_id = s0.user_id AND b.event_type = 'click'
   AND b.s > s0.s_0 AND b.s <= s0.s_0 + 604800
  QUALIFY row_number() OVER (PARTITION BY s0.user_id, s0.id_0
                             ORDER BY b.s, b.event_id) = 1
),
m2 AS (
  SELECT m1.user_id, m1.id_0, m1.s_0, m1.id_1, b.event_id AS id_2, b.s AS s_2
  FROM m1 JOIN b ON b.user_id = m1.user_id AND b.event_type = 'purchase'
   AND b.s > m1.s_1 AND b.s <= m1.s_0 + 604800
  QUALIFY row_number() OVER (PARTITION BY m1.user_id, m1.id_0, m1.id_1
                             ORDER BY b.s, b.event_id) = 1
)
SELECT user_id, id_0, id_1, id_2, s_2 - s_0 AS span_seconds FROM m2
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=10, n_centroids=8, n_probe=3)


IVF_SQL = """
WITH corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (
  SELECT vec_id AS cent_id, v AS cv FROM corpus
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8
),
assign AS (
  SELECT vec_id, v, cent_id AS cell FROM (
    SELECT c.vec_id, c.v, ct.cent_id,
      row_number() OVER (PARTITION BY c.vec_id ORDER BY
        list_dot_product(c.v, ct.cv)
          / (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(ct.cv, ct.cv))) DESC,
        ct.cent_id ASC) AS rn
    FROM corpus c CROSS JOIN cent ct)
  WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id < 3),
probe AS (
  SELECT query_id, qv, cent_id AS cell FROM (
    SELECT q.query_id, q.qv, ct.cent_id,
      row_number() OVER (PARTITION BY q.query_id ORDER BY
        list_dot_product(q.qv, ct.cv)
          / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(ct.cv, ct.cv))) DESC,
        ct.cent_id ASC) AS rn
    FROM q CROSS JOIN cent ct)
  WHERE rn <= 3
),
cand AS (
  SELECT p.query_id, a.vec_id,
    list_dot_product(a.v, p.qv)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(p.qv, p.qv))) AS cosine
  FROM assign a JOIN probe p ON a.cell = p.cell
)
SELECT query_id, vec_id, CAST(rn AS INT) AS rank FROM (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM cand)
WHERE rn <= 10
"""


# ---------------------------------------------------------------------------
# Portable simhash (md5-bit signature, oracle-replayed bit-for-bit) and
# n-gram Jaccard verification over LSH candidate pairs
# ---------------------------------------------------------------------------


def q_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dedup import simhash_portable

    docs = _t(spark, sf_dir, "documents")
    return simhash_portable(docs, bits=32)


_SIMHASH_BITSUMS = ",\n    ".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(32)
)
_SIMHASH_RECOMPOSE = " + ".join(
    f"CASE WHEN b{i} > 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END" for i in range(32)
)

SIMHASH_PORTABLE_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS h
  FROM toks
),
bits AS (
  SELECT doc_id,
    {_SIMHASH_BITSUMS}
  FROM h GROUP BY doc_id
)
SELECT doc_id, {_SIMHASH_RECOMPOSE} AS simhash
FROM bits
"""


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-partition simhash candidates on the portable 32-bit signature,
    restricted to the guaranteed-complete hamming <= n_blocks-1 band. The
    xxhash64 simhash64 is the bench fast path (JVM hash, not gate-replayable)."""
    from .operators.dedup import simhash_candidates, simhash_portable

    docs = _t(spark, sf_dir, "documents")
    sig = simhash_portable(docs, bits=32)
    return simhash_candidates(sig, bits=32, n_blocks=4, max_hamming=3)


SIMHASH_CANDIDATES_SQL = f"""
WITH sigs AS ({SIMHASH_PORTABLE_SQL}),
blocks AS (
  SELECT doc_id, simhash, b.blk, (simhash >> (b.blk * 8)) & 255 AS val
  FROM sigs, (SELECT unnest(range(4)) AS blk) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS s_a, b.simhash AS s_b
  FROM blocks a JOIN blocks b
    ON a.blk = b.blk AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, bit_count(xor(s_a, s_b)) AS hamming
FROM cand WHERE bit_count(xor(s_a, s_b)) <= 3
"""


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidates -> exact 1-gram Jaccard (the verification stage of
    minhash_dedup), scaled x1e6."""
    from .operators.dedup import minhash_lsh_candidates, ngram_jaccard

    docs = _t(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=1)
    scored = ngram_jaccard(docs, cands, shingle_n=1)
    return scored.select(
        "id_a",
        "id_b",
        F.floor(F.col("jaccard") * 1000000 + F.lit(0.5)).cast("long").alias("jac_x1e6"),
    )


NGRAM_JACCARD_SQL = f"""
WITH pairs AS ({MINHASH_LSH_SQL}),
sh AS (
  SELECT doc_id, list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS sh
  FROM documents
)
SELECT p.id_a, p.id_b,
  CAST(floor(
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) * 1000000 + 0.5) AS BIGINT)
    AS jac_x1e6
FROM pairs p
JOIN sh a ON a.doc_id = p.id_a
JOIN sh b ON b.doc_id = p.id_b
"""


def q_prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard>=0.8 self-join via AllPairs prefix filtering — 100%
    recall (no LSH band misses), candidates pruned to rare-shingle prefix
    collisions. The oracle is the brute-force all-pairs join, so a hash
    match proves the pruning is lossless, not just plausible."""
    from .operators.dedup import prefix_jaccard_join

    docs = _t(spark, sf_dir, "documents")
    pairs = prefix_jaccard_join(docs, threshold=0.8, shingle_n=1)
    return pairs.select(
        "id_a",
        "id_b",
        F.col("inter").alias("n_inter"),
        F.col("union").alias("n_union"),
        F.floor(F.col("jaccard") * 1000000 + F.lit(0.5)).cast("long").alias("jac_x1e6"),
    )


PREFIX_JACCARD_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS tok
  FROM documents
),
sz AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
-- brute force on purpose: no prefix filter here, so the gate proves the
-- Spark-side pruning loses nothing
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.inter AS n_inter,
  (sa.sz + sb.sz - i.inter) AS n_union,
  CAST(floor(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) * 1000000
             + 0.5) AS BIGINT) AS jac_x1e6
FROM inter i
JOIN sz sa ON sa.doc_id = i.id_a
JOIN sz sb ON sb.doc_id = i.id_b
WHERE i.inter * 1000000 >= 800000 * (sa.sz + sb.sz - i.inter)
"""


# ---------------------------------------------------------------------------
# Rollup + pivot (multi-level aggregation surface; beyond the reference's
# flat groupBys — SURVEY.md §2.4 notes it has no grouping sets)
# ---------------------------------------------------------------------------


def q_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (status, priority) -> (status) -> grand total in
    one pass — Spark expands the rollup in the partial aggregate, so the
    shuffle carries pre-combined rows per grouping set, not the input."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            # per-row scale to integer cents BEFORE the sum: exact bigint
            # arithmetic is order-independent, a double sum is not
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("total_x100"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total_x100",
        )
    )


ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n,
       -- outer CAST: DuckDB's sum(BIGINT) yields HUGEINT, whose pandas
       -- export goes through float64 and can arrive non-integral
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_x100
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority) — completes the grouping-sets
    family beside rollup: adds the (priority-only) marginal the hierarchy
    skips. The gid column is built from per-column grouping() bits
    explicitly (2*g(status)+g(priority)) so the bitmask is engine-neutral
    rather than relying on either engine's grouping_id ordering."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .alias("total_x100"),
            (
                F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")
            ).cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total_x100",
        )
    )


CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       CAST(2 * GROUPING(o_orderstatus) + GROUPING(o_orderpriority)
            AS BIGINT) AS gid,
       count(*) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_x100
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def q_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts pivoted to columns. Pivot values are pinned
    explicitly (no discovery scan; deterministic column order)."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types]
    )


PIVOT_SQL = """
SELECT user_id,
  count(*) FILTER (event_type = 'click')    AS n_click,
  count(*) FILTER (event_type = 'error')    AS n_error,
  count(*) FILTER (event_type = 'purchase') AS n_purchase,
  count(*) FILTER (event_type = 'signup')   AS n_signup,
  count(*) FILTER (event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# NG usage queries (reference experiments_run/usage_ng/sparql_queries.py):
# basic-graph-pattern self-joins over the constructed triples table
# ---------------------------------------------------------------------------


def _flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph.materialize import build_event_graph

    # Pattern-join consumers filter this graph once PER TRIPLE PATTERN; an
    # unmaterialized graph re-executes the whole construction subtree per
    # pattern (measured: 6 source scans for the 3-pattern sub-events query).
    # Materialize once executor-side. In production the constructed graph is
    # a predicate-partitioned TABLE (io/catalog.write_triples) and each
    # pattern is a partition-pruned scan of it — this is the in-session
    # stand-in for that read.
    return build_event_graph(transcripts_from_events(spark, sf_dir)).localCheckpoint(
        eager=True
    )


def q_ng_sub_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_SUB_EVENTS_OF_EVENT over the flagship graph."""
    from .graph.ng_queries import sub_events_with_times

    return sub_events_with_times(_flagship_triples(spark, sf_dir))


def q_bgp_sub_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The declarative BGP surface (graph/bgp.py) expressing
    QUERY_SUB_EVENTS_OF_EVENT — same triple patterns + OPTIONAL block the
    reference ships as SPARQL — compiled mechanically to the same join plan
    ng_queries hand-writes; oracle shared with ng_sub_events."""
    from .graph.bgp import bgp
    from .graph.ng_queries import P_BEGIN, P_END, P_SUB_EVENT_OF

    triples = _flagship_triples(spark, sf_dir)
    out = bgp(
        triples,
        patterns=[
            ("?sub_event", P_SUB_EVENT_OF, "?event"),
            ("?sub_event", P_BEGIN, "?begin"),
        ],
        optional=[[("?sub_event", P_END, "?end")]],
    )
    return out.select(
        "event", "sub_event", "begin", F.coalesce("end", "begin").alias("end")
    )


def q_ng_actor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_INFO_ACTOR over the flagship graph (reference
    sparql_queries.py QUERY_INFO_ACTOR): one actor's events with their
    OPTIONAL begin/end timestamps."""
    from .graph.ng_queries import events_of_actor

    out = events_of_actor(_flagship_triples(spark, sf_dir), "ng:actor/user")
    return out.select(
        "event",
        F.coalesce("begin", F.lit("")).alias("begin_d"),
        F.coalesce("end", F.lit("")).alias("end_d"),
    )


# user turns are turn_idx % 3 == 0 (TX_SQL role rotation); every turn text
# carries exactly one ISO date, so begin = end = that date.
NG_ACTOR_EVENTS_SQL = TX_SQL + """
SELECT 'ng:event/' || conv_id || '/' || CAST(turn_idx AS VARCHAR) AS event,
       regexp_extract(text, '(\\d{4}-\\d{2}-\\d{2})', 1) AS begin_d,
       regexp_extract(text, '(\\d{4}-\\d{2}-\\d{2})', 1) AS end_d
FROM tx WHERE turn_idx % 3 = 0
"""


NG_SUB_EVENTS_SQL = f"""
WITH g AS ({FLAGSHIP_SQL})
SELECT s.object AS event, s.subject AS sub_event, b.object AS begin,
       coalesce(e.object, b.object) AS "end"
FROM (SELECT * FROM g WHERE predicate = 'sem:subEventOf') s
JOIN (SELECT * FROM g WHERE predicate = 'sem:hasBeginTimeStamp') b
  ON b.subject = s.subject
LEFT JOIN (SELECT * FROM g WHERE predicate = 'sem:hasEndTimeStamp') e
  ON e.subject = s.subject
"""


def q_ng_events_in_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_EVENT_TYPE_TIMESTAMPED window filter over the flagship graph."""
    from .graph.ng_queries import events_in_period

    return events_in_period(_flagship_triples(spark, sf_dir), "2024-01-10", "2024-01-20")


NG_PERIOD_SQL = f"""
WITH g AS ({FLAGSHIP_SQL}),
b AS (SELECT subject AS event, object AS begin FROM g WHERE predicate = 'sem:hasBeginTimeStamp'),
e AS (SELECT subject AS event, object AS "end" FROM g WHERE predicate = 'sem:hasEndTimeStamp')
SELECT coalesce(b.event, e.event) AS event, b.begin, e."end"
FROM b FULL OUTER JOIN e ON b.event = e.event
WHERE (b.begin >= '2024-01-10' AND b.begin <= '2024-01-20')
   OR (e."end" >= '2024-01-10' AND e."end" <= '2024-01-20')
"""


def q_ng_actor_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_INTERACTION_ACTOR analog: conversations where both the user and
    a tool participate, with per-actor event counts."""
    from .graph.ng_queries import actor_interaction

    return actor_interaction(
        _flagship_triples(spark, sf_dir), "ng:actor/user", "ng:actor/tool"
    )


NG_INTERACTION_SQL = f"""
WITH g AS ({FLAGSHIP_SQL}),
tagged AS (
  SELECT a.subject AS event, a.object AS actor, u.object AS container
  FROM (SELECT * FROM g WHERE predicate = 'sem:hasActor') a
  JOIN (SELECT * FROM g WHERE predicate = 'sem:subEventOf') u
    ON u.subject = a.subject
)
SELECT s1.container, s1.n_actor1, s2.n_actor2
FROM (SELECT container, count(*) AS n_actor1 FROM tagged
      WHERE actor = 'ng:actor/user' GROUP BY container) s1
JOIN (SELECT container, count(*) AS n_actor2 FROM tagged
      WHERE actor = 'ng:actor/tool' GROUP BY container) s2
  ON s1.container = s2.container
"""


def q_triple_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — triple-level per-predicate comparison with the reference's
    SWAPPED P/R naming (sem_comparison.py:63-75: "precision" divides by
    common+gold_only, "recall" by common+constructed_only). The fixture
    pins all three count kinds nonzero across predicates: actors match on
    even event ids only (constructed_only on odd), begin timestamps match
    everywhere (pure common), places exist only in gold (pure gold_only)."""
    from .metrics import triple_set_compare
    from .vocab import NF_TO_PRED

    ev = _t(spark, sf_dir, "events")
    ev_uri = F.concat(F.lit("ng:event/"), F.col("event_id").cast("string"))
    actor = F.concat(F.lit("ng:actor/u"), F.col("user_id").cast("string"))
    bts = F.date_format("ts", "yyyy-MM-dd")
    place = F.concat(F.lit("ng:place/p"), (F.col("user_id") % 10).cast("string"))

    constructed = ev.select(
        ev_uri.alias("subject"), F.lit(NF_TO_PRED["who"]).alias("predicate"), actor.alias("object")
    ).unionByName(
        ev.select(ev_uri.alias("subject"), F.lit(NF_TO_PRED["when_bts"]).alias("predicate"), bts.alias("object"))
    )
    gold = ev.filter(F.col("event_id") % 2 == 0).select(
        ev_uri.alias("subject"), F.lit(NF_TO_PRED["who"]).alias("predicate"), actor.alias("object")
    ).unionByName(
        ev.select(ev_uri.alias("subject"), F.lit(NF_TO_PRED["when_bts"]).alias("predicate"), bts.alias("object"))
    ).unionByName(
        ev.filter(F.col("event_id") % 7 == 0).select(
            ev_uri.alias("subject"), F.lit(NF_TO_PRED["where"]).alias("predicate"), place.alias("object")
        )
    )
    common, gold_only, constructed_only = triple_set_compare(constructed, gold)

    def per_pred(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("predicate").agg(F.count("*").alias(name))

    counts = (
        per_pred(common, "common")
        .join(per_pred(gold_only, "gold_only"), "predicate", "full")
        .join(per_pred(constructed_only, "constructed_only"), "predicate", "full")
        .na.fill(0)
    )
    c, g, o = F.col("common"), F.col("gold_only"), F.col("constructed_only")
    p = F.when(c + g > 0, c / (c + g)).otherwise(F.lit(0.0))
    r = F.when(c + o > 0, c / (c + o)).otherwise(F.lit(0.0))
    return counts.select(
        "predicate", "common", "gold_only", "constructed_only",
        F.floor(p * 1000000 + F.lit(0.5)).cast("long").alias("p_x1e6"),
        F.floor(r * 1000000 + F.lit(0.5)).cast("long").alias("r_x1e6"),
    )


TRIPLE_PRF1_SQL = """
WITH n AS (
  SELECT count(*) AS n_all,
         sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS n_even,
         sum(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END) AS n_odd,
         sum(CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END) AS n_sev
  FROM events
),
counts AS (
  SELECT 'sem:hasActor' AS predicate, n_even AS common, 0 AS gold_only, n_odd AS constructed_only FROM n
  UNION ALL
  SELECT 'sem:hasBeginTimeStamp', n_all, 0, 0 FROM n
  UNION ALL
  SELECT 'sem:hasPlace', 0, n_sev, 0 FROM n
)
SELECT predicate, CAST(common AS BIGINT) AS common,
       CAST(gold_only AS BIGINT) AS gold_only,
       CAST(constructed_only AS BIGINT) AS constructed_only,
       CAST(floor(CASE WHEN common + gold_only > 0
                       THEN CAST(common AS DOUBLE) / (common + gold_only) ELSE 0 END
             * 1000000 + 0.5) AS BIGINT) AS p_x1e6,
       CAST(floor(CASE WHEN common + constructed_only > 0
                       THEN CAST(common AS DOUBLE) / (common + constructed_only) ELSE 0 END
             * 1000000 + 0.5) AS BIGINT) AS r_x1e6
FROM counts
"""


def q_gold_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EventKG-style gold-graph construction (reference
    eventkg_to_ng.py:28-170): an EventKG-shaped fixture — owl:sameAs
    aliases, reified actor relations, place/time/sub-event edges — built
    from orders/customer/lineitem, converted to the simplified-SEM gold
    graph for the gold event list (customer 1's orders) in one set-oriented
    plan. The reference runs 7 CONSTRUCT queries per event over the network."""
    from .graph.gold import build_gold_graph

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    o_node = F.concat(F.lit("ekg:o"), F.col("o_orderkey").cast("string"))
    o_kb = F.concat(F.lit("http://dbpedia/order/"), F.col("o_orderkey").cast("string"))
    c_node = F.concat(F.lit("ekg:c"), F.col("c_custkey").cast("string"))
    c_kb = F.concat(F.lit("http://dbpedia/cust/"), F.col("c_custkey").cast("string"))
    n_node = F.concat(F.lit("ekg:n"), F.col("c_nationkey").cast("string"))
    n_kb = F.concat(F.lit("http://dbpedia/nation/"), F.col("c_nationkey").cast("string"))
    l_node = F.concat(
        F.lit("ekg:l"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_linenumber").cast("string"),
    )
    l_kb = F.concat(
        F.lit("http://dbpedia/line/"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_linenumber").cast("string"),
    )

    def tr(s, p, o):
        return F.struct(s.alias("subject"), F.lit(p).alias("predicate"), o.alias("object"))

    oc = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    )
    kg_orders = oc.select(
        F.explode(
            F.array(
                tr(o_node, "owl:sameAs", o_kb),
                tr(o_node, "sem:hasPlace", n_node),
                tr(o_node, "sem:hasBeginTimeStamp", F.date_format("o_orderdate", "yyyy-MM-dd")),
                tr(F.concat(F.lit("ekg:rel"), F.col("o_orderkey").cast("string")), "rdf:type", F.lit("eventkg:Relation")),
                tr(F.concat(F.lit("ekg:rel"), F.col("o_orderkey").cast("string")), "rdf:subject", o_node),
                tr(F.concat(F.lit("ekg:rel"), F.col("o_orderkey").cast("string")), "rdf:object", c_node),
            )
        ).alias("t")
    ).select("t.subject", "t.predicate", "t.object")
    kg_cust = cust.select(
        F.explode(
            F.array(
                tr(c_node, "owl:sameAs", c_kb),
                tr(c_node, "rdf:type", F.lit("sem:Actor")),
                tr(n_node, "owl:sameAs", n_kb),
            )
        ).alias("t")
    ).select("t.subject", "t.predicate", "t.object")
    kg_lines = li.select(
        F.explode(
            F.array(
                tr(l_node, "owl:sameAs", l_kb),
                tr(
                    F.concat(F.lit("ekg:o"), F.col("l_orderkey").cast("string")),
                    "sem:hasSubEvent",
                    l_node,
                ),
            )
        ).alias("t")
    ).select("t.subject", "t.predicate", "t.object")
    # materialize the synthetic EventKG once: build_gold_graph's seven
    # templates each filter this union, and a lazy plan would re-run the
    # three explode branches per pattern (measured 87 source scans);
    # production reads a stored predicate-partitioned KG table instead
    kg = (
        kg_orders.unionByName(kg_cust).unionByName(kg_lines)
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )

    events = orders.filter(F.col("o_custkey") == 1).select(o_kb.alias("event"))
    return build_gold_graph(kg, events, filter_str="dbpedia")


GOLD_GRAPH_SQL = """
WITH ev AS (
  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS d
  FROM orders WHERE o_custkey = 1
),
nk AS (SELECT c_nationkey FROM customer WHERE c_custkey = 1)
SELECT DISTINCT subject, predicate, object FROM (
  SELECT 'http://dbpedia/order/' || CAST(o_orderkey AS VARCHAR) AS subject,
         'rdf:type' AS predicate, 'sem:Event' AS object FROM ev
  UNION ALL
  SELECT 'http://dbpedia/order/' || CAST(o_orderkey AS VARCHAR),
         'sem:hasPlace',
         'http://dbpedia/nation/' || CAST((SELECT c_nationkey FROM nk) AS VARCHAR)
  FROM ev
  UNION ALL
  SELECT 'http://dbpedia/order/' || CAST(o_orderkey AS VARCHAR),
         'sem:hasActor', 'http://dbpedia/cust/1' FROM ev
  UNION ALL
  SELECT 'http://dbpedia/order/' || CAST(o_orderkey AS VARCHAR),
         'sem:hasBeginTimeStamp', d FROM ev
  UNION ALL
  SELECT 'http://dbpedia/line/' || CAST(l.l_orderkey AS VARCHAR) || '-'
           || CAST(l.l_linenumber AS VARCHAR),
         'sem:subEventOf',
         'http://dbpedia/order/' || CAST(l.l_orderkey AS VARCHAR)
  FROM lineitem l JOIN ev ON l.l_orderkey = ev.o_orderkey
)
"""


def _frame_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transcripts -> mentions -> frame/role annotations -> frame triples."""
    from .data.transcripts import transcripts_from_events
    from .extraction.frames import annotate_frames
    from .extraction.mentions import extract_mentions
    from .graph.materialize import materialize_frame_annotations

    tx = transcripts_from_events(spark, sf_dir)
    mentions = extract_mentions(tx, carry_text=False)
    ann = annotate_frames(tx, mentions)
    # materialize once: the frame usage queries join 6-7 triple patterns
    # against this graph, which would otherwise re-run extraction +
    # annotation + emission per pattern (measured: 28 source scans);
    # production reads the stored predicate-partitioned triples table
    return materialize_frame_annotations(tx, ann).localCheckpoint(eager=True)


# Oracle replay of the deterministic frame rules over the transcripts view:
# every turn text is "event {etype} with value {v} recorded on {date}", so
# frame 0 = FRAME_TRIGGERS[etype] with lemma etype (token pos 1) and frame 1
# = Recording with lemma "recorded" (pos 5); the turn's mentions become role
# elements (when -> Time on every turn; tool -> Instrument on tool turns).
_FRAME_BASE_SQL = """
tinfo AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, 'event ([a-z]+) with', 1) AS etype,
         regexp_extract(text, '(\\d{4}-\\d{2}-\\d{2})', 1) AS d,
         tool
  FROM tx
),
frames AS (
  SELECT conv_id, turn_idx,
         CASE etype WHEN 'click' THEN 'Cause_motion'
                    WHEN 'error' THEN 'Cause_harm'
                    WHEN 'purchase' THEN 'Commerce_buy'
                    WHEN 'signup' THEN 'Becoming_a_member'
                    WHEN 'view' THEN 'Perception_active' END AS frame,
         etype AS lemma
  FROM tinfo
  UNION ALL
  SELECT conv_id, turn_idx, 'Recording', 'recorded' FROM tinfo
),
roles AS (
  SELECT conv_id, turn_idx, 'Time' AS gfe, d AS role_value,
         CAST(NULL AS VARCHAR) AS related
  FROM tinfo
  UNION ALL
  SELECT conv_id, turn_idx, 'Instrument', etype, 'ng:tool/' || etype
  FROM tinfo WHERE tool <> ''
)
"""


def q_ng_event_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_EVENT_FRAME over the constructed frame-annotation subgraph
    (reference sparql_queries.py:214): frame + lemma + mapped roles per
    event, via predicate-restricted triple-pattern self-joins."""
    from .graph.ng_queries import event_frames

    triples = _frame_graph(spark, sf_dir)
    return event_frames(triples)


NG_EVENT_FRAMES_SQL = TX_SQL + "," + _FRAME_BASE_SQL + """
SELECT 'ng:event/' || f.conv_id || '/' || CAST(f.turn_idx AS VARCHAR) AS event,
       'frame:' || f.frame AS frame,
       f.lemma,
       'gfe:' || r.gfe AS gfe,
       r.role_value
FROM frames f JOIN roles r ON f.conv_id = r.conv_id AND f.turn_idx = r.turn_idx
"""


def q_ng_causes_consequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY_INFO_CAUSES_CONSEQUENCES (reference sparql_queries.py:58):
    annotations restricted to the causal frame set, with role elements and
    their OPTIONAL linked entities (null-safe: related coalesced to '')."""
    from .graph.ng_queries import causes_consequences

    triples = _frame_graph(spark, sf_dir)
    out = causes_consequences(triples)
    return out.select(
        "event", "frame", "gfe", "role_value",
        F.coalesce("related", F.lit("")).alias("related"),
    )


NG_CAUSES_SQL = TX_SQL + "," + _FRAME_BASE_SQL + """
SELECT 'ng:event/' || f.conv_id || '/' || CAST(f.turn_idx AS VARCHAR) AS event,
       'frame:' || f.frame AS frame,
       'gfe:' || r.gfe AS gfe,
       r.role_value,
       coalesce(r.related, '') AS related
FROM frames f JOIN roles r ON f.conv_id = r.conv_id AND f.turn_idx = r.turn_idx
WHERE f.frame IN ('Causation', 'Cause_harm', 'Process_end', 'Cause_to_end')
"""


def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-dedup flow: MinHash-LSH candidates -> exact
    Jaccard >= 0.6 -> connected components -> one canonical doc per
    near-duplicate cluster. Composes the dedup and canonicalization
    subsystems exactly as a production training-data pipeline does."""
    from .linking.canonicalize import connected_components
    from .operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, threshold=0.6, num_hashes=8, bands=2, shingle_n=1)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    nodes = docs.select(F.col("doc_id").alias("node"))
    cc = connected_components(edges, all_nodes=nodes, strategy="window")
    return cc.select(F.col("node").alias("doc_id"), F.col("component").alias("cluster"))


NEAR_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs_raw AS ({MINHASH_LSH_SQL}),
sh AS (
  SELECT doc_id, list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS sh
  FROM documents
),
pairs AS (
  SELECT p.id_a, p.id_b
  FROM pairs_raw p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b
  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.6
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: docs split by id into train (<250) and
    test; flag test docs sharing >= 50% of their bigram shingles with any
    train doc, under the df<=50 stopword-shingle skew guard."""
    from .operators.dedup import cross_corpus_contamination

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") < 250)
    test = docs.filter(F.col("doc_id") >= 250)
    out = cross_corpus_contamination(
        train, test, shingle_n=2, max_train_df=50, min_score=0.5
    )
    return out.select(
        "test_id",
        "train_id",
        "n_shared",
        F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long").alias("score_x1e6"),
    )


CONTAMINATION_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, list_distinct(list_transform(
    range(0, greatest(len(t) - 2, 0) + 1),
    i -> array_to_string(t[i+1:i+2], ' '))) AS shs
  FROM toks
),
ex AS (SELECT doc_id, unnest(shs) AS sh FROM sh),
tr AS (SELECT doc_id AS train_id, sh FROM ex WHERE doc_id < 250),
rare AS (
  SELECT sh FROM tr GROUP BY sh HAVING count(DISTINCT train_id) <= 50
),
tr2 AS (SELECT * FROM tr WHERE sh IN (SELECT sh FROM rare)),
te AS (SELECT doc_id AS test_id, sh FROM ex WHERE doc_id >= 250),
shared AS (
  SELECT te.test_id, tr2.train_id, count(*) AS n_shared
  FROM te JOIN tr2 ON te.sh = tr2.sh
  GROUP BY te.test_id, tr2.train_id
),
sizes AS (SELECT doc_id AS test_id, len(shs) AS n_test FROM sh WHERE doc_id >= 250)
SELECT s.test_id, s.train_id, s.n_shared,
       CAST(floor(CAST(s.n_shared AS DOUBLE) / z.n_test * 1000000 + 0.5) AS BIGINT)
         AS score_x1e6
FROM shared s JOIN sizes z ON z.test_id = s.test_id
WHERE CAST(s.n_shared AS DOUBLE) / z.n_test >= 0.5
"""


def q_near_dup_clusters_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup-first near-dup clustering. Same parameters as
    near_dup_clusters and — provably — the same clusters (identical texts
    share signatures/buckets/scores), so the oracle IS the direct
    pipeline's recursive-CTE replay: the gate verifies the composition's
    equivalence on real data, not just a unit fixture."""
    from .operators.dedup import near_dup_clusters_exact_first

    docs = _t(spark, sf_dir, "documents")
    return near_dup_clusters_exact_first(
        docs, threshold=0.6, num_hashes=8, bands=2, shingle_n=1
    )


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the 100TB training-data flow as ONE
    query: language + length eligibility filters, near-duplicate clustering
    over the survivors via the exact-first composition (the production
    path), and one best-scoring keeper per cluster (longest, ties to min
    id). Returns (doc_id, cluster, n_members) for kept docs. The oracle
    replays the whole flow, clusters via the direct pipeline's recursive
    CTE (provably identical to exact-first)."""
    from .operators.dedup import near_dup_clusters_exact_first

    docs = _t(spark, sf_dir, "documents")
    eligible = docs.filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
    clusters = near_dup_clusters_exact_first(
        eligible, threshold=0.8, num_hashes=8, bands=2, shingle_n=1
    )
    joined = clusters.join(eligible.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster")
    wk = w.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        joined.withColumn("n_members", F.count("*").over(w))
        .withColumn("__rk", F.row_number().over(wk))
        .filter(F.col("__rk") == 1)
        .select("doc_id", "cluster", F.col("n_members").cast("long").alias("n_members"))
    )


# oracle: the near-dup-clusters recursive CTE rebased onto the eligible
# subset (string surgery keeps the two oracles literally in sync), plus the
# per-cluster keeper window
CURATION_SQL = (
    NEAR_DUP_CLUSTERS_SQL
    .replace(">= 0.6", ">= 0.8")  # tighter near-dup threshold for curation
    .replace("FROM documents", "FROM eligible")
    .replace(
        "WITH RECURSIVE",
        "WITH RECURSIVE eligible AS "
        "(SELECT * FROM documents WHERE lang = 'en' AND n_chars >= 200),",
        1,
    )
    .replace(
        "SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node",
        """, clusters AS (
  SELECT node AS doc_id, min(lbl) AS cluster FROM reach GROUP BY node
)
SELECT doc_id, cluster, n_members FROM (
  SELECT c.doc_id, c.cluster,
         CAST(count(*) OVER (PARTITION BY c.cluster) AS BIGINT) AS n_members,
         row_number() OVER (PARTITION BY c.cluster
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
  FROM clusters c JOIN eligible d ON d.doc_id = c.doc_id
) WHERE rk = 1""",
    )
)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the longest (best-scoring) duplicate."""
    from .operators.dedup import exact_dedup_keep_best

    docs = _t(spark, sf_dir, "documents")
    out = exact_dedup_keep_best(docs, score_col="n_chars")
    return out.select("doc_id", "lang", "n_chars")


DEDUP_KEEP_BEST_SQL = """
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')
           ORDER BY n_chars DESC, doc_id ASC) AS rk
  FROM documents
) WHERE rk = 1
"""


def q_np_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 analog (reference np_encoding.py): capitalized-run NP chunks with
    head + width, aggregated to (chunk, head, n_words, n_docs, n_mentions)."""
    from .operators.text import np_chunks

    docs = _t(spark, sf_dir, "documents")
    # the synthetic corpus is all-lowercase: chunk = run of words len>=4
    ch = np_chunks(docs, chunk_re=r"[a-z]{4,}(?: [a-z]{4,})*")
    return ch.groupBy("chunk", "head", "n_words").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


NP_CHUNKS_SQL = """
WITH ch AS (
  SELECT doc_id,
         unnest(regexp_extract_all(text, '([a-z]{4,}(?: [a-z]{4,})*)', 1)) AS chunk
  FROM documents
)
SELECT chunk,
       string_split(chunk, ' ')[-1] AS head,
       CAST(len(string_split(chunk, ' ')) AS INT) AS n_words,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_mentions
FROM ch GROUP BY 1, 2, 3
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: k docs per language, picked by
    md5(doc_id) order (the engine's seeded-sample surrogate, O3 semantics —
    reproducible on any engine/partitioning, unlike sample()/sampleBy()).
    The training-data use: balanced per-class subsets at corpus scale."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


STRATIFIED_SQL = """
SELECT lang, doc_id, CAST(rk AS INT) AS rk FROM (
  SELECT lang, doc_id,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
) WHERE rk <= 20
"""


def q_sql_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point (S2's `spark.sql` surface): the same
    Catalyst plan as the DataFrame API, written as SQL over temp views —
    broadcast the two dims, integer-cents revenue."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n, c) */ n.n_name AS nation,
               count(*) AS n_orders,
               sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_x100
        FROM v_orders o
        JOIN v_customer c ON o.o_custkey = c.c_custkey
        JOIN v_nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )


SQL_REVENUE_SQL = """
SELECT n.n_name AS nation, count(*) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_x100
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-payload JSON parsing (SURVEY.md §2.8: the transcript graft's
    `from_json(props)` surface): schema-typed parse — not get_json_object
    string probing — then a plain aggregate; the parse inlines into
    whole-stage codegen."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).cast("long").alias("sum_k"),
        F.count(F.when(F.col("p.k").isNotNull(), 1)).alias("n_with_k"),
    )


PROPS_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       count(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 END) AS n_with_k
FROM events GROUP BY event_type
"""


def q_quantiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both compute lower + frac·(upper−lower) at
    position (n−1)·q — verified bit-identical). The production path at 100TB
    swaps in `percentile_approx` (t-digest) — exact percentile sorts each
    group; the query contract pins the exact variant for verifiability."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.floor(F.expr("percentile(value, 0.5)") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("p50_x1e6"),
        F.floor(F.expr("percentile(value, 0.9)") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("p90_x1e6"),
    )


QUANTILES_SQL = """
SELECT event_type,
  CAST(floor(quantile_cont(value, 0.5) * 1000000 + 0.5) AS BIGINT) AS p50_x1e6,
  CAST(floor(quantile_cont(value, 0.9) * 1000000 + 0.5) AS BIGINT) AS p90_x1e6
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# HLL sketch (portable md5 registers — oracle replays the estimate exactly)
# ---------------------------------------------------------------------------


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketches import hll_distinct

    ev = _t(spark, sf_dir, "events")
    return hll_distinct(ev, "user_id")


HLL_SQL = """
WITH h AS (
  SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM events
),
r AS (
  SELECT h & 63 AS bucket,
    CASE WHEN (h >> 6) = 0 THEN 27
         ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
  FROM h
),
regs AS (SELECT bucket, max(rho) AS rho FROM r GROUP BY bucket)
SELECT CAST(floor(0.709 * 64 * 64
         / (sum(pow(2.0, -rho)) + (64 - count(*)) * 1.0) + 0.5) AS BIGINT) AS estimate
FROM regs
"""


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (portable md5 rows — oracle replays the
# estimates, including collision overestimates, exactly)
# ---------------------------------------------------------------------------


def q_cms_heavy_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent word-bigrams of the documents corpus via a Count-Min sketch
    (depth 4 × width 256): vocabulary heavy-hitter discovery, the sketch the
    reference's exact counters (SURVEY.md §2.4) would become at 100 TB.

    ~960 distinct bigrams over 256 counters per row force real collisions, so
    the output is the sketch's one-sided estimate (never under, sometimes
    over) — the oracle replays the identical integer estimates."""
    from .operators.sketches import cms_heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i - 1), F.element_at(toks, i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # materialize the bigram table once: the sketch build AND the candidate
    # distinct() both consume it, and a lazy plan re-runs the tokenize+explode
    # per branch (the minhash-bands re-execution family); repartition first —
    # the docs parquet is one input split, which would serialize the explode
    # (measured 6.7s -> 1.0s at sf0.1 together)
    grams = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(bigrams).alias("bigram"))
        .localCheckpoint(eager=True)
    )
    out = cms_heavy_hitters(grams, "bigram", threshold=100, depth=4, width=256)
    return out.select("bigram", F.col("est").cast("long").alias("est_count"))


CMS_HEAVY_SQL = """
WITH toks AS (
  SELECT list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT unnest(list_transform(range(2, len(ts) + 1),
                               i -> ts[i-1] || ' ' || ts[i])) AS bigram
  FROM toks WHERE len(ts) >= 2
),
fanned AS (SELECT bigram, unnest(range(0, 4)) AS d FROM grams),
sk AS (
  SELECT d,
    CAST(concat('0x', substr(md5(CAST(d AS VARCHAR) || ':' || bigram), 1, 8))
         AS BIGINT) % 256 AS bucket,
    count(*) AS cnt
  FROM fanned GROUP BY 1, 2
),
cand AS (SELECT DISTINCT bigram FROM grams),
probes AS (
  SELECT bigram, d,
    CAST(concat('0x', substr(md5(CAST(d AS VARCHAR) || ':' || bigram), 1, 8))
         AS BIGINT) % 256 AS bucket
  FROM (SELECT bigram, unnest(range(0, 4)) AS d FROM cand)
),
est AS (
  SELECT p.bigram, min(sk.cnt) AS est
  FROM probes p JOIN sk ON p.d = sk.d AND p.bucket = sk.bucket
  GROUP BY p.bigram
)
SELECT bigram, CAST(est AS BIGINT) AS est_count FROM est WHERE est >= 100
"""


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles (operators/sketches.py
    hist_table/hist_quantiles): events.value binned into 64 counters over
    [0, 500), then p25/p50/p90/p99 interpolated from the cumulative bins.
    Error bounded by one bin width; the oracle replays bins, ranks, and
    interpolation exactly."""
    from .operators.sketches import hist_quantiles, hist_table

    ev = _t(spark, sf_dir, "events")
    h = hist_table(ev, "value", lo=0.0, hi=500.0, n_bins=64)
    return hist_quantiles(
        h, [250000, 500000, 900000, 990000], lo=0.0, hi=500.0, n_bins=64
    )


HIST_QUANTILES_SQL = """
WITH h AS (
  SELECT greatest(0, least(63, CAST(floor((value - 0.0) / 7.8125) AS BIGINT))) AS bin,
         count(*) AS cnt
  FROM events GROUP BY 1
),
c AS (
  SELECT bin, cnt,
         sum(cnt) OVER (ORDER BY bin) AS cum,
         sum(cnt) OVER (ORDER BY bin) - cnt AS cum_before
  FROM h
),
t AS (SELECT unnest([250000, 500000, 900000, 990000]) AS q_x1e6),
tr AS (
  SELECT q_x1e6,
         greatest(1, CAST(ceil(q_x1e6 / 1000000.0 * (SELECT sum(cnt) FROM h)) AS BIGINT)) AS r
  FROM t
),
cov AS (
  SELECT tr.q_x1e6, tr.r, min(c.bin) AS bin
  FROM tr JOIN c ON c.cum >= tr.r GROUP BY 1, 2
),
j AS (
  SELECT cov.q_x1e6, cov.r, cov.bin, c.cnt, c.cum_before
  FROM cov JOIN c USING (bin)
)
SELECT q_x1e6,
       CAST(floor((0.0 + 7.8125 * (bin + (r - cum_before) / CAST(cnt AS DOUBLE))) * 1000000 + 0.5) AS BIGINT) AS est_x1e6
FROM j
"""


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values (io/catalog.py zorder_value) of (user_id, event_id)
    per event — the bit-interleaved sort key behind Catalog.write_zordered's
    multi-column data-skipping layout. Pure shift/mask integer expression;
    the oracle replays the interleave bit-for-bit."""
    from .io.catalog import zorder_value

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        zorder_value(F.col("user_id"), F.col("event_id"), bits=16).alias("zval"),
    )


ZORDER_SQL = """
SELECT event_id, CAST(list_sum(list_transform(range(0, 16), j ->
  ((((user_id % 65536) >> j) & 1) << (2*j))
  + ((((event_id % 65536) >> j) & 1) << (2*j + 1))
)) AS BIGINT) AS zval
FROM events
"""


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count (operators/graph_algos.py triangle_count,
    degree-ordered node-iterator++) over the customer/nation/region
    membership graph: edges customer-nation, customer-region, nation-region
    close one triangle per customer, and the nation/region hubs (degree ~
    customers/25 vs 2) are exactly the skew the orientation neutralizes —
    wedges generate at the degree-2 customers, not the hubs."""
    from .operators.graph_algos import triangle_count

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cn = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    cr = (
        cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("c_custkey").alias("src"),
            (F.col("n_regionkey") + 2000000).alias("dst"),
        )
    )
    nr = nat.select(
        (F.col("n_nationkey") + 1000000).alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    edges = cn.unionByName(cr).unionByName(nr)
    return triangle_count(edges)


TRIANGLE_SQL = """
WITH raw AS (
  SELECT c_custkey AS s, c_nationkey + 1000000 AS t FROM customer
  UNION ALL
  SELECT c_custkey, n_regionkey + 2000000
  FROM customer JOIN nation ON n_nationkey = c_nationkey
  UNION ALL
  SELECT n_nationkey + 1000000, n_regionkey + 2000000 FROM nation
),
e AS (
  SELECT DISTINCT least(s, t) AS u, greatest(s, t) AS v FROM raw WHERE s <> t
)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e ab
JOIN e ac ON ac.u = ab.u AND ac.v > ab.v
JOIN e bc ON bc.u = ab.v AND bc.v = ac.v
"""


def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): train 8 sub-space
    codebooks (k=16, 2 Lloyd rounds, deterministic init + 1e-6 centroid
    snapping), encode the corpus to 8 code ids (map-only), then ADC top-5
    for 3 queries with integer-millionth sub-distances (order-free BIGINT
    sum). The oracle unrolls training, encoding, and ADC exactly."""
    from .operators.pq import pq_topk, train_pq_codebooks

    emb = _t(spark, sf_dir, "embeddings")
    cbs = train_pq_codebooks(emb, m=8, k=16, iterations=2)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = pq_topk(emb, qs, cbs, k=5)
    return out.select(
        "query_id",
        "vec_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("dist_x1e6").cast("long").alias("dist_x1e6"),
    )


PQ_ADC_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
subs AS (
  SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv
  FROM emb CROSS JOIN (SELECT unnest(range(0, 8)) AS s)
),
c0 AS (
  SELECT s, CAST(rn - 1 AS INTEGER) AS cid, sv FROM (
    SELECT s, sv, row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
    FROM subs
  ) WHERE rn <= 16
),
a1 AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, c.cid AS code,
      row_number() OVER (PARTITION BY sub.vec_id, sub.s
        ORDER BY list_sum(list_transform(list_zip(sub.sv, c.sv), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
    FROM subs sub JOIN c0 c ON c.s = sub.s
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.s, a.code, d.i, floor(avg(sub.sv[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a1 a JOIN subs sub ON sub.vec_id = a.vec_id AND sub.s = a.s
  CROSS JOIN (SELECT unnest(range(1, 9)) AS i) d
  GROUP BY a.s, a.code, d.i
),
c1 AS (SELECT s, CAST(code AS INTEGER) AS cid, list(x ORDER BY i) AS sv FROM u1 GROUP BY s, code),
a2 AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, c.cid AS code,
      row_number() OVER (PARTITION BY sub.vec_id, sub.s
        ORDER BY list_sum(list_transform(list_zip(sub.sv, c.sv), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
    FROM subs sub JOIN c1 c ON c.s = sub.s
  ) WHERE rn = 1
),
u2 AS (
  SELECT a.s, a.code, d.i, floor(avg(sub.sv[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a2 a JOIN subs sub ON sub.vec_id = a.vec_id AND sub.s = a.s
  CROSS JOIN (SELECT unnest(range(1, 9)) AS i) d
  GROUP BY a.s, a.code, d.i
),
c2 AS (SELECT s, CAST(code AS INTEGER) AS cid, list(x ORDER BY i) AS sv FROM u2 GROUP BY s, code),
a3 AS (
  SELECT vec_id, s, code FROM (
    SELECT sub.vec_id, sub.s, c.cid AS code,
      row_number() OVER (PARTITION BY sub.vec_id, sub.s
        ORDER BY list_sum(list_transform(list_zip(sub.sv, c.sv), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid) AS rn
    FROM subs sub JOIN c2 c ON c.s = sub.s
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3),
scores AS (
  SELECT q.query_id, a3.vec_id,
    CAST(sum(floor(list_sum(list_transform(
      list_zip(q.qv[a3.s*8+1 : a3.s*8+8], cc.sv),
      x -> (x[1]-x[2])*(x[1]-x[2]))) * 1000000 + 0.5)) AS BIGINT) AS dist_x1e6
  FROM q CROSS JOIN a3
  JOIN c2 cc ON cc.s = a3.s AND cc.cid = a3.code
  GROUP BY q.query_id, a3.vec_id
)
SELECT query_id, vec_id, CAST(rk AS INT) AS rank, dist_x1e6 FROM (
  SELECT query_id, vec_id, dist_x1e6,
         row_number() OVER (PARTITION BY query_id ORDER BY dist_x1e6, vec_id) AS rk
  FROM scores
) WHERE rk <= 5
"""


def q_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication map (operators/dedup.py
    repeated_ngram_spans): maximal token spans covered by word 4-grams that
    recur in >= 2 documents — the distributable n-gram form of
    exact-substring dedup (clip the span, keep the document). One gram
    shuffle + a per-doc island-merge window; all-integer output."""
    from .operators.dedup import repeated_ngram_spans

    docs = _t(spark, sf_dir, "documents")
    out = repeated_ngram_spans(docs, n=4, min_docs=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("n_grams_in_span").cast("long").alias("n_grams_in_span"),
    )


REPEATED_NGRAM_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, (u).pos AS pos, (u).gram AS gram
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 4 + 2),
             i -> struct_pack(pos := i, gram := array_to_string(t[i:i+3], ' ')))) AS u
    FROM toks WHERE len(t) >= 4
  )
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g WHERE g.gram IN (SELECT gram FROM dup)),
lagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos, 1, -1000000000) OVER (PARTITION BY doc_id ORDER BY pos) > 4
              THEN 1 ELSE 0 END AS nf
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(nf) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
  FROM lagged
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 3 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams_in_span
FROM isl GROUP BY doc_id, g
"""


def q_span_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring dedup rewrite (operators/dedup.py
    remove_repeated_spans, 3-grams): every 3-gram shared by >= 2 docs
    survives only in its min-doc_id owner; other occurrences lose their
    covered tokens, and the cleaned text is reassembled in order. The
    oracle replays ownership, coverage expansion, and reassembly."""
    from .operators.dedup import remove_repeated_spans

    out = remove_repeated_spans(
        _t(spark, sf_dir, "documents"), n=3, min_docs=2
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_tokens", "n_dropped", "clean_text"
    )


SPAN_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS t
  FROM documents
),
base AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
grams AS (
  SELECT doc_id, (u).pos AS pos, (u).gram AS gram
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 3 + 2),
             i -> struct_pack(pos := i, gram := array_to_string(t[i:i+2], ' ')))) AS u
    FROM base WHERE len(t) >= 3
  )
),
own AS (
  SELECT gram, min(doc_id) AS owner FROM grams
  GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, pos FROM (
    SELECT g.doc_id, unnest(range(g.pos, g.pos + 3)) AS pos
    FROM grams g JOIN own o ON g.gram = o.gram
    WHERE g.doc_id <> o.owner
  )
),
tokrows AS (
  SELECT doc_id, (u).pos AS pos, (u).tok AS tok
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
             i -> struct_pack(pos := i, tok := t[i]))) AS u
    FROM base
  )
),
kept AS (
  SELECT tr.doc_id, tr.pos, tr.tok
  FROM tokrows tr LEFT JOIN cov c ON tr.doc_id = c.doc_id AND tr.pos = c.pos
  WHERE c.pos IS NULL
),
re AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.t) AS BIGINT) AS n_tokens,
       CAST(len(b.t) - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped,
       coalesce(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN re r ON b.doc_id = r.doc_id
"""


def q_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup profile (operators/dedup.py
    cdc_chunks/cdc_dedup_stats, trigger mod 8): chunk boundaries anchor
    to token-hash triggers, so local edits move one chunk, not every
    shingle; per doc, how many chunks (and tokens) recur verbatim
    anywhere in the corpus. The oracle replays tokenization, boundary
    flags, running-sum segmentation, and both aggregations."""
    from .operators.dedup import cdc_dedup_stats

    out = cdc_dedup_stats(_t(spark, sf_dir, "documents"), trigger_mod=8)
    return out.select(
        F.col("id").alias("doc_id"), "n_chunks", "n_dup_chunks", "dup_tokens"
    )


CDC_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           x -> x <> '') AS t
  FROM documents
),
tokrows AS (
  SELECT doc_id, (u).pos AS pos, (u).tok AS tok
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) + 1),
             i -> struct_pack(pos := i - 1, tok := t[i]))) AS u
    FROM toks WHERE len(t) > 0
  )
),
flagged AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos > 0
                   AND (CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT)
                        % 8) = 0
              THEN 1 ELSE 0 END AS b
  FROM tokrows
),
chunks AS (
  SELECT doc_id, chunk_idx, count(*) AS n_tokens,
         string_agg(tok, ' ' ORDER BY pos) AS chunk_text
  FROM (
    SELECT doc_id, pos, tok,
           sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS chunk_idx
    FROM flagged
  )
  GROUP BY doc_id, chunk_idx
),
gc AS (SELECT chunk_text, count(*) AS n_inst FROM chunks GROUP BY chunk_text)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN g.n_inst >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(sum(CASE WHEN g.n_inst >= 2 THEN c.n_tokens ELSE 0 END) AS BIGINT)
         AS dup_tokens
FROM chunks c JOIN gc g USING (chunk_text)
GROUP BY c.doc_id
"""


def q_domain_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain reweighting (operators/sampling.py
    domain_mix_sample): keep all of the curated sources (src0-4), half of
    the mid tier (src5-9), 10% of everything else — membership a pure
    md5(seed:doc_id) function, so the mix is stable under repartitioning
    and replayable by the oracle row-for-row. Map-only, zero shuffles."""
    from .operators.sampling import domain_mix_sample

    docs = _t(spark, sf_dir, "documents")
    rates = {f"src{i}": 1000000 for i in range(5)}
    rates.update({f"src{i}": 500000 for i in range(5, 10)})
    out = domain_mix_sample(
        docs, "source", rates, key="doc_id", default_rate_x1e6=100000
    )
    return out.select("doc_id", "source")


DOMAIN_MIX_SQL = """
SELECT doc_id, source FROM documents
WHERE CAST(concat('0x', substr(md5('23:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 1000000
      < CASE
          WHEN source IN ('src0','src1','src2','src3','src4') THEN 1000000
          WHEN source IN ('src5','src6','src7','src8','src9') THEN 500000
          ELSE 100000
        END
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-split sequence packing (operators/packing.py
    pack_sequences): documents ordered by md5(doc_id) lie end-to-end in one
    token stream, split into 512-token training chunks; each doc reports
    the chunk span it occupies and its offset in the first chunk. The
    prefix sum is two-phase (range partition + per-partition offsets), and
    the oracle replays the identical global cumsum in windowed SQL."""
    from .operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    out = pack_sequences(toks, "doc_id", "n_tok", budget=512)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "cum_before",
        "first_chunk",
        "last_chunk",
        "chunk_offset",
    )


PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ok
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (ORDER BY ok) AS BIGINT) AS cum_end
  FROM t
)
SELECT doc_id, n_tokens,
       cum_end - n_tokens AS cum_before,
       CAST(floor((cum_end - n_tokens) / 512.0) AS BIGINT) AS first_chunk,
       CAST(floor(greatest(cum_end - 1, cum_end - n_tokens) / 512.0) AS BIGINT)
         AS last_chunk,
       (cum_end - n_tokens) % 512 AS chunk_offset
FROM c
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.py scrub_pii): every document gets a
    deterministic synthetic email, IPv4, and phone string appended (the
    corpus itself is word soup — the wiring makes the regexes fire on every
    row), then the map-only native-regex scrub counts and redacts them.
    The oracle replays the identical RE2/Java-portable patterns and
    fingerprints the scrubbed text."""
    from .operators.text import scrub_pii

    docs = _t(spark, sf_dir, "documents")
    wired = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.org or 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" tel +1 555 01"),
            ((F.col("doc_id") % 90) + 10).cast("string"),
            F.lit("2345"),
        ).alias("text"),
    )
    out = scrub_pii(wired, "text")
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone", F.md5("scrubbed").alias("fp")
    )


SCRUB_PII_SQL = r"""
WITH wired AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@mail.example.org or 10.0.'
              || CAST(doc_id % 256 AS VARCHAR) || '.'
              || CAST((doc_id * 7) % 256 AS VARCHAR)
              || ' tel +1 555 01' || CAST((doc_id % 90) + 10 AS VARCHAR)
              || '2345' AS t
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
  CAST(len(regexp_extract_all(t, '\+?\d[\d()\- ]{7,}\d')) AS BIGINT) AS n_phone,
  md5(regexp_replace(regexp_replace(regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        '\+?\d[\d()\- ]{7,}\d', '<PHONE>', 'g')) AS fp
FROM wired
"""


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level MinHash overlap (operators/sketches.py corpus_overlap):
    one 16-component vocabulary signature per source, pairwise component
    agreement as the Jaccard estimate. The oracle rebuilds the same salted
    md5 minima and the same pair counts."""
    from .operators.sketches import corpus_overlap

    return corpus_overlap(_t(spark, sf_dir, "documents"), n_hashes=16)


CORPUS_OVERLAP_SQL = """
WITH words AS (
  SELECT source AS grp,
         unnest(list_filter(string_split(lower(text), ' '), t -> t <> '')) AS w
  FROM documents
),
fanned AS (
  SELECT grp, s, min(md5('s' || CAST(s AS VARCHAR) || '|' || w)) AS h
  FROM (SELECT grp, w, unnest(range(0, 16)) AS s FROM words)
  GROUP BY 1, 2
)
SELECT a.grp AS source_a, b.grp AS source_b,
  CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
  CAST(floor(1000000.0 * sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) / 16
             + 0.5) AS BIGINT) AS jaccard_est_x1e6
FROM fanned a JOIN fanned b ON a.s = b.s AND a.grp < b.grp
GROUP BY 1, 2
"""


def q_hll_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type approximate distinct users (operators/sketches.py
    hll_registers_by/hll_estimate_by): one grouped register aggregation,
    ≤ 64 rows of reduce-side state per type regardless of skew. The oracle
    replays hash, registers, and the power-of-two estimator bit-for-bit
    per group."""
    from .operators.sketches import hll_estimate_by, hll_registers_by

    ev = _t(spark, sf_dir, "events")
    out = hll_estimate_by(hll_registers_by(ev, "event_type", "user_id"))
    return out.select(F.col("grp").alias("event_type"), "estimate")


HLL_BY_TYPE_SQL = """
WITH h AS (
  SELECT event_type,
    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
      AS h
  FROM events
),
r AS (
  SELECT event_type, h & 63 AS bucket,
    CASE WHEN (h >> 6) = 0 THEN 27
         ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
  FROM h
),
regs AS (
  SELECT event_type, bucket, max(rho) AS rho FROM r GROUP BY 1, 2
),
agg AS (
  SELECT event_type,
         0.709 * 64 * 64
           / (sum(pow(2.0, -rho)) + (64 - count(*)) * 1.0) AS raw,
         64 - count(*) AS v
  FROM regs GROUP BY event_type
)
SELECT event_type,
  CAST(CASE WHEN raw <= 160.0 AND v > 0
            THEN floor(64.0 * ln(64.0 / v) + 0.5)
            ELSE floor(raw + 0.5) END AS BIGINT) AS estimate
FROM agg
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunking (operators/text.py chunk_documents):
    64-token windows every 32 tokens per document, map-only explode of
    stride offsets. The oracle rebuilds the same windows and fingerprints
    the joined chunk text."""
    from .operators.text import chunk_documents

    out = chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=64, stride=32
    )
    return out.select(
        F.col("id").alias("doc_id"),
        "chunk_idx",
        "start_tok",
        "n_tok",
        F.md5("chunk_text").alias("fp"),
    )


CHUNK_DOCS_SQL = """
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
starts AS (
  SELECT doc_id, ts, unnest(range(0, len(ts), 32)) AS s
  FROM base WHERE len(ts) > 0
)
SELECT doc_id,
       CAST(s // 32 AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS start_tok,
       CAST(least(64, len(ts) - s) AS BIGINT) AS n_tok,
       md5(array_to_string(list_slice(ts, s + 1, s + 64), ' ')) AS fp
FROM starts
"""


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-level boilerplate removal (operators/text.py
    boilerplate_removal): 2-token lines, a line is boilerplate when it
    occurs in >= max(2, ceil(n_docs/32)) distinct documents (1/32 is
    exact in binary, so both engines compute the identical threshold).
    The oracle replays segmentation, the doc-frequency pass, and ordered
    reassembly of the kept lines."""
    from .operators.text import boilerplate_removal

    out = boilerplate_removal(
        _t(spark, sf_dir, "documents"),
        line_tokens=2,
        max_doc_frac=0.03125,
        min_docs=2,
    )
    return out.select(
        F.col("id").alias("doc_id"), "n_lines", "n_dropped", "clean_text"
    )


BOILERPLATE_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS w
  FROM documents
),
nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
lines AS (
  SELECT doc_id, CAST(s // 2 AS BIGINT) AS line_idx,
         array_to_string(list_slice(w, s + 1, s + 2), ' ') AS line
  FROM (SELECT doc_id, w, unnest(range(0, len(w), 2)) AS s
        FROM toks WHERE len(w) > 0)
),
boiler AS (
  SELECT line FROM lines GROUP BY line
  HAVING count(DISTINCT doc_id)
         >= greatest(2, CAST(ceil(0.03125 * (SELECT n_docs FROM nd)) AS BIGINT))
)
SELECT l.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN b.line IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       coalesce(
         string_agg(CASE WHEN b.line IS NULL THEN l.line END, ' '
                    ORDER BY l.line_idx),
         '') AS clean_text
FROM lines l LEFT JOIN boiler b ON l.line = b.line
GROUP BY l.doc_id
"""


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (operators/graph_algos
    label_propagation, 2 rounds) over the customer-nation membership graph:
    nation hubs are the skewed high-degree side. Round 1 gives every
    customer its hub's id and every hub its smallest customer key (all-tie
    vote); round 2 settles customers on that smallest key and hubs back on
    their own id. The oracle unrolls both rounds with the same
    most-frequent-then-smallest tie-break."""
    from .operators.graph_algos import label_propagation

    cust = _t(spark, sf_dir, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    return label_propagation(edges, iterations=2)


LABEL_PROP_SQL = """
WITH e AS (
  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
nodes AS (SELECT DISTINCT src AS node FROM sym),
l0 AS (SELECT node, node AS label FROM nodes),
v1 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l0 l ON s.src = l.node GROUP BY 1, 2
),
p1 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v1) WHERE rn = 1
),
l1 AS (
  SELECT n.node, coalesce(p.label, n.node) AS label
  FROM nodes n LEFT JOIN p1 p USING (node)
),
v2 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l1 l ON s.src = l.node GROUP BY 1, 2
),
p2 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v2) WHERE rn = 1
)
SELECT n.node, coalesce(p.label, n.node) AS label
FROM nodes n LEFT JOIN p2 p USING (node)
"""


def q_hyperball(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function (operators/graph_algos.hyperball,
    2 rounds) over the symmetrized customer-nation membership graph: each
    customer's 2-hop ball covers its whole nation community (~n/25 nodes
    at any sf — squarely in HLL's linear-counting band), each nation hub
    saturates at 1 hop. Emits per-node ball-size estimates b0/b1/b2 plus
    an integer harmonic-centrality proxy Σ_t max(b_t - b_{t-1}, 0)·1e6
    DIV t (deltas clamped: the raw->linear estimator switch is not
    strictly monotone). The oracle replays registers, propagation, and
    both estimator branches bit-for-bit."""
    from .operators.graph_algos import hyperball

    cust = _t(spark, sf_dir, "customer")
    e = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    est = hyperball(sym, rounds=2)
    wide = est.groupBy("node").agg(
        F.max(F.when(F.col("t") == 0, F.col("estimate"))).alias("b0"),
        F.max(F.when(F.col("t") == 1, F.col("estimate"))).alias("b1"),
        F.max(F.when(F.col("t") == 2, F.col("estimate"))).alias("b2"),
    )
    return wide.select(
        "node",
        "b0",
        "b1",
        "b2",
        (
            F.greatest(F.col("b1") - F.col("b0"), F.lit(0)) * 1000000
            + F.expr(
                "(greatest(b2 - b1, CAST(0 AS BIGINT)) * 1000000) DIV 2"
            )
        ).cast("long").alias("harmonic_x1e6"),
    )


HYPERBALL_SQL = """
WITH e AS (
  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
nodes AS (SELECT DISTINCT src AS node FROM sym),
h AS (
  SELECT node,
    CAST(concat('0x', substr(md5(CAST(node AS VARCHAR)), 1, 8)) AS BIGINT)
      AS h
  FROM nodes
),
regs0 AS (
  SELECT node, h & 63 AS bucket,
    CASE WHEN (h >> 6) = 0 THEN 27
         ELSE bit_count(((h >> 6) & -(h >> 6)) - 1) + 1 END AS rho
  FROM h
),
regs1 AS (
  SELECT node, bucket, max(rho) AS rho FROM (
    SELECT node, bucket, rho FROM regs0
    UNION ALL
    SELECT s.src AS node, r.bucket, r.rho
    FROM sym s JOIN regs0 r ON s.dst = r.node
  ) GROUP BY 1, 2
),
regs2 AS (
  SELECT node, bucket, max(rho) AS rho FROM (
    SELECT node, bucket, rho FROM regs1
    UNION ALL
    SELECT s.src AS node, r.bucket, r.rho
    FROM sym s JOIN regs1 r ON s.dst = r.node
  ) GROUP BY 1, 2
),
agg0 AS (
  SELECT node,
         0.709 * 64 * 64
           / (sum(pow(2.0, -rho)) + (64 - count(*)) * 1.0) AS raw,
         64 - count(*) AS v
  FROM regs0 GROUP BY node
),
agg1 AS (
  SELECT node,
         0.709 * 64 * 64
           / (sum(pow(2.0, -rho)) + (64 - count(*)) * 1.0) AS raw,
         64 - count(*) AS v
  FROM regs1 GROUP BY node
),
agg2 AS (
  SELECT node,
         0.709 * 64 * 64
           / (sum(pow(2.0, -rho)) + (64 - count(*)) * 1.0) AS raw,
         64 - count(*) AS v
  FROM regs2 GROUP BY node
),
est0 AS (
  SELECT node, CAST(CASE WHEN raw <= 160.0 AND v > 0
            THEN floor(64.0 * ln(64.0 / v) + 0.5)
            ELSE floor(raw + 0.5) END AS BIGINT) AS b0
  FROM agg0
),
est1 AS (
  SELECT node, CAST(CASE WHEN raw <= 160.0 AND v > 0
            THEN floor(64.0 * ln(64.0 / v) + 0.5)
            ELSE floor(raw + 0.5) END AS BIGINT) AS b1
  FROM agg1
),
est2 AS (
  SELECT node, CAST(CASE WHEN raw <= 160.0 AND v > 0
            THEN floor(64.0 * ln(64.0 / v) + 0.5)
            ELSE floor(raw + 0.5) END AS BIGINT) AS b2
  FROM agg2
)
SELECT node, b0, b1, b2,
  CAST(greatest(b1 - b0, 0) * 1000000
       + (greatest(b2 - b1, 0) * 1000000) // 2 AS BIGINT) AS harmonic_x1e6
FROM est0 JOIN est1 USING (node) JOIN est2 USING (node)
"""


def q_bfs_landmarks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark BFS distances (operators/graph_algos.bfs_distances, 3
    rounds) over the symmetrized customer->nation->region membership
    chain from landmark customers 0 and 1: own nation at 1, region at 2,
    sibling nations at 3 — all four distance values realized. The oracle
    unrolls three min-propagation rounds (provably equal to the frontier
    formulation for unweighted BFS: first discovery = final distance)."""
    from .operators.graph_algos import bfs_distances

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    cn = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    nr = nat.select(
        (F.col("n_nationkey") + 1000000).alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    e = cn.unionByName(nr)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return bfs_distances(sym, landmarks=[0, 1], rounds=3).select(
        "node", "landmark", F.col("dist").cast("long").alias("dist")
    )


BFS_LANDMARKS_SQL = """
WITH cn AS (
  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
),
nr AS (
  SELECT n_nationkey + 1000000 AS src, n_regionkey + 2000000 AS dst
  FROM nation
),
e AS (SELECT * FROM cn UNION ALL SELECT * FROM nr),
sym AS (SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e),
d0 AS (
  SELECT 0 AS node, 0 AS landmark, 0 AS dist
  UNION ALL SELECT 1, 1, 0
),
d1 AS (
  SELECT node, landmark, min(dist) AS dist FROM (
    SELECT node, landmark, dist FROM d0
    UNION ALL
    SELECT s.dst AS node, d.landmark, d.dist + 1
    FROM sym s JOIN d0 d ON s.src = d.node
  ) GROUP BY 1, 2
),
d2 AS (
  SELECT node, landmark, min(dist) AS dist FROM (
    SELECT node, landmark, dist FROM d1
    UNION ALL
    SELECT s.dst AS node, d.landmark, d.dist + 1
    FROM sym s JOIN d1 d ON s.src = d.node
  ) GROUP BY 1, 2
),
d3 AS (
  SELECT node, landmark, min(dist) AS dist FROM (
    SELECT node, landmark, dist FROM d2
    UNION ALL
    SELECT s.dst AS node, d.landmark, d.dist + 1
    FROM sym s JOIN d2 d ON s.src = d.node
  ) GROUP BY 1, 2
)
SELECT node, landmark, CAST(dist AS BIGINT) AS dist FROM d3
"""


def q_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss edge peeling (operators/graph_algos.k_truss, k=3, one
    exact peel round) over the triangle-per-customer c-n-r graph plus
    order->customer chaff edges: the chaff sits in zero triangles and is
    peeled in round 1; every membership edge survives with its support
    recomputed on the survivor set. The oracle replays the oriented
    support pass twice (peel + final readout)."""
    from .operators.graph_algos import k_truss

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    cn = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    cr = cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"]).select(
        F.col("c_custkey").alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    nr = nat.select(
        (F.col("n_nationkey") + 1000000).alias("src"),
        (F.col("n_regionkey") + 2000000).alias("dst"),
    )
    oc = orders.select(
        (F.col("o_orderkey") + 3000000).alias("src"),
        F.col("o_custkey").alias("dst"),
    )
    e = cn.unionByName(cr).unionByName(nr).unionByName(oc)
    return k_truss(e, k=3, max_rounds=1, exact_rounds=True)


def _truss_support_sql(src: str, p: str) -> str:
    """One oriented triangle-support pass as SQL CTEs: {p}sup(a,b,support)
    over canonical edge table `src` — the same pipeline the Spark
    _edge_support runs, templated so the peel oracle can apply it twice."""
    return f"""{p}deg AS (
  SELECT n, count(*) AS d FROM (
    SELECT a AS n FROM {src} UNION ALL SELECT b FROM {src}
  ) GROUP BY n
),
{p}o AS (
  SELECT CASE WHEN lf THEN a ELSE b END AS u,
         CASE WHEN lf THEN b ELSE a END AS v,
         CASE WHEN lf THEN db ELSE da END AS dv
  FROM (
    SELECT e.a, e.b, da.d AS da, db.d AS db,
           (da.d < db.d OR (da.d = db.d AND e.a < e.b)) AS lf
    FROM {src} e JOIN {p}deg da ON e.a = da.n JOIN {p}deg db ON e.b = db.n
  )
),
{p}tri AS (
  SELECT w1.u, w1.v AS x, w2.v AS y
  FROM {p}o w1 JOIN {p}o w2 ON w1.u = w2.u
  WHERE (w1.dv < w2.dv OR (w1.dv = w2.dv AND w1.v < w2.v))
    AND EXISTS (SELECT 1 FROM {p}o o WHERE o.u = w1.v AND o.v = w2.v)
),
{p}credit AS (
  SELECT a, b, count(*) AS support FROM (
    SELECT least(u, x) AS a, greatest(u, x) AS b FROM {p}tri
    UNION ALL SELECT least(u, y), greatest(u, y) FROM {p}tri
    UNION ALL SELECT least(x, y), greatest(x, y) FROM {p}tri
  ) GROUP BY a, b
),
{p}sup AS (
  SELECT e.a, e.b, CAST(coalesce(c.support, 0) AS BIGINT) AS support
  FROM {src} e LEFT JOIN {p}credit c ON e.a = c.a AND e.b = c.b
)"""


KTRUSS_SQL = f"""
WITH raw AS (
  SELECT c_custkey AS s, c_nationkey + 1000000 AS t FROM customer
  UNION ALL
  SELECT c.c_custkey, n.n_regionkey + 2000000
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  UNION ALL
  SELECT n_nationkey + 1000000, n_regionkey + 2000000 FROM nation
  UNION ALL
  SELECT o_orderkey + 3000000, o_custkey FROM orders
),
e0 AS (
  SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
  FROM raw WHERE s <> t
),
{_truss_support_sql("e0", "s0")},
e1 AS (SELECT a, b FROM s0sup WHERE support >= 1),
{_truss_support_sql("e1", "s1")}
SELECT a, b, support FROM s1sup
"""


def q_neighborhood_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph neighborhood function + effective-diameter certificate from
    hyperball (the ANF use Boldi & Vigna built HyperBall for): N(t) =
    Σ_v |B(v,t)| summed over the same per-node HLL estimates the
    hyperball_balls gate pins, plus reach_frac_x1e6 = N(t)·1e6 DIV N(2)
    — the effective diameter is the first t whose fraction clears 90%.
    Pure integer aggregation over the register estimates; the oracle
    replays the full register pipeline then the same sums."""
    from .operators.graph_algos import hyperball

    cust = _t(spark, sf_dir, "customer")
    e = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    est = hyperball(sym, rounds=2)
    nf = est.groupBy("t").agg(F.sum("estimate").alias("n_reach"))
    total = nf.agg(F.max(F.when(F.col("t") == 2, F.col("n_reach"))).alias("nt"))
    return nf.crossJoin(total).select(
        F.col("t").cast("long").alias("t"),
        F.col("n_reach").cast("long").alias("n_reach"),
        F.expr("(n_reach * 1000000) DIV nt").cast("long").alias("reach_frac_x1e6"),
    )


NEIGHBORHOOD_FN_SQL = (
    HYPERBALL_SQL.replace(
        """SELECT node, b0, b1, b2,
  CAST(greatest(b1 - b0, 0) * 1000000
       + (greatest(b2 - b1, 0) * 1000000) // 2 AS BIGINT) AS harmonic_x1e6
FROM est0 JOIN est1 USING (node) JOIN est2 USING (node)""",
        """, nf AS (
  SELECT 0 AS t, CAST(sum(b0) AS BIGINT) AS n_reach FROM est0
  UNION ALL
  SELECT 1, CAST(sum(b1) AS BIGINT) FROM est1
  UNION ALL
  SELECT 2, CAST(sum(b2) AS BIGINT) FROM est2
)
SELECT CAST(t AS BIGINT) AS t, n_reach,
       CAST((n_reach * 1000000) // (SELECT n_reach FROM nf WHERE t = 2)
            AS BIGINT) AS reach_frac_x1e6
FROM nf""",
    )
)


def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics (operators/text.py
    repetition_metrics): per-doc fraction of characters covered by the top
    word bigram and by duplicated word trigrams, as x1e6 integers. The
    oracle rebuilds the same grams, the same deterministic tie-break, and
    the same count x length coverage definition."""
    from .operators.text import repetition_metrics

    return repetition_metrics(_t(spark, sf_dir, "documents"))


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, length(text) AS n_chars,
         list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
bi AS (
  SELECT doc_id,
         unnest(list_transform(range(2, len(ts) + 1),
                               i -> ts[i-1] || ' ' || ts[i])) AS g
  FROM base WHERE len(ts) >= 2
),
bic AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY 1, 2),
bitop AS (
  SELECT doc_id, c * length(g) AS top_chars
  FROM (SELECT doc_id, g, c,
               row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g DESC)
                 AS rn
        FROM bic)
  WHERE rn = 1
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(3, len(ts) + 1),
                               i -> ts[i-2] || ' ' || ts[i-1] || ' ' || ts[i]))
           AS g
  FROM base WHERE len(ts) >= 3
),
tric AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY 1, 2),
tridup AS (
  SELECT doc_id,
         sum(CASE WHEN c > 1 THEN c * length(g) ELSE 0 END) AS dup_chars
  FROM tric GROUP BY 1
)
SELECT b.doc_id,
  CAST(floor(1000000.0 * coalesce(top_chars, 0) / b.n_chars + 0.5) AS BIGINT)
    AS top_bigram_frac_x1e6,
  CAST(floor(1000000.0 * coalesce(dup_chars, 0) / b.n_chars + 0.5) AS BIGINT)
    AS dup_trigram_frac_x1e6
FROM base b LEFT JOIN bitop USING (doc_id) LEFT JOIN tridup USING (doc_id)
"""


def q_curation_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule curation flow: repetition metrics (operators/text.py
    repetition_metrics) gate out boilerplate-heavy docs (top-bigram <
    0.12, duplicated-trigram < 0.15 character coverage), a minimum-length
    rule keeps docs >= 20 tokens, and the survivors pass a deterministic
    50% hash_rate_sample — the composition a curation job runs, every
    stage keyed and replayable. Returns (doc_id, source)."""
    from .operators.sampling import hash_rate_sample
    from .operators.text import repetition_metrics

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit("")
            )
        ).alias("n_tok"),
    )
    kept = toks.join(repetition_metrics(docs), "doc_id").filter(
        (F.col("top_bigram_frac_x1e6") < 120000)
        & (F.col("dup_trigram_frac_x1e6") < 150000)
        & (F.col("n_tok") >= 20)
    )
    return hash_rate_sample(kept, 500000, key="doc_id").select("doc_id", "source")


CURATION_GOPHER_SQL = (
    """
WITH rep AS ("""
    + REPETITION_SQL
    + """),
toks AS (
  SELECT doc_id, source,
         len(list_filter(string_split(lower(text), ' '), t -> t <> ''))
           AS n_tok
  FROM documents
)
SELECT t.doc_id, t.source
FROM toks t JOIN rep USING (doc_id)
WHERE rep.top_bigram_frac_x1e6 < 120000
  AND rep.dup_trigram_frac_x1e6 < 150000
  AND t.n_tok >= 20
  AND CAST(concat('0x', substr(md5('23:' || CAST(t.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 1000000 < 500000
"""
)


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-pass (operators/sketches.py
    bloom_build/bloom_maybe_contains): eval docs (doc_id % 10 == 0) set an
    m=65536-bit filter over their word bigrams; every training doc then
    counts how many of its bigrams the filter CANNOT rule out. n_maybe is
    one-sided: a bigram truly shared with the eval set always counts, plus
    the filter's replayable false positives; n_grams − n_maybe bigrams are
    PROVEN eval-free with no shuffle of the training corpus (the filter
    broadcasts — the shape that beats a shingle equi-join at 100 TB)."""
    from .operators.sketches import bloom_build, bloom_maybe_contains

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != F.lit(""))
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(toks)),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i - 1), F.element_at(toks, i)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # one materialization feeds THREE consumers (eval build, train side,
    # candidate distinct) — and the single-split docs parquet would otherwise
    # serialize the explode (same fix as cms_heavy_tokens)
    grams = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    ev = grams.filter(F.col("doc_id") % 10 == 0).select("bigram")
    train = grams.filter(F.col("doc_id") % 10 != 0)
    bloom = bloom_build(ev, "bigram", m_bits=65536, k_hashes=3)
    maybe = bloom_maybe_contains(
        bloom, train.select("bigram").distinct(), "bigram", m_bits=65536, k_hashes=3
    )
    return (
        train.join(maybe, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("maybe").cast("long").alias("n_maybe"),
        )
        .select("doc_id", F.col("n_grams").cast("long").alias("n_grams"), "n_maybe")
    )


BLOOM_DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(2, len(ts) + 1),
                               i -> ts[i-1] || ' ' || ts[i])) AS bigram
  FROM toks WHERE len(ts) >= 2
),
ev AS (SELECT DISTINCT bigram FROM grams WHERE doc_id % 10 = 0),
bits AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || bigram), 1, 8))
         AS BIGINT) % 65536 AS bit
  FROM (SELECT bigram, unnest(range(0, 3)) AS j FROM ev)
),
cand AS (SELECT DISTINCT bigram FROM grams WHERE doc_id % 10 <> 0),
probes AS (
  SELECT bigram, j,
    CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || bigram), 1, 8))
         AS BIGINT) % 65536 AS bit
  FROM (SELECT bigram, unnest(range(0, 3)) AS j FROM cand)
),
maybe AS (
  SELECT bigram, CASE WHEN count(b.bit) = 3 THEN 1 ELSE 0 END AS maybe
  FROM probes p LEFT JOIN bits b USING (bit)
  GROUP BY bigram
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(m.maybe) AS BIGINT) AS n_maybe
FROM grams g JOIN maybe m USING (bigram)
WHERE g.doc_id % 10 <> 0
GROUP BY g.doc_id
"""


def q_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank with dangling-mass redistribution, 2 iterations, over the
    same order->customer->nation edge graph as `pagerank_2iter`. Nation
    nodes are sinks, so the dangling share is nonzero every round; total
    rank is conserved at N. The oracle unrolls both iterations with the
    per-round sink-mass CTE."""
    from .operators.graph_algos import pagerank

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    e1 = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    e2 = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    out = pagerank(e1.unionByName(e2), damping=0.85, iterations=2, dangling=True)
    return out.select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("long").alias("rank_x1e6"),
    )


PAGERANK_DANGLING_SQL = """
WITH e AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
cnt AS (SELECT count(*) AS n FROM nodes),
outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 AS r FROM nodes),
d0 AS (
  SELECT coalesce(sum(r), 0) / (SELECT n FROM cnt) AS share
  FROM r0 WHERE node NOT IN (SELECT src FROM e)
),
r1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE)
             * (coalesce(s.m, CAST(0 AS DOUBLE)) + (SELECT share FROM d0)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r0.r / o.d) AS m
    FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
d1 AS (
  SELECT coalesce(sum(r), 0) / (SELECT n FROM cnt) AS share
  FROM r1 WHERE node NOT IN (SELECT src FROM e)
),
r2 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE)
             * (coalesce(s.m, CAST(0 AS DOUBLE)) + (SELECT share FROM d1)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r1.r / o.d) AS m
    FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)
SELECT node, CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rank_x1e6 FROM r2
"""


_WD_E = "http://www.wikidata.org/entity/"
_RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"


def q_tool_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stuck-agent tool-loop detection (operators/dialogue.py
    tool_loop_runs, min_len=3) over the transcript view: maximal runs of
    identical consecutive tool calls per conversation. The oracle
    replays the tool-subsequence island windows."""
    from .operators.dialogue import tool_loop_runs

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


def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (operators/text.py textrank_keywords): window-2
    co-occurrence edges over the whole documents corpus, 2 PageRank
    iterations, top-20 tokens ordered by the SCALED rank (so tie order
    is engine-stable). The oracle rebuilds the edge set and unrolls both
    rank rounds with the hardened double constants."""
    from .operators.text import textrank_keywords

    return textrank_keywords(_t(spark, sf_dir, "documents"), top_k=20)


TEXTRANK_SQL = r"""
WITH toks AS (
  SELECT list_filter(
           string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '),
           x -> x <> '') AS w
  FROM documents
),
pairs AS (
  SELECT w[i] AS src, w[i + 1] AS dst
  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks WHERE len(w) >= 2)
  WHERE w[i] <> w[i + 1]
),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
  )
),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS r FROM nodes),
r1 AS (
  SELECT n.node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r0.r / o.d) AS m
    FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
r2 AS (
  SELECT n.node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r1.r / o.d) AS m
    FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
scaled AS (
  SELECT node AS token,
         CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rank_x1e6
  FROM r2
)
SELECT token, rank_x1e6,
       CAST(row_number() OVER (ORDER BY rank_x1e6 DESC, token ASC) AS BIGINT)
         AS rnk
FROM scaled
ORDER BY rank_x1e6 DESC, token ASC
LIMIT 20
"""


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 compaction / temporal fact scoping (operators/temporal.py
    scd2_compact): per (user, event_type), the bucketed value stream
    collapses to validity intervals — one row per maximal equal-value
    run, half-open, current run open-ended. The oracle replays the
    change-point lag, the island sum, and the lead."""
    from .operators.temporal import scd2_compact

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") / 25).cast("long").alias("v"),
    )
    out = scd2_compact(
        ev, keys=["user_id", "event_type"], value_col="v", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        "event_type",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("from_str"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("to_str"),
        "n_obs",
    )


SCD2_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(floor(value / 25) AS BIGINT) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(v) OVER w IS NOT DISTINCT FROM v THEN 0 ELSE 1 END
              AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, event_type, island, min(v) AS value,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_obs
  FROM isl GROUP BY user_id, event_type, island
)
SELECT user_id, event_type, value,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS from_str,
       coalesce(strftime(lead(valid_from) OVER (PARTITION BY user_id,
                  event_type ORDER BY valid_from), '%Y-%m-%d %H:%M:%S'),
                '') AS to_str,
       n_obs
FROM runs
"""


def q_blocked_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked ER scoring (linking/blocking.py blocked_match_scores):
    match customers against a deterministically perturbed copy of
    themselves (every 3rd account balance shifted, ids offset) through
    two blocking keys — (nation, segment) and (segment, balance-band) —
    with integer agreement weights on name/segment/balance-cents;
    min_score 10 keeps pairs whose name agrees. The oracle replays the
    block union, pair dedup, and weight sum."""
    from .linking.blocking import blocked_match_scores

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    pert = base.select(
        (F.col("id") + 1000000).alias("id"),
        "name",
        "nation",
        "segment",
        F.when(F.col("id") % 3 == 0, F.col("cents") + 10000)
        .otherwise(F.col("cents"))
        .alias("cents"),
    ).withColumn("band", F.expr("cents DIV 100000"))
    base = base.withColumn("band", F.expr("cents DIV 100000"))
    return blocked_match_scores(
        base,
        pert,
        id_col="id",
        blocks=[["nation", "segment"], ["segment", "band"]],
        agreements=[("name", 10), ("segment", 2), ("cents", 3)],
        min_score=10,
    )


BLOCKED_ER_SQL = """
WITH base AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
         c_mktsegment AS segment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
ba AS (SELECT *, cents // 100000 AS band FROM base),
bb AS (
  SELECT id + 1000000 AS id, name, nation, segment,
         CASE WHEN id % 3 = 0 THEN cents + 10000 ELSE cents END AS cents
  FROM base
),
bb2 AS (SELECT *, cents // 100000 AS band FROM bb),
cands AS (
  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
         a.name AS a_name, b.name AS b_name,
         a.segment AS a_segment, b.segment AS b_segment,
         a.cents AS a_cents, b.cents AS b_cents
  FROM ba a JOIN bb2 b
    ON (a.nation = b.nation AND a.segment = b.segment)
  UNION
  SELECT DISTINCT a.id, b.id, a.name, b.name, a.segment, b.segment,
         a.cents, b.cents
  FROM ba a JOIN bb2 b
    ON (a.segment = b.segment AND a.band = b.band)
)
SELECT a_id, b_id,
       CAST(CASE WHEN a_name = b_name THEN 10 ELSE 0 END
            + CASE WHEN a_segment = b_segment THEN 2 ELSE 0 END
            + CASE WHEN a_cents = b_cents THEN 3 ELSE 0 END AS BIGINT) AS score
FROM (SELECT DISTINCT a_id, b_id, a_name, b_name, a_segment, b_segment,
             a_cents, b_cents FROM cands)
WHERE CASE WHEN a_name = b_name THEN 10 ELSE 0 END
      + CASE WHEN a_segment = b_segment THEN 2 ELSE 0 END
      + CASE WHEN a_cents = b_cents THEN 3 ELSE 0 END >= 10
"""


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (operators/
    sampling.py priority_sample): 50 documents weighted by n_chars, the
    k smallest integer-quotient priorities win. The oracle replays the
    hash, the quotient, and the (priority, key) order."""
    from .operators.sampling import priority_sample

    out = priority_sample(
        _t(spark, sf_dir, "documents"), weight_col="n_chars", k=50
    )
    return out.select("doc_id", F.col("n_chars").cast("long").alias("w"), "priority")


PRIORITY_SAMPLE_SQL = """
WITH pri AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         (CAST(concat('0x', substr(md5('23:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) * 1000000) // CAST(n_chars AS BIGINT) AS priority
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, w, priority FROM pri ORDER BY priority, doc_id LIMIT 50
"""


def q_priority_sample_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted quota (operators/sampling.py
    priority_sample_per_group): 5 documents per source, weighted by
    n_chars, hash-stable. The oracle replays the quotient and the
    per-group rank."""
    from .operators.sampling import priority_sample_per_group

    out = priority_sample_per_group(
        _t(spark, sf_dir, "documents"), group_col="source",
        weight_col="n_chars", k=5,
    )
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("w"),
        "priority", "rnk",
    )


PRIORITY_GROUP_SQL = """
WITH pri AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS w,
         (CAST(concat('0x', substr(md5('23:' || CAST(doc_id AS VARCHAR)), 1, 8))
               AS BIGINT) * 1000000) // CAST(n_chars AS BIGINT) AS priority
  FROM documents WHERE n_chars > 0
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
              ORDER BY priority, doc_id) AS BIGINT) AS rnk
  FROM pri
)
SELECT doc_id, source, w, priority, rnk FROM ranked WHERE rnk <= 5
"""


def q_rdfs_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFS-lite forward chaining (graph/rdfs.py rdfs_materialize, 2
    exact rounds) over order-derived instance triples and an interacting
    schema: p0 edges become p1 edges (rdfs7) in round 1, original p1
    edges type their endpoints (rdfs2/3) in round 1 and climb one
    subclass level (rdfs9) in round 2, derived p1 edges type in round 2
    — every rule and the round interaction land in the gate. The oracle
    unrolls both union-distinct rounds."""
    from .graph.rdfs import rdfs_materialize

    orders = _t(spark, sf_dir, "orders")
    data = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("subject"),
        F.concat(F.lit("p"), (F.col("o_orderkey") % 2).cast("string")).alias(
            "predicate"
        ),
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("object"),
    )
    schema = spark.createDataFrame(
        [
            ("p0", "rdfs:subPropertyOf", "p1"),
            ("p1", "rdfs:domain", "C1"),
            ("p1", "rdfs:range", "C2"),
            ("C1", "rdfs:subClassOf", "C0"),
            ("C0", "rdfs:subClassOf", "CT"),
        ],
        "subject string, predicate string, object string",
    )
    return rdfs_materialize(data, schema, max_rounds=2, exact_rounds=True)


_RDFS_ROUND_SQL = """
SELECT DISTINCT subject, predicate, object FROM (
  SELECT subject, predicate, object FROM {src}
  UNION ALL
  SELECT subject, 'p1', object FROM {src} WHERE predicate = 'p0'
  UNION ALL
  SELECT subject, 'rdf:type', 'C1' FROM {src} WHERE predicate = 'p1'
  UNION ALL
  SELECT object, 'rdf:type', 'C2' FROM {src} WHERE predicate = 'p1'
  UNION ALL
  SELECT subject, 'rdf:type',
         CASE object WHEN 'C1' THEN 'C0' ELSE 'CT' END
  FROM {src}
  WHERE predicate = 'rdf:type' AND object IN ('C1', 'C0')
)"""

RDFS_CLOSURE_SQL = f"""
WITH t0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS subject,
         'p' || CAST(o_orderkey % 2 AS VARCHAR) AS predicate,
         'o' || CAST(o_orderkey AS VARCHAR) AS object
  FROM orders
),
t1 AS ({_RDFS_ROUND_SQL.format(src="t0")}),
t2 AS ({_RDFS_ROUND_SQL.format(src="t1")})
SELECT subject, predicate, object FROM t2
"""


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS inner-product join-cardinality estimate (operators/sketches.py
    cms_join_size_estimate) for the lineitem self-equi-join on l_partkey
    — a genuinely multi-multi key — next to the exact size (Σ cnt(k)²)
    so the one-sided guarantee is visible in the gate row: est >= true,
    both exact integers. The oracle replays both sketches bucket-for-
    bucket and the exact count."""
    from .operators.sketches import cms_join_size_estimate

    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    est = cms_join_size_estimate(li, li, "l_partkey", depth=4, width=256)
    true = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("true_join_rows"))
    )
    return est.crossJoin(true).select(
        "est_join_rows",
        "true_join_rows",
        (F.col("est_join_rows") >= F.col("true_join_rows")).alias("never_under"),
    )


JOIN_SIZE_EST_SQL = """
WITH items AS (SELECT l_partkey AS item FROM lineitem),
fanned AS (
  SELECT d, CAST(concat('0x', substr(md5(CAST(d AS VARCHAR) || ':'
              || CAST(item AS VARCHAR)), 1, 8)) AS BIGINT) % 256 AS bucket
  FROM items, unnest([0, 1, 2, 3]) AS t(d)
),
cms AS (SELECT d, bucket, count(*) AS cnt FROM fanned GROUP BY d, bucket),
ip AS (
  SELECT a.d, sum(a.cnt * b.cnt) AS ip
  FROM cms a JOIN cms b ON a.d = b.d AND a.bucket = b.bucket
  GROUP BY a.d
),
est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_rows FROM ip),
tru AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS true_join_rows
  FROM (SELECT count(*) AS c FROM items GROUP BY item)
)
SELECT est_join_rows, true_join_rows,
       est_join_rows >= true_join_rows AS never_under
FROM est, tru
"""


def q_domain_range_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared domain/range extraction (graph/constraints.py
    extract_domain_range; reference src/extract_domain_range.py:92-101
    get_pred + 63-90 pre_process_yago): rdfs:domain/range triples
    synthesized from customers, with every 5th domain value a YAGO
    blank-node union template that must expand to one row per member
    with short prefixes rewritten. The oracle replays the filter, the
    template split, and the prefix map."""
    from .graph.constraints import extract_domain_range

    cust = _t(spark, sf_dir, "customer")
    p = F.concat(F.lit(_WD_E + "P"), F.col("c_custkey").cast("string"))
    dom_val = F.when(
        F.col("c_custkey") % 5 == 0,
        F.lit("_:p-rdfs-domain-owl-unionOf-schema-Thing-xsd-string"),
    ).otherwise(F.concat(F.lit("D"), F.col("c_nationkey").cast("string")))
    t = (
        cust.select(
            p.alias("subject"),
            F.lit(_RDFS_NS + "domain").alias("predicate"),
            dom_val.alias("object"),
        )
        .unionByName(
            cust.select(
                p.alias("subject"),
                F.lit(_RDFS_NS + "range").alias("predicate"),
                F.concat(F.lit("R"), F.col("c_nationkey").cast("string")).alias(
                    "object"
                ),
            )
        )
        .unionByName(
            cust.select(  # chaff the predicate filter must drop
                p.alias("subject"),
                F.lit(_RDFS_NS + "label").alias("predicate"),
                F.col("c_name").alias("object"),
            )
        )
    )
    return extract_domain_range(
        t,
        _RDFS_NS + "domain",
        _RDFS_NS + "range",
        expand_yago_unions=True,
    )


DOMAIN_RANGE_SQL = """
WITH cust AS (
  SELECT 'http://www.wikidata.org/entity/P' || CAST(c_custkey AS VARCHAR)
           AS pred,
         c_custkey AS ck, c_nationkey AS nk
  FROM customer
),
base AS (
  SELECT pred, 'domain' AS kind,
         CASE WHEN ck % 5 = 0
              THEN '_:p-rdfs-domain-owl-unionOf-schema-Thing-xsd-string'
              ELSE 'D' || CAST(nk AS VARCHAR) END AS value
  FROM cust
  UNION ALL
  SELECT pred, 'range', 'R' || CAST(nk AS VARCHAR) FROM cust
),
expanded AS (
  SELECT pred, kind,
         CASE WHEN NOT starts_with(value, '_:') THEN value
              ELSE (CASE l[2*i+1]
                      WHEN 'schema' THEN 'http://schema.org/'
                      WHEN 'xsd' THEN 'http://www.w3.org/2001/XMLSchema#'
                      ELSE l[2*i+1] END) || l[2*i+2]
              END AS value
  FROM (
    SELECT pred, kind, value,
           string_split(string_split(value, 'owl-unionOf-')[2], '-') AS l,
           unnest(range(0, CASE WHEN starts_with(value, '_:')
                                THEN CAST(floor(len(string_split(
                                       string_split(value, 'owl-unionOf-')[2],
                                       '-')) / 2) AS INT)
                                ELSE 1 END)) AS i
    FROM base
  )
)
SELECT DISTINCT pred, kind, value FROM expanded
"""


def q_constraint_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wikidata property-constraint walk (graph/constraints.py
    extract_constraint_classes; reference src/extract_domain_range.py:
    103-134 get_type_wikidata): even-nation predicates carry the domain
    constraint Q-id, customers supply the P2302 statements and the P2308
    class qualifiers — the reference's per-predicate/per-statement HDT
    request loops become two hash joins. The oracle replays the walk."""
    from .graph.constraints import extract_constraint_classes
    from .profiles import WIKIDATA

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    pred_of = lambda c: F.concat(F.lit(_WD_E + "P"), F.col(c).cast("string"))  # noqa: E731
    t_direct = nat.select(
        pred_of("n_nationkey").alias("subject"),
        F.lit("http://www.wikidata.org/prop/direct/P2302").alias("predicate"),
        F.when(
            F.col("n_nationkey") % 2 == 0, F.lit(_WD_E + "Q21503250")
        ).otherwise(F.lit(_WD_E + "Q21510865")).alias("object"),
    )
    t_prop = cust.select(
        pred_of("c_nationkey").alias("subject"),
        F.lit("http://www.wikidata.org/prop/P2302").alias("predicate"),
        F.concat(F.lit("S"), F.col("c_custkey").cast("string")).alias("object"),
    )
    t_qual = cust.select(
        F.concat(F.lit("S"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("http://www.wikidata.org/prop/qualifier/P2308").alias("predicate"),
        F.concat(F.lit("C"), (F.col("c_custkey") % 7).cast("string")).alias(
            "object"
        ),
    )
    return extract_constraint_classes(
        t_direct.unionByName(t_prop).unionByName(t_qual),
        constraint_kind_obj=WIKIDATA.domain_pred,
        constraint_direct="http://www.wikidata.org/prop/direct/P2302",
        constraint_prop="http://www.wikidata.org/prop/P2302",
        class_qualifier="http://www.wikidata.org/prop/qualifier/P2308",
    )


CONSTRAINT_WALK_SQL = """
WITH flagged AS (
  SELECT DISTINCT 'http://www.wikidata.org/entity/P'
           || CAST(n_nationkey AS VARCHAR) AS pred
  FROM nation WHERE n_nationkey % 2 = 0
),
statements AS (
  SELECT 'http://www.wikidata.org/entity/P' || CAST(c_nationkey AS VARCHAR)
           AS pred,
         'S' || CAST(c_custkey AS VARCHAR) AS statement
  FROM customer
),
classes AS (
  SELECT 'S' || CAST(c_custkey AS VARCHAR) AS statement,
         'C' || CAST(c_custkey % 7 AS VARCHAR) AS class_type
  FROM customer
)
SELECT DISTINCT f.pred, c.class_type
FROM flagged f
JOIN statements s ON f.pred = s.pred
JOIN classes c ON s.statement = c.statement
"""


def q_wikidata_scan_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile-driven per-KB scan chain (profiles.py WIKIDATA), mirroring
    the reference's two post-scan streams (interface.py:44-117,141-146):
    the main ingoing/outgoing stream runs the full chain — predicate drop
    (wdt:P910), namespace keep, statement-node drop, literal rules — and
    the specific type/date stream runs only literal normalization
    (the reference's _filter_specific applies no namespace filter). Triples
    are synthesized from `orders` with wikidata-shaped URIs, one case per
    o_orderkey % 5."""
    from .profiles import WIKIDATA
    from .operators.scan_filters import normalize_literals

    wd = "http://www.wikidata.org/entity/Q"
    wdt = "http://www.wikidata.org/prop/direct/"
    orders = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 5
    main = orders.select(
        F.concat(F.lit(wd), F.col("o_orderkey").cast("string")).alias("subject"),
        F.when(k == 0, F.lit(wdt + "P910")).otherwise(F.lit(wdt + "P361")).alias(
            "predicate"
        ),
        F.when(
            k == 3,
            F.concat(
                F.lit("http://www.wikidata.org/entity/statement/Q"),
                F.col("o_custkey").cast("string"),
            ),
        )
        .when(
            k == 4,
            F.concat(F.lit("http://dbpedia.org/resource/X"), F.col("o_custkey").cast("string")),
        )
        .otherwise(F.concat(F.lit(wd), F.col("o_custkey").cast("string")))
        .alias("object"),
    )
    specific = orders.select(
        F.concat(F.lit(wd), F.col("o_orderkey").cast("string")).alias("subject"),
        F.lit(wdt + "P585").alias("predicate"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit('"Unknown"@en'))
        .otherwise(
            F.concat(
                F.lit('"'),
                F.date_format("o_orderdate", "yyyy-MM-dd"),
                F.lit('"^^<http://www.w3.org/2001/XMLSchema#date>'),
            )
        )
        .alias("object"),
    )
    return WIKIDATA.apply_scan_filters(main).unionByName(
        normalize_literals(specific)
    )


WIKIDATA_SCAN_SQL = """
WITH main AS (
  SELECT 'http://www.wikidata.org/entity/Q' || CAST(o_orderkey AS VARCHAR) AS subject,
         CASE WHEN o_orderkey % 5 = 0
              THEN 'http://www.wikidata.org/prop/direct/P910'
              ELSE 'http://www.wikidata.org/prop/direct/P361' END AS predicate,
         CASE WHEN o_orderkey % 5 = 3
              THEN 'http://www.wikidata.org/entity/statement/Q' || CAST(o_custkey AS VARCHAR)
              WHEN o_orderkey % 5 = 4
              THEN 'http://dbpedia.org/resource/X' || CAST(o_custkey AS VARCHAR)
              ELSE 'http://www.wikidata.org/entity/Q' || CAST(o_custkey AS VARCHAR)
         END AS object
  FROM orders
),
kept_main AS (
  SELECT * FROM main
  WHERE predicate <> 'http://www.wikidata.org/prop/direct/P910'   -- F1
    AND object LIKE 'http://www.wikidata%'                        -- F2
    AND object NOT LIKE 'http://www.wikidata.org/entity/statement/%'  -- F3
    AND object NOT LIKE 'http://www.wikidata.org/reference/%'
),
specific AS (
  SELECT 'http://www.wikidata.org/entity/Q' || CAST(o_orderkey AS VARCHAR) AS subject,
         'http://www.wikidata.org/prop/direct/P585' AS predicate,
         CASE WHEN o_orderkey % 7 = 0 THEN '"Unknown"@en'
              ELSE strftime(o_orderdate, '%Y-%m-%d') END AS object
  FROM orders
  WHERE o_orderkey % 7 <> 0                                        -- F4 Unknown drop
)
SELECT subject, predicate, object FROM kept_main
UNION ALL
SELECT subject, predicate, object FROM specific
"""


def q_kmeans_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (2 rounds, k=4) over the embeddings table;
    assign is map-only against broadcast centroid literals, update shuffles
    only k x dim cells. The oracle unrolls both rounds; centroid components
    are snapped to a 1e-6 grid in both engines so round 2 starts from
    identical centroids (operators/clustering.py docstring)."""
    from .operators.clustering import kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(emb, k=4, iterations=2)
    return assigned.select("vec_id", F.col("cluster").cast("int").alias("cluster"))


KMEANS_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 4)
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c0 c
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, d.i, floor(avg(e.v[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a1 a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY a.cluster, d.i
),
c1 AS (
  SELECT CAST(cluster AS INTEGER) AS cid, list(x ORDER BY i) AS v
  FROM u1 GROUP BY cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1 c
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cluster AS INT) AS cluster FROM a2
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (operators/dedup.py semantic_dedup):
    k-means clusters (k=4, 2 rounds, same deterministic recipe as
    kmeans_2iter) then drop any vector whose quantized cosine to an
    earlier same-cluster vector is >= 0.30. Integer cosine scores, so the
    oracle replays the full composition — unrolled k-means rounds, int8
    quantization, dominated-by-earlier rule — bit-identically."""
    from .operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    r = semantic_dedup(emb, k=4, iterations=2, threshold_x1e6=300000)
    return r.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("kept").cast("int").alias("kept"),
    )


SEMANTIC_DEDUP_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 4)
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c0 c
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, d.i, floor(avg(e.v[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a1 a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY a.cluster, d.i
),
c1 AS (
  SELECT CAST(cluster AS INTEGER) AS cid, list(x ORDER BY i) AS v
  FROM u1 GROUP BY cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1 c
  ) WHERE rn = 1
),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
norms AS (
  SELECT vec_id, list_sum(list_transform(q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS nq
  FROM qz
),
docs AS (SELECT a2.vec_id, a2.cluster, qz.q FROM a2 JOIN qz USING (vec_id)),
dominated AS (
  SELECT DISTINCT b.vec_id
  FROM docs a JOIN docs b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN norms na ON na.vec_id = a.vec_id
  JOIN norms nb ON nb.vec_id = b.vec_id
  WHERE na.nq > 0 AND nb.nq > 0
    AND floor(
          CAST(list_sum(list_transform(list_zip(a.q, b.q), x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
          / sqrt(CAST(na.nq * nb.nq AS DOUBLE)) * 1000000 + 0.5
        ) >= 300000
)
SELECT d.vec_id, CAST(d.cluster AS INT) AS cluster,
       CAST(CASE WHEN dom.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM docs d LEFT JOIN dominated dom USING (vec_id)
"""


def q_cluster_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation sample (operators/sampling.py
    cluster_quota_sample): k-means topic buckets (k=4, 2 rounds — same
    deterministic recipe as kmeans_2iter), then the 25 highest-quality
    documents of EACH cluster by (n_chars desc, doc_id asc). The engine runs
    the salted two-phase top-n (skew-proof for tiny k); the oracle replays
    the plain per-cluster window — provably the same rows under the total
    order."""
    from .operators.clustering import kmeans
    from .operators.sampling import cluster_quota_sample

    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), F.col("n_chars").alias("quality")
    )
    assigned, _ = kmeans(emb, k=4, iterations=2)
    out = cluster_quota_sample(assigned, docs, quota=25)
    return out.select(
        "vec_id",
        F.col("cluster").cast("int").alias("cluster"),
        F.col("quality").cast("long").alias("n_chars"),
        F.col("rk").cast("int").alias("rk"),
    )


CLUSTER_QUOTA_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 4)
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c0 c
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, d.i, floor(avg(e.v[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a1 a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY a.cluster, d.i
),
c1 AS (
  SELECT CAST(cluster AS INTEGER) AS cid, list(x ORDER BY i) AS v
  FROM u1 GROUP BY cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1 c
  ) WHERE rn = 1
),
ranked AS (
  SELECT a2.vec_id, a2.cluster, d.n_chars,
         row_number() OVER (
           PARTITION BY a2.cluster ORDER BY d.n_chars DESC, a2.vec_id ASC
         ) AS rk
  FROM a2 JOIN documents d ON d.doc_id = a2.vec_id
)
SELECT vec_id, CAST(cluster AS INT) AS cluster,
       CAST(n_chars AS BIGINT) AS n_chars, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 25
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms over the documents corpus
    (operators/text.py tfidf_top_terms): tf shuffle + broadcast of the
    vocabulary-sized df table, deterministic (score desc, term asc) ranks,
    1e6-scaled scores."""
    from .operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_n=3)


TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT t.doc_id, t.term,
         t.tf * (ln((CAST((SELECT n_docs FROM n) AS DOUBLE) + 1.0) / (d.df + 1.0)) + 1.0) AS score
  FROM tf t JOIN dfreq d USING (term)
),
ranked AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(rank AS INT) AS rank,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_x1e6
FROM ranked WHERE rank <= 3
"""


def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (operators/similarity.py
    kcenter_greedy, k=3) over the int8-quantized embeddings: seed at the
    smallest vec_id, then twice promote the farthest point; emits the
    full nearest-center assignment in exact integer squared L2. The
    oracle unrolls both promotions with the identical argmax and
    tie-break rules."""
    from .operators.similarity import kcenter_greedy

    emb = _t(spark, sf_dir, "embeddings")
    return kcenter_greedy(emb, k=3).select(
        F.col("id").alias("vec_id"), "center_id", "dist_sq"
    )


KCENTER_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
c1 AS (SELECT vec_id AS cid, q FROM qz ORDER BY vec_id LIMIT 1),
d1 AS (
  SELECT z.vec_id, z.q, (SELECT cid FROM c1) AS center_id,
         list_sum(list_transform(list_zip(z.q, (SELECT q FROM c1)),
           x -> (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT))
              * (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT)))) AS dist_sq
  FROM qz z
),
c2 AS (SELECT vec_id AS cid, q FROM d1 ORDER BY dist_sq DESC, vec_id ASC LIMIT 1),
d2 AS (
  SELECT vec_id, q,
         CASE WHEN nd < dist_sq OR (nd = dist_sq AND c2id < center_id)
              THEN c2id ELSE center_id END AS center_id,
         CASE WHEN nd < dist_sq OR (nd = dist_sq AND c2id < center_id)
              THEN nd ELSE dist_sq END AS dist_sq
  FROM (
    SELECT d.vec_id, d.q, d.center_id, d.dist_sq,
           (SELECT cid FROM c2) AS c2id,
           list_sum(list_transform(list_zip(d.q, (SELECT q FROM c2)),
             x -> (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT))
                * (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT)))) AS nd
    FROM d1 d
  )
),
c3 AS (SELECT vec_id AS cid, q FROM d2 ORDER BY dist_sq DESC, vec_id ASC LIMIT 1),
d3 AS (
  SELECT vec_id,
         CASE WHEN nd < dist_sq OR (nd = dist_sq AND c3id < center_id)
              THEN c3id ELSE center_id END AS center_id,
         CASE WHEN nd < dist_sq OR (nd = dist_sq AND c3id < center_id)
              THEN nd ELSE dist_sq END AS dist_sq
  FROM (
    SELECT d.vec_id, d.center_id, d.dist_sq,
           (SELECT cid FROM c3) AS c3id,
           list_sum(list_transform(list_zip(d.q, (SELECT q FROM c3)),
             x -> (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT))
                * (CAST(x[1] AS BIGINT) - CAST(x[2] AS BIGINT)))) AS nd
    FROM d2 d
  )
)
SELECT vec_id, center_id, CAST(dist_sq AS BIGINT) AS dist_sq FROM d3
"""


def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-10 for query vec 0 (operators/similarity.py
    quantize_vectors/quantized_topk): per-vector scales cancel in the
    cosine ratio, so scoring is pure integer arithmetic — bit-identical
    across engines, 4x fewer bytes moved than the double-precision
    baseline."""
    from .operators.similarity import quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    return quantized_topk(emb.filter(F.col("vec_id") != 0), q, k=10)


QUANTIZED_TOPK_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
qv AS (SELECT q FROM qz WHERE vec_id = 0),
sims AS (
  SELECT c.vec_id,
         CAST(list_sum(list_transform(list_zip(c.q, (SELECT q FROM qv)), x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(c.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))
                * list_sum(list_transform((SELECT q FROM qv), x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS DOUBLE)) AS qcos
  FROM qz c WHERE c.vec_id <> 0
)
SELECT 0 AS query_id, vec_id, CAST(row_number() OVER (ORDER BY qcos DESC, vec_id ASC) AS INT) AS rank,
       CAST(floor(qcos * 1000000 + 0.5) AS BIGINT) AS cos_x1e6
FROM sims ORDER BY qcos DESC, vec_id ASC LIMIT 10
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search over an inverted index
    (operators/retrieval.py): docs containing the token sequence
    "fast table" with per-doc match counts. The oracle replays the same
    token algebra (positions join, +1 adjacency) in DuckDB."""
    from .operators.retrieval import build_inverted_index, phrase_search

    docs = _t(spark, sf_dir, "documents")
    return phrase_search(build_inverted_index(docs), "fast table")


PHRASE_SEARCH_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l FROM documents)
),
t0 AS (SELECT doc_id, pos FROM toks WHERE term = 'fast'),
t1 AS (SELECT doc_id, pos FROM toks WHERE term = 'table'),
m AS (
  SELECT t0.doc_id FROM t0 JOIN t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches FROM m GROUP BY doc_id
"""


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR eval of the BM25 ranking against phrase-match pseudo-relevance:
    MRR@10 / precision@10 / recall@10 of bm25_search("fast join vector")
    judged by phrase_search("fast join") hits (weak-supervision labels, the
    standard zero-label eval trick). The inverted index feeds BOTH the
    ranker and the labeler — eager-localCheckpointed once (the tf/df
    shared-subtree family). All outputs exact integer quotients."""
    from .operators.retrieval import (
        bm25_search,
        build_inverted_index,
        phrase_search,
        retrieval_eval,
    )

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs).localCheckpoint(eager=True)
    ranked = bm25_search(index, docs, "fast join vector", k=10).withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    labels = phrase_search(index, "fast join").withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    return retrieval_eval(ranked, labels, k=10)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-ranked top-10 documents for the bag-of-words query
    "fast join vector" over the inverted index (operators/retrieval.py
    bm25_search); Lucene-style non-negative idf, k1=1.2, b=0.75, avg
    doc length snapped to the 1e-6 grid in both engines."""
    from .operators.retrieval import build_inverted_index, bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(build_inverted_index(docs), docs, "fast join vector", k=10)


BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
doc_len AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n,
         floor((SELECT avg(dl) FROM doc_len) * 1000000 + 0.5) / 1000000 AS avglen
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf WHERE term IN ('fast', 'join', 'vector') GROUP BY term
),
hits AS (
  SELECT t.doc_id, t.term, t.tf, d.df, l.dl
  FROM tf t JOIN dfreq d USING (term) JOIN doc_len l USING (doc_id)
  WHERE t.term IN ('fast', 'join', 'vector')
),
scored AS (
  SELECT doc_id,
         sum(
           ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (SELECT avglen FROM stats)))
         ) AS score
  FROM hits GROUP BY doc_id
)
SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_x1e6
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_bm25_many(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25 (operators/retrieval.bm25_search_many): three queries
    ranked in ONE term-keyed index pass — the retrieval-service dataflow,
    vs bm25_topk's per-query isin scan; salted two-phase per-query top-5."""
    from .operators.retrieval import bm25_search_many, build_inverted_index

    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [("q1", "fast join vector"), ("q2", "fast table"), ("q3", "vector index scan")],
        ["query_id", "qtext"],
    )
    return bm25_search_many(build_inverted_index(docs), docs, queries, k=5)


BM25_MANY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
doc_len AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n,
         floor((SELECT avg(dl) FROM doc_len) * 1000000 + 0.5) / 1000000 AS avglen
),
q(query_id, term) AS (
  VALUES ('q1', 'fast'), ('q1', 'join'), ('q1', 'vector'),
         ('q2', 'fast'), ('q2', 'table'),
         ('q3', 'vector'), ('q3', 'index'), ('q3', 'scan')
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY term
),
hits AS (
  SELECT qq.query_id, t.doc_id, t.term, t.tf, d.df, l.dl
  FROM tf t JOIN q qq USING (term) JOIN dfreq d USING (term)
  JOIN doc_len l USING (doc_id)
),
scored AS (
  SELECT query_id, doc_id,
         sum(
           ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (SELECT avglen FROM stats)))
         ) AS score
  FROM hits GROUP BY query_id, doc_id
)
SELECT query_id, doc_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_x1e6
FROM scored
QUALIFY rank <= 5
"""


RETRIEVAL_EVAL_SQL = f"""
WITH ranked AS ({BM25_SQL}),
ptoks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l FROM documents)
),
p0 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'fast'),
p1 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'join'),
labels AS (
  SELECT DISTINCT p0.doc_id
  FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM labels),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits, min(rank) AS first_hit
  FROM ranked r JOIN labels l ON r.doc_id = l.doc_id
  WHERE r.rank <= 10
)
SELECT 'q_fast_join_vector' AS query_id,
       n.n_rel,
       coalesce(h.n_hits, 0) AS n_hits,
       CAST(coalesce(1000000 // h.first_hit, 0) AS BIGINT) AS rr_x1e6,
       CAST(coalesce(h.n_hits, 0) * 1000000 // 10 AS BIGINT) AS p_at_k_x1e6,
       CAST(coalesce(coalesce(h.n_hits, 0) * 1000000 // nullif(n.n_rel, 0), 0) AS BIGINT)
         AS recall_at_k_x1e6
FROM nrel n, hits h
"""


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (operators/retrieval.py rrf_fuse): BM25 top-20 for
    "fast join vector" fused with quantized-cosine top-20 for query vector 0
    by reciprocal-rank fusion (k_const=60) — the modern lexical+vector
    retrieval stack as one query. Integer per-list contributions, so the
    fused score hashes identically across engines."""
    from .operators.retrieval import bm25_search, build_inverted_index, rrf_fuse
    from .operators.similarity import quantized_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = bm25_search(build_inverted_index(docs), docs, "fast join vector", k=20)
    q = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding"
    )
    vec = quantized_topk(emb.filter(F.col("vec_id") != 0), q, k=20).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex.select("doc_id", "rank"), vec], k=10)


HYBRID_RRF_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
doc_len AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n,
         floor((SELECT avg(dl) FROM doc_len) * 1000000 + 0.5) / 1000000 AS avglen
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf WHERE term IN ('fast', 'join', 'vector') GROUP BY term
),
hits AS (
  SELECT t.doc_id, t.term, t.tf, d.df, l.dl
  FROM tf t JOIN dfreq d USING (term) JOIN doc_len l USING (doc_id)
  WHERE t.term IN ('fast', 'join', 'vector')
),
scored AS (
  SELECT doc_id,
         sum(
           ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (SELECT avglen FROM stats)))
         ) AS score
  FROM hits GROUP BY doc_id
),
lex_top AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored ORDER BY score DESC, doc_id ASC LIMIT 20
),
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
qv AS (SELECT q FROM qz WHERE vec_id = 0),
sims AS (
  SELECT c.vec_id,
         CAST(list_sum(list_transform(list_zip(c.q, (SELECT q FROM qv)), x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
         / sqrt(CAST(list_sum(list_transform(c.q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT)))
                * list_sum(list_transform((SELECT q FROM qv), x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS DOUBLE)) AS qcos
  FROM qz c WHERE c.vec_id <> 0
),
vec_top AS (
  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY qcos DESC, vec_id ASC) AS rank
  FROM sims ORDER BY qcos DESC, vec_id ASC LIMIT 20
),
contrib AS (
  SELECT doc_id, CAST(floor(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM lex_top
  UNION ALL
  SELECT doc_id, CAST(floor(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM vec_top
),
fused AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_x1e6 FROM contrib GROUP BY doc_id)
SELECT doc_id, rrf_x1e6,
       CAST(row_number() OVER (ORDER BY rrf_x1e6 DESC, doc_id ASC) AS INT) AS rank
FROM fused ORDER BY rrf_x1e6 DESC, doc_id ASC LIMIT 10
"""


# ---------------------------------------------------------------------------
# Q: fuzzy ED-1 vocabulary join (typo-variant alias edges for canonicalization)
# ---------------------------------------------------------------------------


def q_fuzzy_vocab_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-variant blocking + levenshtein verify over the
    combined part-name + documents vocabulary (linking/fuzzy.py). The
    oracle is the brute-force all-pairs definition, so a hash match proves
    the lossless-blocking recall claim on real data."""
    from .linking.fuzzy import ed1_pairs

    part = _t(spark, sf_dir, "part")
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        part.select(F.explode(F.split("p_name", " ")).alias("tok"))
        .unionByName(
            docs.select(
                F.explode(
                    F.split(
                        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                        " ",
                    )
                ).alias("tok")
            )
        )
        .filter(F.col("tok") != "")
    )
    return ed1_pairs(vocab).orderBy("tok1", "tok2")


FUZZY_ED1_SQL = """
WITH v AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
    UNION ALL
    SELECT unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE tok <> '' AND length(tok) <= 64
)
SELECT a.tok AS tok1, b.tok AS tok2, CAST(1 AS BIGINT) AS dist
FROM v a JOIN v b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
ORDER BY tok1, tok2
"""


# ---------------------------------------------------------------------------
# Q: conversation dialogue metrics (curation-filter inputs per conv)
# ---------------------------------------------------------------------------


def q_dialogue_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dialogue import conversation_metrics

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
# Q: deterministic random walks (graph-embedding sampling stage)
# ---------------------------------------------------------------------------


def q_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step hash-seeded walks from every user node over the symmetrized
    user<->event_type bipartite graph (operators/graph_algos.random_walks).
    The event-type side is a handful of hub nodes — exactly the skew shape
    the arg-min's map-side combine is there for."""
    from .operators.graph_algos import random_walks

    ev = _t(spark, sf_dir, "events")
    u2t = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    ).distinct()
    edges = u2t.unionByName(
        u2t.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    starts = u2t.select(F.col("src").alias("node")).distinct()
    return random_walks(edges, n_steps=3, starts=starts)


RANDOM_WALKS_SQL = """
WITH ue AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS u, 't' || event_type AS t
  FROM events
),
e AS (SELECT u AS src, t AS dst FROM ue UNION ALL SELECT t AS src, u AS dst FROM ue),
nb AS (SELECT DISTINCT src, dst FROM e),
idx AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS i
  FROM nb
),
dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM nb GROUP BY src),
s0 AS (SELECT u AS walk_id, u AS cur FROM (SELECT DISTINCT u FROM ue)),
s1 AS (
  SELECT f.walk_id, x.dst AS cur
  FROM s0 f JOIN dg d ON f.cur = d.src
  JOIN idx x ON x.src = f.cur
   AND x.i = CAST(concat('0x', substr(md5('walk|' || f.walk_id || '|1|' || f.cur), 1, 8)) AS BIGINT) % d.deg
),
s2 AS (
  SELECT f.walk_id, x.dst AS cur
  FROM s1 f JOIN dg d ON f.cur = d.src
  JOIN idx x ON x.src = f.cur
   AND x.i = CAST(concat('0x', substr(md5('walk|' || f.walk_id || '|2|' || f.cur), 1, 8)) AS BIGINT) % d.deg
),
s3 AS (
  SELECT f.walk_id, x.dst AS cur
  FROM s2 f JOIN dg d ON f.cur = d.src
  JOIN idx x ON x.src = f.cur
   AND x.i = CAST(concat('0x', substr(md5('walk|' || f.walk_id || '|3|' || f.cur), 1, 8)) AS BIGINT) % d.deg
)
SELECT walk_id, CAST(0 AS INT) AS step, cur AS node FROM s0
UNION ALL SELECT walk_id, CAST(1 AS INT) AS step, cur AS node FROM s1
UNION ALL SELECT walk_id, CAST(2 AS INT) AS step, cur AS node FROM s2
UNION ALL SELECT walk_id, CAST(3 AS INT) AS step, cur AS node FROM s3
"""


# ---------------------------------------------------------------------------
# Q: tool transition counts (agent-behavior Markov statistics)
# ---------------------------------------------------------------------------


def q_tool_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dialogue import tool_transitions

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
# Q: token co-occurrence lift (association mining, exact integer quotient)
# ---------------------------------------------------------------------------


def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_k=20 exercises the vocabulary cap and its deterministic
    (count desc, token asc) tie-break on the 31-token corpus."""
    from .operators.text import cooccurrence_lift

    docs = _t(spark, sf_dir, "documents")
    return cooccurrence_lift(docs, top_k=20)


COOCCURRENCE_SQL = """
WITH dt AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
dfc AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_doc FROM dt GROUP BY tok),
vocab AS (
  SELECT tok, n_doc FROM dfc
  QUALIFY row_number() OVER (ORDER BY n_doc DESC, tok ASC) <= 20
),
kept AS (SELECT dt.doc_id, dt.tok FROM dt JOIN vocab ON dt.tok = vocab.tok),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM kept a JOIN kept b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY tok_a, tok_b
),
n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM documents)
SELECT tok_a, tok_b, n_ab,
       va.n_doc AS n_a, vb.n_doc AS n_b,
       CAST((n_ab * (SELECT nd FROM n) * 1000000) // (va.n_doc * vb.n_doc)
            AS BIGINT) AS lift_x1e6
FROM pairs
JOIN vocab va ON pairs.tok_a = va.tok
JOIN vocab vb ON pairs.tok_b = vb.tok
"""


# ---------------------------------------------------------------------------
# Q: mutual-best trigram alignment between two vocabularies (KB alignment)
# ---------------------------------------------------------------------------


def q_kb_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-name vocabulary vs documents vocabulary, aligned by mutual
    best trigram-Jaccard match (linking/fuzzy.mutual_best_trigram_match).
    The oracle replays candidates, scoring, both arg-maxes, and the
    mutuality join in SQL."""
    from .linking.fuzzy import mutual_best_trigram_match

    part = _t(spark, sf_dir, "part")
    docs = _t(spark, sf_dir, "documents")
    left = part.select(F.explode(F.split("p_name", " ")).alias("tok"))
    right = docs.select(
        F.explode(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
            )
        ).alias("tok")
    )
    return mutual_best_trigram_match(left, right)


KB_ALIGNMENT_SQL = """
WITH va AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
  ) WHERE tok <> '' AND length(tok) <= 64
),
vb AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE tok <> '' AND length(tok) <= 64
),
ga AS (
  SELECT tok AS tok_a, unnest(list_distinct(list_transform(
    range(1, length(tok) - 1), i -> substr(tok, CAST(i AS INT), 3)))) AS gram
  FROM va WHERE length(tok) >= 3
  UNION ALL
  SELECT tok AS tok_a, tok AS gram FROM va WHERE length(tok) < 3
),
gb AS (
  SELECT tok AS tok_b, unnest(list_distinct(list_transform(
    range(1, length(tok) - 1), i -> substr(tok, CAST(i AS INT), 3)))) AS gram
  FROM vb WHERE length(tok) >= 3
  UNION ALL
  SELECT tok AS tok_b, tok AS gram FROM vb WHERE length(tok) < 3
),
na AS (SELECT tok_a, CAST(count(*) AS BIGINT) AS n_a FROM ga GROUP BY tok_a),
nb AS (SELECT tok_b, CAST(count(*) AS BIGINT) AS n_b FROM gb GROUP BY tok_b),
common AS (
  SELECT ga.tok_a, gb.tok_b, CAST(count(*) AS BIGINT) AS n_common
  FROM ga JOIN gb USING (gram) GROUP BY ga.tok_a, gb.tok_b
),
scored AS (
  SELECT c.tok_a, c.tok_b, n_common, n_a, n_b,
         CAST(n_common * 1000000 // (n_a + n_b - n_common) AS BIGINT) AS jac_x1e6
  FROM common c JOIN na USING (tok_a) JOIN nb USING (tok_b)
),
ba AS (
  SELECT tok_a, tok_b FROM scored
  QUALIFY row_number() OVER (PARTITION BY tok_a ORDER BY jac_x1e6 DESC, tok_b ASC) = 1
),
bb AS (
  SELECT tok_a, tok_b FROM scored
  QUALIFY row_number() OVER (PARTITION BY tok_b ORDER BY jac_x1e6 DESC, tok_a ASC) = 1
)
SELECT s.tok_a, s.tok_b, n_common, n_a, n_b, jac_x1e6
FROM scored s JOIN ba USING (tok_a, tok_b) JOIN bb USING (tok_a, tok_b)
"""


# ---------------------------------------------------------------------------
# Q: burst detection (integer-exact rate anomaly per user-hour)
# ---------------------------------------------------------------------------


def q_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.temporal import burst_buckets

    ev = _t(spark, sf_dir, "events")
    return burst_buckets(ev, key="user_id", ts_col="ts", bucket="hour", factor=2)


BURST_HOURS_SQL = """
WITH c AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, bucket_ts
),
k AS (
  SELECT user_id, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM c GROUP BY user_id
)
SELECT c.user_id, c.bucket_ts, c.n_events, k.total_events, k.n_buckets
FROM c JOIN k USING (user_id)
WHERE c.n_events * k.n_buckets > 2 * k.total_events
"""


# ---------------------------------------------------------------------------
# Q: walk skip-grams (embedding training pairs from the walk corpus)
# ---------------------------------------------------------------------------


def q_walk_skipgrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph_algos import walk_skipgrams

    return walk_skipgrams(q_random_walks(spark, sf_dir), window=2)


WALK_SKIPGRAMS_SQL = f"""
WITH walks AS ({RANDOM_WALKS_SQL})
SELECT a.node AS center, b.node AS context, CAST(count(*) AS BIGINT) AS n_pairs
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id
 AND abs(a.step - b.step) <= 2 AND a.step <> b.step
GROUP BY center, context
"""


# ---------------------------------------------------------------------------
# Q: negative sampling (word2vec unigram-table draws over the skip-grams)
# ---------------------------------------------------------------------------


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 negatives per skip-gram pair from the 3/4-power-smoothed context
    distribution via the exact word2vec unigram-table pick (operators/
    graph_algos.negative_samples); n^0.75 = floor(sqrt(sqrt(n^3))) is
    IEEE-portable, every other step is integer, so DuckDB replays the
    identical table and draws."""
    from .operators.graph_algos import negative_samples

    return negative_samples(
        q_walk_skipgrams(spark, sf_dir), k=5, target_slots=1 << 16
    )


NEGATIVE_SAMPLES_SQL = f"""
WITH pairs AS ({WALK_SKIPGRAMS_SQL}),
vocab AS (
  SELECT context AS node, CAST(sum(n_pairs) AS BIGINT) AS n
  FROM pairs GROUP BY context
),
vw AS (
  SELECT node,
         greatest(CAST(1 AS BIGINT),
                  CAST(floor(sqrt(sqrt(CAST(n AS DOUBLE) * n * n))) AS BIGINT)) AS w
  FROM vocab
),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM vw),
vs AS (
  SELECT node,
         greatest(CAST(1 AS BIGINT), (w * CAST(65536 AS BIGINT)) // total_w) AS slots
  FROM vw, tot
),
spans AS (
  SELECT node, slots,
         CAST(coalesce(sum(slots) OVER (
           ORDER BY node ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start
  FROM vs
),
slot_table AS (
  SELECT node AS negative,
         start + unnest(generate_series(CAST(0 AS BIGINT), slots - 1)) AS slot
  FROM spans
),
tott AS (SELECT CAST(count(*) AS BIGINT) AS total_t FROM slot_table),
draws AS (
  SELECT p.center, p.context, CAST(j.j AS INT) AS neg_idx,
         CAST(concat('0x', substr(md5(
           'neg|' || p.center || '|' || p.context || '|' || CAST(j.j AS VARCHAR)
         ), 1, 8)) AS BIGINT) % t.total_t AS slot
  FROM pairs p, (SELECT unnest(generate_series(1, 5)) AS j) j, tott t
)
SELECT d.center, d.context, d.neg_idx, s.negative
FROM draws d JOIN slot_table s ON s.slot = d.slot
WHERE s.negative <> d.center AND s.negative <> d.context
"""


# ---------------------------------------------------------------------------
# Q: topic-shift boundaries (lexical-cohesion segmentation per conversation)
# ---------------------------------------------------------------------------


def q_topic_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.dialogue import topic_boundaries

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
    from .operators.dialogue import comention_graph

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
# Q: KG profile (per-predicate shape report over the constructed graph)
# ---------------------------------------------------------------------------


def q_kg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph profiling a KG consumer runs first: triple count, distinct
    subject/object cardinalities, and mean out-fanout per predicate
    (fanout_x1e6 = exact integer quotient) over the flagship event graph.
    One groupBy on the materialized graph — the graph is built once
    (graph/materialize.py) and profiled in a single shuffle."""
    from .graph.materialize import build_event_graph

    tx = transcripts_from_events(spark, sf_dir)
    g = build_event_graph(tx)
    return g.groupBy("predicate").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subject").alias("n_subjects"),
        F.countDistinct("object").alias("n_objects"),
        F.expr(
            "CAST(count(*) * 1000000 DIV count(DISTINCT subject) AS BIGINT)"
        ).alias("fanout_x1e6"),
    )


KG_PROFILE_SQL = (
    "WITH g AS (" + FLAGSHIP_SQL + ")\n"
    """SELECT predicate,
       CAST(count(*) AS BIGINT) AS n_triples,
       CAST(count(DISTINCT subject) AS BIGINT) AS n_subjects,
       CAST(count(DISTINCT object) AS BIGINT) AS n_objects,
       CAST(count(*) * 1000000 // count(DISTINCT subject) AS BIGINT)
         AS fanout_x1e6
FROM g GROUP BY predicate
"""
)


# ---------------------------------------------------------------------------
# Q: metapath census + degree histogram (KG schema/skew profiling)
# ---------------------------------------------------------------------------


def q_metapath_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered predicate-pair path census over the flagship event graph
    (operators/graph_algos.metapath_counts) — counted by the degree-product
    identity, never a wedge join; the oracle replays the same algebra."""
    from .graph.materialize import build_event_graph
    from .operators.graph_algos import metapath_counts

    tx = transcripts_from_events(spark, sf_dir)
    return metapath_counts(build_event_graph(tx))


METAPATH_SQL = (
    "WITH g AS (" + FLAGSHIP_SQL + ")\n"
    """, ind AS (
  SELECT object AS mid, predicate AS p1, CAST(count(*) AS BIGINT) AS d_in
  FROM g GROUP BY object, predicate
),
outd AS (
  SELECT subject AS mid, predicate AS p2, CAST(count(*) AS BIGINT) AS d_out
  FROM g GROUP BY subject, predicate
)
SELECT i.p1, o.p2, CAST(sum(i.d_in * o.d_out) AS BIGINT) AS n_paths
FROM ind i JOIN outd o ON i.mid = o.mid
GROUP BY i.p1, o.p2
"""
)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed in/out-degree distribution of the flagship graph
    (operators/graph_algos.degree_histogram) — the skew report; bucket is
    bit-length-minus-one, pure integer in both engines."""
    from .graph.materialize import build_event_graph
    from .operators.graph_algos import degree_histogram

    tx = transcripts_from_events(spark, sf_dir)
    g = build_event_graph(tx)
    return degree_histogram(g, src_col="subject", dst_col="object")


DEGREE_HIST_SQL = (
    "WITH g AS (" + FLAGSHIP_SQL + ")\n"
    """, outdeg AS (SELECT subject AS node, count(*) AS deg FROM g GROUP BY subject),
indeg AS (SELECT object AS node, count(*) AS deg FROM g GROUP BY object)
SELECT side, bucket, CAST(count(*) AS BIGINT) AS n_nodes FROM (
  SELECT 'out' AS side, CAST(length(bin(deg)) - 1 AS INT) AS bucket FROM outdeg
  UNION ALL
  SELECT 'in' AS side, CAST(length(bin(deg)) - 1 AS INT) AS bucket FROM indeg
) GROUP BY side, bucket
"""
)


# ---------------------------------------------------------------------------
# Q: SHACL-lite shape validation of the constructed graph
# ---------------------------------------------------------------------------


def q_shape_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape-validate the flagship graph (graph/validate.shape_report)
    against the event-schema invariants the reference's queries assume:
    every typed event ordered (min_count ng:nextEvent — conversation-final
    events violate, by construction of the lead() edge), at most one tool
    per event, begin timestamps inside the January window (range_regex),
    and tool-bearing subjects typed sem:Event (domain_type)."""
    from .graph.validate import shape_report

    g = _flagship_triples(spark, sf_dir).localCheckpoint(eager=True)
    return shape_report(
        g,
        [
            {"id": "r_ordered", "kind": "min_count", "pred": "ng:nextEvent", "min": 1},
            {"id": "r_single_tool", "kind": "max_count", "pred": "ng:usedTool", "max": 1},
            {
                "id": "r_jan_window",
                "kind": "range_regex",
                "pred": "sem:hasBeginTimeStamp",
                "regex": "^2024-01-[0-2][0-9]$",
            },
            {
                "id": "r_tool_typed",
                "kind": "domain_type",
                "pred": "ng:usedTool",
                "type": "sem:Event",
            },
        ],
    )


SHAPE_VIOLATIONS_SQL = (
    "WITH g AS (" + FLAGSHIP_SQL + ")\n"
    """, f AS (SELECT DISTINCT subject FROM g WHERE predicate = 'rdf:type'),
nc AS (
  SELECT subject, CAST(count(*) AS BIGINT) AS c FROM g
  WHERE predicate = 'ng:nextEvent' GROUP BY subject
),
r1 AS (
  SELECT 'r_ordered' AS rule_id, f.subject AS focus,
         CAST(coalesce(nc.c, 0) AS VARCHAR) AS detail
  FROM f LEFT JOIN nc ON f.subject = nc.subject
  WHERE coalesce(nc.c, 0) < 1
),
r2 AS (
  SELECT 'r_single_tool' AS rule_id, subject AS focus,
         CAST(count(*) AS VARCHAR) AS detail
  FROM g WHERE predicate = 'ng:usedTool' GROUP BY subject HAVING count(*) > 1
),
r3 AS (
  SELECT 'r_jan_window' AS rule_id, subject AS focus, object AS detail
  FROM g WHERE predicate = 'sem:hasBeginTimeStamp'
    AND NOT regexp_matches(object, '^2024-01-[0-2][0-9]$')
),
r4 AS (
  SELECT 'r_tool_typed' AS rule_id, t.subject AS focus,
         'missing type sem:Event' AS detail
  FROM (SELECT DISTINCT subject FROM g WHERE predicate = 'ng:usedTool') t
  WHERE t.subject NOT IN (
    SELECT subject FROM g WHERE predicate = 'rdf:type' AND object = 'sem:Event'
  )
)
SELECT * FROM r1 UNION ALL SELECT * FROM r2
UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4
"""
)


# ---------------------------------------------------------------------------
# Q: entity salience per conversation (frequency + first-position bonus)
# ---------------------------------------------------------------------------


def q_entity_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-salient entity (event_type mention) per conversation:
    salience = freq * 10^6 + 10^6 DIV (first_turn + 1) — frequency
    dominates, earlier first mention breaks near-ties, and the score stays
    an exact integer. Tie-break on the smaller mention string."""
    tx = transcripts_from_events(spark, sf_dir)
    m = tx.select(
        "conv_id",
        "turn_idx",
        F.regexp_extract("text", r"event ([a-z]+) with", 1).alias("mention"),
    )
    per = m.groupBy("conv_id", "mention").agg(
        F.count(F.lit(1)).alias("freq"),
        F.min("turn_idx").alias("first_turn"),
    )
    score = (
        F.col("freq").cast("long") * F.lit(1_000_000)
        + F.expr("CAST(1000000 DIV (first_turn + 1) AS BIGINT)")
    ).alias("salience_x1e6")
    scored = per.select("conv_id", "mention", "freq", "first_turn", score)
    best = scored.groupBy("conv_id").agg(
        F.min_by(
            F.struct("mention", "freq", "first_turn", "salience_x1e6"),
            F.struct((-F.col("salience_x1e6")).alias("ns"), F.col("mention")),
        ).alias("m")
    )
    return best.select(
        "conv_id", "m.mention", "m.freq", "m.first_turn", "m.salience_x1e6"
    )


ENTITY_SALIENCE_SQL = f"""
{TX_SQL},
m AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, 'event ([a-z]+) with', 1) AS mention
  FROM tx
),
per AS (
  SELECT conv_id, mention, CAST(count(*) AS BIGINT) AS freq,
         CAST(min(turn_idx) AS INT) AS first_turn
  FROM m GROUP BY conv_id, mention
),
scored AS (
  SELECT conv_id, mention, freq, first_turn,
         CAST(freq * 1000000 + 1000000 // (first_turn + 1) AS BIGINT)
           AS salience_x1e6
  FROM per
)
SELECT conv_id, mention, freq, first_turn, salience_x1e6
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY conv_id ORDER BY salience_x1e6 DESC, mention ASC) = 1
"""


# ---------------------------------------------------------------------------
# Q: per-entity temporal ordering edges across conversations
# ---------------------------------------------------------------------------


def q_entity_timeline_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Happened-before chain per entity ACROSS conversations: for each
    (event_type | value) mention, order its occurrences by (ts, conv,
    turn) and emit an edge to the next occurrence with the integer gap —
    the cross-document temporal ordering edges the north-star KG carries
    beside the within-conversation lead edges (window_lead_next). One
    window keyed by mention; entity-popularity skew is the classic window
    hot-partition — the finer (type | value) mention key keeps partitions
    bounded, and a production run salts a pathological celebrity entity."""
    tx = transcripts_from_events(spark, sf_dir)
    m = tx.select(
        "conv_id",
        "turn_idx",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.concat(
            F.regexp_extract("text", r"event ([a-z]+) with", 1),
            F.lit("|"),
            F.regexp_extract("text", r"value (\d+) recorded", 1),
        ).alias("mention"),
    )
    w = Window.partitionBy("mention").orderBy("ts_us", "conv_id", "turn_idx")
    return (
        m.select(
            "mention",
            "conv_id",
            "turn_idx",
            F.lead("conv_id").over(w).alias("next_conv"),
            F.lead("turn_idx").over(w).alias("next_turn"),
            (F.lead("ts_us").over(w) - F.col("ts_us")).alias("gap_us"),
        )
        .filter(F.col("next_conv").isNotNull())
    )


ENTITY_TIMELINE_SQL = f"""
{TX_SQL},
m AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         regexp_extract(text, 'event ([a-z]+) with', 1) || '|'
           || regexp_extract(text, 'value (\\d+) recorded', 1) AS mention
  FROM tx
),
led AS (
  SELECT mention, conv_id, turn_idx,
         lead(conv_id) OVER w AS next_conv,
         lead(turn_idx) OVER w AS next_turn,
         lead(ts_us) OVER w - ts_us AS gap_us
  FROM m
  WINDOW w AS (PARTITION BY mention ORDER BY ts_us, conv_id, turn_idx)
)
SELECT mention, conv_id, turn_idx, next_conv, next_turn,
       CAST(gap_us AS BIGINT) AS gap_us
FROM led WHERE next_conv IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Q: event coreference across conversations (canonical node + support)
# ---------------------------------------------------------------------------


def q_event_coreference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge event mentions that agree on (type, value, day) across ALL
    conversations into one canonical event node — the cross-transcript
    event-coreference step of KG construction (within-corpus referent
    canonicalization is apply_referents; this is its event-level twin).
    Canonical id = lexicographically first (conv, turn) occurrence; the
    min and both counts ride one map-side-combinable groupBy keyed by the
    event signature."""
    tx = transcripts_from_events(spark, sf_dir)
    sig = tx.select(
        F.concat(
            F.regexp_extract("text", r"event ([a-z]+) with", 1),
            F.lit("|"),
            F.regexp_extract("text", r"value (\d+) recorded", 1),
            F.lit("|"),
            F.regexp_extract("text", r"(\d{4}-\d{2}-\d{2})", 1),
        ).alias("event_sig"),
        "conv_id",
        "turn_idx",
    )
    return sig.groupBy("event_sig").agg(
        F.min(F.struct("conv_id", "turn_idx")).alias("c"),
        F.count(F.lit(1)).alias("n_mentions"),
        F.countDistinct("conv_id").alias("n_convs"),
    ).select(
        "event_sig",
        F.col("c.conv_id").alias("canonical_conv"),
        F.col("c.turn_idx").alias("canonical_turn"),
        "n_mentions",
        "n_convs",
    )


EVENT_COREF_SQL = f"""
{TX_SQL},
sig AS (
  SELECT regexp_extract(text, 'event ([a-z]+) with', 1) || '|'
           || regexp_extract(text, 'value (\\d+) recorded', 1) || '|'
           || regexp_extract(text, '(\\d{{4}}-\\d{{2}}-\\d{{2}})', 1) AS event_sig,
         conv_id, turn_idx
  FROM tx
)
SELECT event_sig,
       min({{'conv_id': conv_id, 'turn_idx': turn_idx}})['conv_id'] AS canonical_conv,
       min({{'conv_id': conv_id, 'turn_idx': turn_idx}})['turn_idx'] AS canonical_turn,
       CAST(count(*) AS BIGINT) AS n_mentions,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs
FROM sig GROUP BY event_sig
"""


# ---------------------------------------------------------------------------
# Q: dialogue-aware curation (metrics gate + burst-user exclusion, composed)
# ---------------------------------------------------------------------------


def q_dialogue_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition of the dialogue family into an eligibility filter:
    keep conversations long enough (n_turns >= 60) without pathological
    stalls (max gap <= ~61h), and drop every conversation of a user with
    a burst hour (runaway/replayed traffic) via a broadcast anti-join.
    Thresholds sit at the sf0.01 quartiles so the gate verifies a real
    three-way split, not a pass-through."""
    from .operators.dialogue import conversation_metrics
    from .operators.temporal import burst_buckets

    tx = transcripts_from_events(spark, sf_dir)
    met = conversation_metrics(tx, long_gap_s=3600)
    ev = _t(spark, sf_dir, "events")
    burst_convs = (
        burst_buckets(ev, key="user_id", ts_col="ts", bucket="hour", factor=2)
        .select(
            F.concat(
                F.lit("conv"), F.lpad(F.col("user_id").cast("string"), 6, "0")
            ).alias("conv_id")
        )
        .distinct()
    )
    return (
        met.filter(
            (F.col("n_turns") >= 60)
            & (F.col("max_gap_us") <= F.lit(220_000_000_000))
        )
        .join(F.broadcast(burst_convs), "conv_id", "left_anti")
        .select("conv_id", "n_turns", "max_gap_us")
    )


DIALOGUE_CURATION_SQL = f"""
{TX_SQL},
lagged AS (
  SELECT conv_id,
         epoch_us(ts) AS ts_us,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
  FROM tx
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
met AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us
  FROM lagged GROUP BY conv_id
),
bc AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id, bucket_ts
),
bk AS (
  SELECT user_id, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM bc GROUP BY user_id
),
burst_convs AS (
  SELECT DISTINCT 'conv' || lpad(CAST(bc.user_id AS VARCHAR), 6, '0') AS conv_id
  FROM bc JOIN bk USING (user_id)
  WHERE bc.n_events * bk.n_buckets > 2 * bk.total_events
)
SELECT conv_id, n_turns, max_gap_us
FROM met
WHERE n_turns >= 60 AND max_gap_us <= 220000000000
  AND conv_id NOT IN (SELECT conv_id FROM burst_convs)
"""


# ---------------------------------------------------------------------------
# Q: bigram typicality (model-free LM-style quality score, exact integer)
# ---------------------------------------------------------------------------


def q_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.text import bigram_typicality

    docs = _t(spark, sf_dir, "documents")
    return bigram_typicality(docs)


BIGRAM_TYPICALITY_SQL = """
WITH t AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
  FROM documents
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bg
  FROM t
),
c AS (SELECT bg, CAST(count(*) AS BIGINT) AS bg_count FROM bg GROUP BY bg),
scored AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(bg_count) * 1000000 // count(*) AS BIGINT) AS typ_x1e6
  FROM bg JOIN c USING (bg) GROUP BY doc_id
)
SELECT doc_id, n_bigrams, typ_x1e6 FROM scored
UNION ALL
SELECT doc_id, CAST(0 AS BIGINT) AS n_bigrams, CAST(0 AS BIGINT) AS typ_x1e6
FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM bg)
"""


# ---------------------------------------------------------------------------
# Q: community shape stats over the label-propagation labeling
# ---------------------------------------------------------------------------


def q_community_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.graph_algos import community_stats, label_propagation

    cust = _t(spark, sf_dir, "customer")
    edges = cust.select(
        F.col("c_custkey").alias("src"),
        (F.col("c_nationkey") + 1000000).alias("dst"),
    )
    return community_stats(edges, label_propagation(edges, iterations=2))


COMMUNITY_STATS_SQL = (
    "WITH lab AS ("
    + LABEL_PROP_SQL
    + """),
e AS (
  SELECT c_custkey AS src, c_nationkey + 1000000 AS dst FROM customer
),
j AS (
  SELECT e.src, e.dst, a.label AS ls, b.label AS ld
  FROM e JOIN lab a ON e.src = a.node JOIN lab b ON e.dst = b.node
),
nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes FROM lab GROUP BY label),
itl AS (
  SELECT ls AS label, CAST(count(*) AS BIGINT) AS n_internal
  FROM j WHERE ls = ld GROUP BY ls
),
cut AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_cut FROM (
    SELECT ls AS label FROM j WHERE ls <> ld
    UNION ALL
    SELECT ld AS label FROM j WHERE ls <> ld
  ) GROUP BY label
)
SELECT nn.label, nn.n_nodes,
       CAST(coalesce(itl.n_internal, 0) AS BIGINT) AS n_internal,
       CAST(coalesce(cut.n_cut, 0) AS BIGINT) AS n_cut
FROM nn
LEFT JOIN itl ON nn.label = itl.label
LEFT JOIN cut ON nn.label = cut.label
"""
)


# ---------------------------------------------------------------------------
# Q: fuzzy canonical vocabulary (ED-1 alias edges -> CC -> canonical form)
# ---------------------------------------------------------------------------


def q_fuzzy_canonical_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition linking/fuzzy.py promises: typo-variant alias edges
    from the ED-1 join feed the SAME connected-components stage as exact
    redirects, producing a canonical surface form per token (min of the
    component). Oracle replays it with a recursive min-label CTE."""
    from .linking.canonicalize import connected_components
    from .linking.fuzzy import ed1_pairs

    part = _t(spark, sf_dir, "part")
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        part.select(F.explode(F.split("p_name", " ")).alias("tok"))
        .unionByName(
            docs.select(
                F.explode(
                    F.split(
                        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                        " ",
                    )
                ).alias("tok")
            )
        )
        .filter((F.col("tok") != "") & (F.length("tok") <= 64))
        .distinct()
    )
    edges = ed1_pairs(vocab).select(
        F.col("tok1").alias("src"), F.col("tok2").alias("dst")
    )
    nodes = vocab.select(F.col("tok").alias("node"))
    cc = connected_components(edges, all_nodes=nodes, strategy="window")
    return cc.select(F.col("node").alias("tok"), F.col("component").alias("canonical"))


FUZZY_CANONICAL_SQL = """
WITH RECURSIVE v AS (
  SELECT DISTINCT tok FROM (
    SELECT unnest(string_split(p_name, ' ')) AS tok FROM part
    UNION ALL
    SELECT unnest(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
    FROM documents
  ) WHERE tok <> '' AND length(tok) <= 64
),
p AS (
  SELECT a.tok AS tok1, b.tok AS tok2
  FROM v a JOIN v b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
),
edges AS (
  SELECT tok1 AS src, tok2 AS dst FROM p UNION SELECT tok2, tok1 FROM p
),
reach(node, lbl) AS (
  SELECT tok, tok FROM v
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS tok, min(lbl) AS canonical FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# Q: topic segments (cumulative boundary sum -> per-segment stats)
# ---------------------------------------------------------------------------


def q_topic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the segmentation the boundary flags imply: segment id =
    1 + running sum of boundaries up to each turn (one window on the
    conv-keyed partitioning), then per-(conv, segment) stats — the units a
    per-topic event grouping consumes downstream."""
    from .operators.dialogue import topic_boundaries

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


# ---------------------------------------------------------------------------
# Q: ANN eval harness over the PQ path (recall@5 vs exact L2)
# ---------------------------------------------------------------------------


def q_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall@k report for the PQ/ADC index against the exact integer
    L2 ranking (same metric family as the index, unlike the LSH harness's
    cosine baseline) — together the two reports cover both ANN families."""
    from .operators.pq import pq_topk, train_pq_codebooks
    from .operators.similarity import ann_recall_report

    emb = _t(spark, sf_dir, "embeddings")
    cbs = train_pq_codebooks(emb, m=8, k=16, iterations=2)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(emb, qs, cbs, k=5)

    dv = F.col("embedding").cast("array<double>")
    q = qs.select("query_id", dv.alias("__qv"))
    c = emb.select("vec_id", dv.alias("__cv"))
    d = F.aggregate(
        F.zip_with(F.col("__qv"), F.col("__cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        F.floor(d * 1_000_000 + F.lit(0.5)).cast("long").alias("d2"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("vec_id"))
    exact = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "vec_id", "rank")
    )
    return ann_recall_report(exact, approx, k=5)


ANN_RECALL_PQ_SQL = (
    "WITH pq AS (SELECT * FROM ("
    + PQ_ADC_SQL
    + """)),
emb2 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
ex AS (
  SELECT query_id, vec_id, rn AS erank FROM (
    SELECT q.vec_id AS query_id, c.vec_id,
      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        CAST(floor(list_sum(list_transform(list_zip(c.v, q.v),
          x -> (x[1]-x[2])*(x[1]-x[2]))) * 1000000 + 0.5) AS BIGINT) ASC,
        c.vec_id ASC) AS rn
    FROM emb2 c JOIN emb2 q ON q.vec_id < 3)
  WHERE rn <= 5
)
SELECT e.query_id,
  CAST(count(a.rank) AS BIGINT) AS n_hits,
  CAST(max(CASE WHEN e.erank = 1 THEN coalesce(a.rank, 0) END) AS BIGINT) AS top1_rank,
  CAST((count(a.rank) * 1000000) // 5 AS BIGINT) AS recall_x1e6
FROM ex e LEFT JOIN pq a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
GROUP BY e.query_id
"""
)


# ---------------------------------------------------------------------------
# Q: unified curation score (uniqueness + typicality + length band, integer)
# ---------------------------------------------------------------------------


def q_curation_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single number a curation pipeline sorts by, composed from three
    already-gated signals with integer weights: token uniqueness (40%),
    corpus-max-normalized bigram typicality (40%), and a length band
    (20%). Every division is integer DIV; the corpus max crosses the plan
    as a one-row broadcast, not a driver collect."""
    from .operators.text import bigram_typicality

    docs = _t(spark, sf_dir, "documents")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "), " "
    )
    base = docs.select(
        "doc_id",
        F.size(words).cast("long").alias("n_tokens"),
        F.expr(
            "CAST(size(array_distinct(split(regexp_replace(lower(trim(text)),"
            " '\\\\s+', ' '), ' '))) * 1000000"
            " DIV size(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '))"
            " AS BIGINT)"
        ).alias("uniq_x1e6"),
    )
    typ = bigram_typicality(docs).select("doc_id", "typ_x1e6")
    mx = typ.agg(F.max("typ_x1e6").alias("max_typ"))
    scored = (
        base.join(typ, "doc_id")
        .crossJoin(F.broadcast(mx))
        .withColumn(
            "typ_norm_x1e6",
            F.expr("CAST(typ_x1e6 * 1000000 DIV greatest(max_typ, 1) AS BIGINT)"),
        )
        .withColumn(
            "band",
            F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 1)
            .otherwise(0)
            .cast("long"),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "uniq_x1e6",
        "typ_norm_x1e6",
        F.expr(
            "CAST((4 * uniq_x1e6 + 4 * typ_norm_x1e6 + 2 * band * 1000000)"
            " DIV 10 AS BIGINT)"
        ).alias("score_x1e6"),
    )


CURATION_SCORE_SQL = """
WITH t AS (
  SELECT doc_id, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS l
  FROM documents
),
base AS (
  SELECT doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(l)) * 1000000 // len(l) AS BIGINT) AS uniq_x1e6
  FROM t
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS bg
  FROM t
),
c AS (SELECT bg, CAST(count(*) AS BIGINT) AS bg_count FROM bg GROUP BY bg),
typ AS (
  SELECT doc_id,
         CAST(sum(bg_count) * 1000000 // count(*) AS BIGINT) AS typ_x1e6
  FROM bg JOIN c USING (bg) GROUP BY doc_id
),
mx AS (SELECT CAST(max(typ_x1e6) AS BIGINT) AS max_typ FROM typ),
scored AS (
  SELECT b.doc_id, b.n_tokens, b.uniq_x1e6,
         CAST(coalesce(typ.typ_x1e6, 0) * 1000000 // greatest(mx.max_typ, 1)
              AS BIGINT) AS typ_norm_x1e6,
         CASE WHEN b.n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END AS band
  FROM base b LEFT JOIN typ USING (doc_id) CROSS JOIN mx
)
SELECT doc_id, n_tokens, uniq_x1e6, typ_norm_x1e6,
       CAST((4 * uniq_x1e6 + 4 * typ_norm_x1e6 + 2 * band * 1000000) // 10
            AS BIGINT) AS score_x1e6
FROM scored
"""


# ---------------------------------------------------------------------------
# Q: transition reciprocity (directed type-transition graph, mutual edges)
# ---------------------------------------------------------------------------


def q_transition_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed-graph reciprocity over the per-user consecutive
    event-type transition graph: for each unordered type pair, how often
    each direction occurs and whether the relation is mutual — the edge
    symmetry statistic a KG consumer reads before treating a relation as
    undirected. One lag window keyed by user + one pair aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .filter(F.col("prev_type") != F.col("event_type"))
    )
    directed = tr.groupBy(
        F.col("prev_type").alias("t_from"), F.col("event_type").alias("t_to")
    ).agg(F.count(F.lit(1)).alias("n"))
    a = directed.select(
        F.least("t_from", "t_to").alias("type_a"),
        F.greatest("t_from", "t_to").alias("type_b"),
        F.when(F.col("t_from") < F.col("t_to"), F.col("n")).otherwise(0).alias("n_ab"),
        F.when(F.col("t_from") > F.col("t_to"), F.col("n")).otherwise(0).alias("n_ba"),
    )
    return a.groupBy("type_a", "type_b").agg(
        F.sum("n_ab").alias("n_ab"),
        F.sum("n_ba").alias("n_ba"),
        F.when((F.sum("n_ab") > 0) & (F.sum("n_ba") > 0), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_mutual"),
    )


TRANSITION_RECIPROCITY_SQL = """
WITH tr AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type
  FROM events
),
directed AS (
  SELECT prev_type AS t_from, event_type AS t_to, CAST(count(*) AS BIGINT) AS n
  FROM tr WHERE prev_type IS NOT NULL AND prev_type <> event_type
  GROUP BY t_from, t_to
),
folded AS (
  SELECT least(t_from, t_to) AS type_a, greatest(t_from, t_to) AS type_b,
         CASE WHEN t_from < t_to THEN n ELSE 0 END AS n_ab,
         CASE WHEN t_from > t_to THEN n ELSE 0 END AS n_ba
  FROM directed
)
SELECT type_a, type_b,
       CAST(sum(n_ab) AS BIGINT) AS n_ab,
       CAST(sum(n_ba) AS BIGINT) AS n_ba,
       CAST(CASE WHEN sum(n_ab) > 0 AND sum(n_ba) > 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_mutual
FROM folded GROUP BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# Q: hour-of-day activity profile per event type (integer over-rep flag)
# ---------------------------------------------------------------------------


def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, hour-of-day): count plus an integer
    over-representation flag (count * 24 > total-for-type means the hour
    beats the uniform rate) — the temporal profile a scheduling/anomaly
    analysis reads. Two aggregations sharing the event_type key."""
    ev = _t(spark, sf_dir, "events")
    byh = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = byh.groupBy("event_type").agg(F.sum("n").alias("total"))
    return byh.join(tot, "event_type").select(
        "event_type",
        "hour",
        "n",
        "total",
        F.when(F.col("n") * 24 > F.col("total"), 1).otherwise(0).cast("long")
        .alias("over_uniform"),
    )


HOURLY_PROFILE_SQL = """
WITH byh AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour
),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM byh GROUP BY event_type)
SELECT b.event_type, b.hour, b.n, t.total,
       CAST(CASE WHEN b.n * 24 > t.total THEN 1 ELSE 0 END AS BIGINT)
         AS over_uniform
FROM byh b JOIN tot t USING (event_type)
"""


# ---------------------------------------------------------------------------
# Q: leakage-safe conversation-level dataset split (stratified, hash-stable)
# ---------------------------------------------------------------------------


def q_conv_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment at CONVERSATION granularity — the unit
    that must not leak across splits for transcript corpora — stratified
    by each conversation's salient mention so every stratum lands in every
    split. Assignment is md5(conv_id) mod 10 (8/1/1), stable under
    reprocessing and independent of row order; new conversations join a
    split without reshuffling old ones (the reservoir-free property a
    growing corpus needs)."""
    sal = q_entity_salience(spark, sf_dir).select("conv_id", "mention")
    bucket = F.conv(F.substring(F.md5("conv_id"), 1, 8), 16, 10).cast("long") % 10
    return sal.select(
        "conv_id",
        F.col("mention").alias("stratum"),
        bucket.alias("bucket"),
        F.when(bucket <= 7, "train")
        .when(bucket == 8, "val")
        .otherwise("test")
        .alias("split"),
    )


CONV_SPLIT_SQL = f"""
{TX_SQL},
m AS (
  SELECT conv_id, turn_idx,
         regexp_extract(text, 'event ([a-z]+) with', 1) AS mention
  FROM tx
),
per AS (
  SELECT conv_id, mention, CAST(count(*) AS BIGINT) AS freq,
         CAST(min(turn_idx) AS INT) AS first_turn
  FROM m GROUP BY conv_id, mention
),
sal AS (
  SELECT conv_id, mention FROM (
    SELECT conv_id, mention,
           row_number() OVER (PARTITION BY conv_id ORDER BY
             freq * 1000000 + 1000000 // (first_turn + 1) DESC, mention ASC)
             AS rn
    FROM per
  ) WHERE rn = 1
),
b AS (
  SELECT conv_id, mention,
         CAST(concat('0x', substr(md5(conv_id), 1, 8)) AS BIGINT) % 10 AS bucket
  FROM sal
)
SELECT conv_id, mention AS stratum, CAST(bucket AS BIGINT) AS bucket,
       CASE WHEN bucket <= 7 THEN 'train'
            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split
FROM b
"""


# ---------------------------------------------------------------------------
# Q: split balance audit (per-stratum conditional counts over conv_split)
# ---------------------------------------------------------------------------


def q_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit a split consumer runs before training: per stratum, how
    many conversations landed in each split (conditional sums in one
    aggregation over the split assignment) — catches a stratum that
    hash-degenerated into a single split."""
    s = q_conv_split(spark, sf_dir)
    return s.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0))
        .cast("long")
        .alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0))
        .cast("long")
        .alias("n_val"),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0))
        .cast("long")
        .alias("n_test"),
    )


SPLIT_BALANCE_SQL = (
    "WITH s AS (SELECT * FROM ("
    + CONV_SPLIT_SQL
    + """))
SELECT stratum,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
       CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
       CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test
FROM s GROUP BY stratum
"""
)


def q_bgp_path_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL property-path surface (graph/bgp.py `p+`): the declarative
    BGP { ?x up+ ?a . ?a in_nation ?n } over a triples view of the
    customer binary tree (child k -up-> k DIV 2, k -in_nation-> nation) —
    every transitive ancestor annotated with its nation, the path pattern
    compiled to the iterative closure operator and joined like any other
    pattern. Root parent 0 has no nation row, so paths ending at the
    virtual root drop in the join (SPARQL join semantics, replayed by the
    oracle's recursive CTE)."""
    from .graph.bgp import bgp

    cust = _t(spark, sf_dir, "customer")
    up = cust.filter(F.col("c_custkey") > 0).select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("up").alias("predicate"),
        F.concat(
            F.lit("c"), F.floor(F.col("c_custkey") / 2).cast("long").cast("string")
        ).alias("object"),
    )
    nat = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("subject"),
        F.lit("in_nation").alias("predicate"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("object"),
    )
    return bgp(up.unionByName(nat), patterns=[("?x", "up+", "?a"), ("?a", "in_nation", "?n")])


BGP_PATH_SQL = """
WITH RECURSIVE anc AS (
  SELECT c_custkey AS child, CAST(floor(c_custkey / 2) AS BIGINT) AS ancestor
  FROM customer WHERE c_custkey > 0
  UNION
  SELECT a.child, CAST(floor(a.ancestor / 2) AS BIGINT) FROM anc a WHERE a.ancestor > 0
)
SELECT 'c' || CAST(anc.child AS VARCHAR) AS x,
       'c' || CAST(anc.ancestor AS VARCHAR) AS a,
       'n' || CAST(c.c_nationkey AS VARCHAR) AS n
FROM anc JOIN customer c ON c.c_custkey = anc.ancestor
"""


def q_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(context, target) SFT pairs with a 4-turn rolling context over the
    transcripts (operators/dialogue.context_windows); the frame is
    ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING so per-turn state is bounded
    by k regardless of conversation length."""
    from .operators.dialogue import context_windows

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


def q_split_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split corpus sizing (conversations, turns, whitespace tokens,
    integer token share) — what a trainer reads to size epochs and judge
    the 8/1/1 hash split actually delivered ~8/1/1 of the TOKENS, not just
    of the conversations. ZERO joins: the split is a pure function of
    md5(conv_id), so assignment is recomputed map-side on the transcript
    scan (the recomputable-anywhere property the hash-split design buys);
    one 3-group agg + a 1-row broadcast total. share_x1e6 is an exact
    integer quotient; at >9.2e12 total tokens compute it as
    n_tokens DIV (total DIV 1e6) to stay inside BIGINT."""
    tx = transcripts_from_events(spark, sf_dir)
    bucket = F.conv(F.substring(F.md5("conv_id"), 1, 8), 16, 10).cast("long") % 10
    per = (
        tx.select(
            F.when(bucket <= 7, "train")
            .when(bucket == 8, "val")
            .otherwise("test")
            .alias("split"),
            F.col("conv_id"),
            F.size(F.split("text", " ")).cast("long").alias("nt"),
        )
        .groupBy("split")
        .agg(
            F.countDistinct("conv_id").alias("n_convs"),
            F.count(F.lit(1)).alias("n_turns"),
            F.sum("nt").alias("n_tokens"),
        )
    )
    tot = per.agg(F.sum("n_tokens").alias("_tot"))
    return per.crossJoin(F.broadcast(tot)).select(
        "split",
        "n_convs",
        "n_turns",
        "n_tokens",
        F.expr("CAST(n_tokens * 1000000 DIV _tot AS BIGINT)").alias("share_x1e6"),
    )


SPLIT_TOKEN_BUDGET_SQL = f"""
{TX_SQL},
t AS (
  SELECT conv_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt,
         CAST(concat('0x', substr(md5(conv_id), 1, 8)) AS BIGINT) % 10 AS bucket
  FROM tx
),
per AS (
  SELECT CASE WHEN bucket <= 7 THEN 'train'
              WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
         CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum(nt) AS BIGINT) AS n_tokens
  FROM t GROUP BY 1
),
tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM per)
SELECT split, n_convs, n_turns, n_tokens,
       CAST(n_tokens * 1000000 // tt AS BIGINT) AS share_x1e6
FROM per, tot
"""


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the first 4 merge rules learned from the
    documents corpus (operators/bpe.py — Sennrich et al. 2016 as DataFrame
    algebra). The corpus collapses to a distinct-word frequency table after
    one shuffle; each round is a map-side pair explode + agg on that table
    and only the argmax row (strings + an exact integer count) crosses the
    driver. Merge application is DEFINED as the engines' shared
    left-to-right non-overlapping replace() scan, so the oracle replays
    training exactly; ties break on (count DESC, left, right) binary
    string order."""
    from .operators.bpe import bpe_train_batched, word_freqs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    _, merges_df = bpe_train_batched(word_freqs(docs), n_rounds=3, batch_k=4)
    return merges_df.select(
        "merge_round", "left_sym", "right_sym", "pair_count"
    )


def q_bpe_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword token counts per document under the 4 learned BPE merges —
    the segmentation half of the tokenizer (operators/bpe.py bpe_segment).
    Training reuses q_bpe_merges' recipe; segmentation itself adds NO
    shuffle (pure projection: per-word symbol runs joined by double spaces
    so merges cannot cross word boundaries, then the merge replaces in
    training order)."""
    from .operators.bpe import bpe_segment, bpe_train_batched, word_freqs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, _ = bpe_train_batched(word_freqs(docs), n_rounds=3, batch_k=4)
    return bpe_segment(docs, merges).select("doc_id", "n_tokens_bpe")


def _bpe_apply_round_sql(r: int, batch_k: int, col: str) -> str:
    """Nested replace() applying round r's kept merges in rank order;
    unfilled positions fall back to a chr(1) identity replace (the
    pattern never occurs in text, and replace(s, x, x) is the identity
    anyway)."""
    expr = col
    for pos in range(1, batch_k + 1):
        pat = (
            f"coalesce((SELECT ' ' || l || ' ' || r || ' ' FROM k{r}"
            f" WHERE pos = {pos}), chr(1))"
        )
        rep = (
            f"coalesce((SELECT ' ' || l || r || ' ' FROM k{r}"
            f" WHERE pos = {pos}), chr(1))"
        )
        expr = f"replace({expr}, {pat}, {rep})"
    return expr


def _bpe_training_ctes(n_rounds: int, batch_k: int) -> str:
    """Unrolled DuckDB CTE chain replaying bpe_train_batched: per round R,
    pR = pair counts over w(R-1); cR = the top-batch_k candidates ranked
    by (cnt DESC, l, r); kR = candidates sharing no symbol with ANY
    higher-ranked candidate in the window (the non-recursive batch rule —
    one window + NOT EXISTS, exactly the Spark loop's driver-side filter);
    wR = kR's replaces applied in rank order. batch_k=1 degenerates to
    sequential Sennrich training. Kept as a generator so the round/batch
    shape stays pinned to the queries above."""
    pairs = (
        "SELECT u['l'] AS l, u['r'] AS r, CAST(sum(freq) AS BIGINT) AS cnt\n"
        "  FROM (SELECT unnest(list_transform(range(1, len(string_split(trim(s), ' '))),\n"
        "               i -> {{'l': string_split(trim(s), ' ')[i],"
        " 'r': string_split(trim(s), ' ')[i+1]}})) AS u, freq\n"
        "        FROM {src})\n"
        "  GROUP BY 1, 2"
    )
    parts = [
        "words AS MATERIALIZED (\n"
        "  SELECT w AS word, CAST(count(*) AS BIGINT) AS freq\n"
        "  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)\n"
        "  WHERE w <> '' GROUP BY w\n"
        "),\n"
        "w0 AS MATERIALIZED (\n"
        "  SELECT ' ' || array_to_string(list_transform(range(1, length(word)+1),\n"
        "         i -> substr(word, i, 1)), ' ') || ' ' AS s, freq\n"
        "  FROM words\n"
        ")"
    ]
    for r in range(1, n_rounds + 1):
        parts.append(f"p{r} AS MATERIALIZED (\n  {pairs.format(src=f'w{r - 1}')}\n)")
        parts.append(
            f"c{r} AS MATERIALIZED (\n"
            f"  SELECT l, r, cnt,\n"
            f"         row_number() OVER (ORDER BY cnt DESC, l, r) AS rk\n"
            f"  FROM p{r} QUALIFY rk <= {batch_k}\n)"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (\n"
            f"  SELECT c.l, c.r, c.cnt,\n"
            f"         row_number() OVER (ORDER BY c.rk) AS pos\n"
            f"  FROM c{r} c\n"
            f"  WHERE NOT EXISTS (SELECT 1 FROM c{r} h WHERE h.rk < c.rk\n"
            f"        AND (h.l = c.l OR h.l = c.r OR h.r = c.l OR h.r = c.r))\n)"
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT {_bpe_apply_round_sql(r, batch_k, 's')} AS s,"
            f" freq FROM w{r - 1})"
        )
    return ",\n".join(parts)


def _bpe_doc_replay_ctes(n_rounds: int, batch_k: int, carry: str) -> str:
    """d1..dN CTEs replaying the learned batched merges over document
    symbol strings (column s), carrying `carry` columns through."""
    parts = []
    for r in range(1, n_rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT {carry},"
            f" {_bpe_apply_round_sql(r, batch_k, 's')} AS s FROM d{r - 1})"
        )
    return ",\n".join(parts)


_BPE_ROUNDS, _BPE_BATCH_K = 3, 4

_BPE_ALL_K = "\n  UNION ALL ".join(
    [f"SELECT {r} AS rnd, pos, l, r, cnt FROM k{r}"
     for r in range(1, _BPE_ROUNDS + 1)]
)

BPE_MERGES_SQL = f"""
WITH {_bpe_training_ctes(_BPE_ROUNDS, _BPE_BATCH_K)},
all_k AS (
  {_BPE_ALL_K}
)
SELECT CAST(row_number() OVER (ORDER BY rnd, pos) AS INT) AS merge_round,
       l AS left_sym, r AS right_sym, CAST(cnt AS BIGINT) AS pair_count
FROM all_k
"""

BPE_SEGMENT_SQL = f"""
WITH {_bpe_training_ctes(_BPE_ROUNDS, _BPE_BATCH_K)},
d0 AS MATERIALIZED (
  SELECT doc_id,
         ' ' || array_to_string(list_transform(
                  list_filter(string_split(text, ' '), x -> x <> ''),
                  x -> array_to_string(list_transform(range(1, length(x)+1),
                       i -> substr(x, i, 1)), ' ')), '  ') || ' ' AS s
  FROM documents
),
{_bpe_doc_replay_ctes(_BPE_ROUNDS, _BPE_BATCH_K, "doc_id")}
SELECT doc_id, CAST(len(string_split_regex(trim(s), ' +')) AS BIGINT) AS n_tokens_bpe
FROM d{_BPE_ROUNDS}
"""


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report: pieces-per-word of the learned BPE, per
    corpus source — the standard tokenizer-eval readout (a fertility far
    above ~1.3 on a source means the vocab under-serves it; the signal a
    pipeline uses to rebalance tokenizer training data). Pure composition
    of the gated bpe_train/bpe_segment path plus one source-keyed agg;
    fertility is an exact integer quotient so the oracle replays the
    whole chain bit-for-bit."""
    from .operators.bpe import bpe_segment, bpe_train_batched, word_freqs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, _ = bpe_train_batched(word_freqs(docs), n_rounds=3, batch_k=4)
    seg = bpe_segment(docs, merges)
    words = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    ).cast("long")
    return (
        seg.withColumn("n_words", words)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens_bpe").alias("n_pieces"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "n_pieces",
            F.expr("n_pieces * 1000000 DIV nullif(n_words, 0)").alias(
                "fertility_x1e6"
            ),
        )
    )


BPE_FERTILITY_SQL = f"""
WITH {_bpe_training_ctes(_BPE_ROUNDS, _BPE_BATCH_K)},
d0 AS MATERIALIZED (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_words,
         ' ' || array_to_string(list_transform(
                  list_filter(string_split(text, ' '), x -> x <> ''),
                  x -> array_to_string(list_transform(range(1, length(x)+1),
                       i -> substr(x, i, 1)), ' ')), '  ') || ' ' AS s
  FROM documents
),
{_bpe_doc_replay_ctes(_BPE_ROUNDS, _BPE_BATCH_K, "source, doc_id, n_words")}
,
seg AS (
  SELECT source, doc_id, n_words,
         CAST(len(string_split_regex(trim(s), ' +')) AS BIGINT) AS n_tokens_bpe
  FROM d{_BPE_ROUNDS}
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_words,
       CAST(sum(n_tokens_bpe) AS BIGINT) AS n_pieces,
       CAST(sum(n_tokens_bpe) * 1000000 // nullif(sum(n_words), 0) AS BIGINT)
         AS fertility_x1e6
FROM seg GROUP BY 1
"""


def q_er_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER threshold sweep (linking/er_eval.threshold_curve over
    linking/blocking.blocked_match_scores): precision/recall at every
    score cutoff on the er_fuse_pipeline fixture plus a balance-band
    agreement feature (cents DIV 5000 via exact double floor). True pair
    = (k, k+1e6). Every 3rd copy's cents shift by exactly two bands, so
    the curve is non-degenerate: score 11 = name+band (~2/3 of gold),
    10 = name only (~1/3), 1 = band-only false candidates in the
    (nation, segment) block. The cumulative window runs over distinct
    scores only (3 rows). gold_total = customer count (one eager scalar,
    like boilerplate's threshold)."""
    from .linking.blocking import blocked_match_scores
    from .linking.er_eval import threshold_curve

    cust = _t(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        cents.alias("cents"),
    )
    pert = base.select(
        (F.col("id") + 1000000).alias("id"),
        "name",
        "nation",
        "segment",
        F.when(F.col("id") % 3 == 0, F.col("cents") + 10000)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    band = F.expr("CAST(floor(cents / 5000.0) AS BIGINT)").alias("band")
    a = base.select("id", "name", "nation", "segment", band)
    b = pert.select("id", "name", "nation", "segment", band)
    scored = blocked_match_scores(
        a,
        b,
        id_col="id",
        blocks=[["nation", "segment"]],
        agreements=[("name", 10), ("band", 1)],
        min_score=1,
    ).withColumn(
        "is_true", (F.col("b_id") == F.col("a_id") + 1000000).cast("long")
    )
    return threshold_curve(scored, gold_total=base.count())


ER_THRESHOLD_CURVE_SQL = """
WITH base AS (
  SELECT c_custkey AS k, c_name AS name, c_nationkey AS n, c_mktsegment AS s,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
a AS (
  SELECT k, name, n, s, CAST(floor(cents / 5000.0) AS BIGINT) AS band
  FROM base
),
b AS (
  SELECT k + 1000000 AS pk, name, n, s,
         CAST(floor((CASE WHEN k % 3 = 0 THEN cents + 10000 ELSE cents END)
              / 5000.0) AS BIGINT) AS band
  FROM base
),
pairs AS (
  SELECT a.k AS a_id, b.pk AS b_id,
         CAST(CASE WHEN a.name = b.name THEN 10 ELSE 0 END +
              CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS BIGINT) AS score
  FROM a JOIN b ON a.n = b.n AND a.s = b.s
),
f AS (
  SELECT score,
         CASE WHEN b_id = a_id + 1000000 THEN 1 ELSE 0 END AS is_true
  FROM pairs WHERE score >= 1
),
per AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(is_true) AS BIGINT) AS n_true
  FROM f GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS gold FROM base)
SELECT score, n_pairs, n_true,
       CAST(sum(n_pairs) OVER w AS BIGINT) AS cum_pairs,
       CAST(sum(n_true) OVER w AS BIGINT) AS cum_true,
       CAST((sum(n_true) OVER w) * 1000000 // (sum(n_pairs) OVER w)
            AS BIGINT) AS precision_x1e6,
       CAST((sum(n_true) OVER w) * 1000000 // (SELECT gold FROM tot)
            AS BIGINT) AS recall_x1e6
FROM per
WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
"""


def q_distant_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distant-supervision pattern profile (extraction/distant.py,
    Mintz 2009) over the documents corpus: spot the 5-word vocab_mentions
    dictionary, form <=4-gap co-occurrence pairs, label them against a
    4-triple seed KB, and report per between-text pattern the pair count,
    doc count, KB hit count, pinned relation and exact integer precision.
    The word-soup vocabulary keeps the pattern space dense enough that
    the min_pairs=2 floor still leaves hundreds of rows at sf0.01."""
    from .extraction.distant import distant_supervision_patterns

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


def q_subclass_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical subclass induction (graph/constraints.py
    induce_subclass_candidates) over the user-typed-by-event-type
    extension sets: propose sub->sup when >=90% of sub's users also
    carry sup, support >= 5. With dense random typing most common types
    mutually contain each other — the mutual flag separates candidate
    equivalences from true one-way subsumption."""
    from .graph.constraints import induce_subclass_candidates

    ev = _t(spark, sf_dir, "events")
    typed = ev.select(
        F.col("user_id").alias("instance"), F.col("event_type").alias("type")
    )
    return induce_subclass_candidates(
        typed, min_support=5, min_containment_x1e6=900000
    )


SUBCLASS_INDUCTION_SQL = """
WITH t AS (SELECT DISTINCT user_id AS i, event_type AS ty FROM events),
ext AS (SELECT ty, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
p AS (
  SELECT a.ty, b.ty AS ty2, CAST(count(*) AS BIGINT) AS n_both
  FROM t a JOIN t b ON a.i = b.i AND a.ty <> b.ty GROUP BY 1, 2
),
cand AS (
  SELECT p.ty AS sub, p.ty2 AS sup, e.n AS n_sub, p.n_both,
         n_both * 1000000 // e.n AS cx
  FROM p JOIN ext e ON p.ty = e.ty
  WHERE e.n >= 5 AND n_both * 1000000 // e.n >= 900000
)
SELECT c.sub, c.sup, c.n_sub, c.n_both,
       CAST(c.cx AS BIGINT) AS containment_x1e6,
       CAST(CASE WHEN r.sub IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS mutual
FROM cand c LEFT JOIN cand r ON c.sub = r.sup AND c.sup = r.sub
"""


def q_disjointness_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """owl:disjointWith induction (graph/constraints.py
    induce_disjointness_candidates) over documents typed by BOTH their
    lang: and src: labels — the miner must rediscover that languages are
    mutually exclusive and sources are mutually exclusive, while
    lang-x-source pairs (which genuinely co-occur) stay out."""
    from .graph.constraints import induce_disjointness_candidates

    docs = _t(spark, sf_dir, "documents")
    typed = docs.select(
        F.col("doc_id").alias("instance"),
        F.concat(F.lit("lang:"), F.col("lang")).alias("type"),
    ).unionByName(
        docs.select(
            F.col("doc_id").alias("instance"),
            F.concat(F.lit("src:"), F.col("source")).alias("type"),
        )
    )
    return induce_disjointness_candidates(
        typed, min_support=5, max_overlap_x1e6=0
    )


DISJOINTNESS_INDUCTION_SQL = """
WITH typed AS (
  SELECT doc_id AS i, 'lang:' || lang AS ty FROM documents
  UNION ALL
  SELECT doc_id AS i, 'src:' || source AS ty FROM documents
),
t AS (SELECT DISTINCT i, ty FROM typed),
ext AS (SELECT ty, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY 1),
p AS (
  SELECT a.ty, b.ty AS ty2, CAST(count(*) AS BIGINT) AS n_both
  FROM t a JOIN t b ON a.i = b.i AND a.ty < b.ty GROUP BY 1, 2
),
g AS (
  SELECT x.ty AS type_a, y.ty AS type_b, x.n AS n_a, y.n AS n_b
  FROM ext x, ext y
  WHERE x.ty < y.ty AND x.n >= 5 AND y.n >= 5
)
SELECT type_a, type_b, n_a, n_b,
       CAST(coalesce(p.n_both, 0) AS BIGINT) AS n_both,
       CAST(coalesce(p.n_both, 0) * 1000000 // least(n_a, n_b) AS BIGINT)
         AS overlap_x1e6
FROM g LEFT JOIN p ON g.type_a = p.ty AND g.type_b = p.ty2
WHERE coalesce(p.n_both, 0) * 1000000 // least(n_a, n_b) <= 0
"""


def q_ssl_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (graph_algos.ssl_label_propagation)
    over the users' temporal-adjacency graph: edge (a, b) when b's event
    directly follows a's within the same event_type (lead over (ts,
    event_id) — a total order, deterministic); seeds = every 5th user
    labeled with their first event_type. Two clamped synchronous rounds.
    The oracle replays the identical (-count, label) arg-min tie-break.

    Scale note: the lead-window partitions on event_type (6 values) —
    fine as FIXTURE edge derivation for oracle parity, but a 100 TB edge
    list would come from the canonicalization/co-occurrence joins; the
    operator itself only sees (src, dst) and scales with the CC rounds."""
    from .operators.graph_algos import ssl_label_propagation

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    edges = (
        ev.select(
            F.col("user_id").alias("src"),
            F.lead("user_id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull() & (F.col("dst") != F.col("src")))
    )
    seeds = (
        ev.groupBy("user_id")
        .agg(F.min(F.struct("ts", "event_id", "event_type")).alias("f"))
        .filter(F.col("user_id") % 5 == 0)
        .select(F.col("user_id").alias("node"), F.col("f.event_type").alias("label"))
    )
    return ssl_label_propagation(edges, seeds, iterations=2)


SSL_LABELS_SQL = """
WITH ed AS (
  SELECT src, dst FROM (
    SELECT user_id AS src,
           lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id)
             AS dst
    FROM events
  ) WHERE dst IS NOT NULL AND dst <> src
),
sym AS (
  SELECT src, dst FROM ed
  UNION ALL
  SELECT dst AS src, src AS dst FROM ed
),
sd AS (
  SELECT user_id AS node, event_type AS label FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
  ) WHERE rn = 1 AND user_id % 5 = 0
),
nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM sym UNION ALL SELECT node FROM sd
  )
),
l0 AS (
  SELECT n.node, sd.label FROM nodes n LEFT JOIN sd ON n.node = sd.node
),
v1 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l0 l ON s.src = l.node
  WHERE l.label IS NOT NULL GROUP BY 1, 2
),
b1 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v1
  ) WHERE rn = 1
),
l1 AS (
  SELECT l0.node, coalesce(sd.label, b1.label, l0.label) AS label
  FROM l0
  LEFT JOIN sd ON l0.node = sd.node
  LEFT JOIN b1 ON l0.node = b1.node
),
v2 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l1 l ON s.src = l.node
  WHERE l.label IS NOT NULL GROUP BY 1, 2
),
b2 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v2
  ) WHERE rn = 1
),
l2 AS (
  SELECT l1.node, coalesce(sd.label, b2.label, l1.label) AS label
  FROM l1
  LEFT JOIN sd ON l1.node = sd.node
  LEFT JOIN b2 ON l1.node = b2.node
)
SELECT node, label FROM l2
"""


def q_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-filter threshold tuning: band the affinity_classifier's doc
    scores to score_x1e6 DIV 10000 (<=100 bands, so linking/er_eval
    threshold_curve's single-partition cumulative window stays O(bands)
    at ANY corpus size) and report precision/recall per cutoff against
    the lang='en' truth. gold_total = all positive docs — unscored
    positives count against recall by contract (one eager scalar)."""
    from .linking.er_eval import threshold_curve
    from .operators.classifier import classify_documents

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", (F.col("lang") == "en").cast("long")
    )
    scored = classify_documents(docs, label_col="is_en", min_count=5)
    labeled = scored.join(
        docs.select(F.col("doc_id").alias("id"), "is_en"), "id"
    ).select(
        F.expr("score_x1e6 DIV 10000").alias("score"),
        F.col("is_en").alias("is_true"),
    )
    gold = docs.filter(F.col("is_en") == 1).count()
    return threshold_curve(labeled, gold_total=gold)


CLASSIFIER_PR_CURVE_SQL = """
WITH tok AS (
  SELECT doc_id AS id,
         CAST(lang = 'en' AS BIGINT) AS is_pos,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
model AS (
  SELECT tok,
         CAST(sum(is_pos) AS BIGINT) AS n_pos,
         CAST(sum(1 - is_pos) AS BIGINT) AS n_neg
  FROM tok GROUP BY 1 HAVING count(*) >= 5
),
m2 AS (
  SELECT tok, (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS aff FROM model
),
sc AS (
  SELECT id, CAST(sum(aff) // count(*) AS BIGINT) AS score_x1e6
  FROM tok JOIN m2 USING (tok) GROUP BY 1
),
lab AS (
  SELECT sc.score_x1e6 // 10000 AS score,
         CAST(d.lang = 'en' AS BIGINT) AS is_true
  FROM sc JOIN documents d ON sc.id = d.doc_id
),
per AS (
  SELECT score, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(is_true) AS BIGINT) AS n_true
  FROM lab GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS gold FROM documents WHERE lang = 'en')
SELECT score, n_pairs, n_true,
       CAST(sum(n_pairs) OVER w AS BIGINT) AS cum_pairs,
       CAST(sum(n_true) OVER w AS BIGINT) AS cum_true,
       CAST((sum(n_true) OVER w) * 1000000 // (sum(n_pairs) OVER w)
            AS BIGINT) AS precision_x1e6,
       CAST((sum(n_true) OVER w) * 1000000 // (SELECT gold FROM tot)
            AS BIGINT) AS recall_x1e6
FROM per
WINDOW w AS (ORDER BY score DESC ROWS UNBOUNDED PRECEDING)
"""


def q_snowball_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowball/Mintz bootstrap round (extraction/distant.py
    snowball_extract): patterns with >=2 pairs and exact precision
    >=600000 against the 4-triple seed KB apply back to the corpus and
    emit the NEW (subj, pred, obj) triples they cover, with support.
    Same dictionary/KB fixture as distant_patterns."""
    from .extraction.distant import snowball_extract

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


def q_affinity_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality/domain classifier (operators/classifier.py): train
    Laplace-smoothed token affinities on the lang='en' label over the
    documents corpus, score every document by exact-integer mean affinity
    of its model-known tokens. min_count=5 bounds the broadcast model."""
    from .operators.classifier import classify_documents

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", (F.col("lang") == "en").cast("long")
    )
    return classify_documents(docs, label_col="is_en", min_count=5).select(
        F.col("id").alias("doc_id"), "n_scored", "score_x1e6"
    )


AFFINITY_CLASSIFIER_SQL = """
WITH tok AS (
  SELECT doc_id AS id,
         CAST(lang = 'en' AS BIGINT) AS is_pos,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
model AS (
  SELECT tok,
         CAST(sum(is_pos) AS BIGINT) AS n_pos,
         CAST(sum(1 - is_pos) AS BIGINT) AS n_neg
  FROM tok GROUP BY 1 HAVING count(*) >= 5
),
m2 AS (
  SELECT tok, (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS aff FROM model
),
sc AS (
  SELECT id, count(*) AS n_scored, sum(aff) AS total
  FROM tok JOIN m2 USING (tok) GROUP BY 1
)
SELECT id AS doc_id,
       CAST(n_scored AS BIGINT) AS n_scored,
       CAST(total // n_scored AS BIGINT) AS score_x1e6
FROM sc
"""


def q_template_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template induction over the transcript view (operators/text.py
    template_skeletons): digit runs mask to '#', identical skeletons
    group — the machine-boilerplate detector exact dedup misses because
    the numbers differ. Per skeleton: turn count, distinct conversations,
    pinned min-text example. One combinable shuffle."""
    from .operators.text import template_skeletons

    tx = transcripts_from_events(spark, sf_dir)
    return template_skeletons(tx, text_col="text", id_col="conv_id", min_count=2)


TEMPLATE_PROFILE_SQL = f"""
{TX_SQL},
sk AS (
  SELECT regexp_replace(text, '[0-9]+', '#', 'g') AS skeleton,
         text, conv_id
  FROM tx
)
SELECT skeleton, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT conv_id) AS BIGINT) AS n_groups,
       min(text) AS example
FROM sk GROUP BY 1 HAVING count(*) >= 2
"""


def q_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling (operators/sampling.py
    budget_sample_per_source): per source keep hash-ordered documents
    until 5000 cumulative tokens — the "N tokens per domain" primitive.
    Spark runs the two-phase per-source prefix sum (no driver collect,
    no single-partition window); the oracle replays the SAME pinned
    semantics with one window per source, which is provably equal because
    range partitioning preserves md5 order across partition ids."""
    from .operators.sampling import budget_sample_per_source

    docs = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    ).cast("long")
    d = docs.select("doc_id", "source", toks.alias("n_tokens"))
    return budget_sample_per_source(d, budget=5000)


BUDGET_SAMPLE_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
              AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY ok
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens, cum_before FROM c WHERE cum_before < 5000
"""


def q_path_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMIE-lite rule mining over the flagship event graph (graph/rules.py):
    closed Horn rules p1(x,y) ∧ p2(y,z) ⇒ head(x,z) with support and exact
    integer-quotient standard confidence. The distinct endpoint-binding
    body is the one irreducible wedge join — checkpointed once and shared
    by the denominator agg and the head-support join; at scale the
    degree-product budget guard (max_est_paths) fences the wedge before it
    is paid for. Finds the graph's real invariants (e.g. nextEvent ∧
    inConversation ⇒ inConversation at confidence 1.0)."""
    from .graph.materialize import build_event_graph
    from .graph.rules import mine_path_rules

    tx = transcripts_from_events(spark, sf_dir)
    g = build_event_graph(tx)
    return mine_path_rules(g, min_support=5)


PATH_RULES_SQL = (
    "WITH g AS (" + FLAGSHIP_SQL + ")\n"
    """, t AS (SELECT subject s, predicate p, object o FROM g),
body AS (SELECT DISTINCT a.s AS x, a.p AS p1, b.p AS p2, b.o AS z
         FROM t a JOIN t b ON a.o = b.s),
np AS (SELECT p1, p2, CAST(count(*) AS BIGINT) AS n_pairs FROM body GROUP BY 1, 2),
sup AS (SELECT body.p1, body.p2, t.p AS head_pred, CAST(count(*) AS BIGINT) AS support
        FROM body JOIN t ON body.x = t.s AND body.z = t.o GROUP BY 1, 2, 3)
SELECT s.p1, s.p2, s.head_pred, s.support, np.n_pairs,
       CAST(s.support * 1000000 // np.n_pairs AS BIGINT) AS conf_x1e6
FROM sup s JOIN np USING (p1, p2) WHERE s.support >= 5
"""
)


def q_fuse_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-ER attribute fusion (linking/fusion.py): majority-vote truth
    discovery per canonical entity with a pinned tie-break (max votes, then
    smallest value) — the knowledge-consolidation step the reference leaves
    to driver-side dict update order (src/make_narrative_graph.py property
    dicts). Fixture: event assertions pooled through a mod-97 referent
    dictionary; two attributes (event type, value band) fused per canonical
    user. Two cascaded aggs, no windows; confidence is an exact integer
    quotient so DuckDB replays it bit-exactly."""
    from .linking.fusion import fuse_attributes

    ev = _t(spark, sf_dir, "events")
    assertions = ev.select(
        F.col("user_id").alias("entity"),
        F.lit("etype").alias("attr"),
        F.col("event_type").alias("value"),
    ).unionAll(
        ev.select(
            F.col("user_id").alias("entity"),
            F.lit("vband").alias("attr"),
            F.floor(F.col("value") / F.lit(100.0)).cast("string").alias("value"),
        )
    )
    referents = (
        ev.select(F.col("user_id").alias("alias"))
        .distinct()
        .withColumn("canonical", F.col("alias") % 97)
    )
    return fuse_attributes(assertions, referents)


FUSE_ATTRIBUTES_SQL = """
WITH a AS (
  SELECT user_id % 97 AS entity, 'etype' AS attr, event_type AS value FROM events
  UNION ALL
  SELECT user_id % 97, 'vband', CAST(CAST(floor(value / 100) AS BIGINT) AS VARCHAR)
  FROM events
),
c AS (SELECT entity, attr, value, count(*) AS cnt FROM a GROUP BY 1, 2, 3),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY entity, attr
                            ORDER BY cnt DESC, value ASC) AS rn,
         sum(cnt)  OVER (PARTITION BY entity, attr) AS total,
         count(*)  OVER (PARTITION BY entity, attr) AS n_values
  FROM c
)
SELECT entity, attr, value AS fused_value, CAST(cnt AS BIGINT) AS votes,
       CAST(total AS BIGINT) AS total, CAST(n_values AS BIGINT) AS n_values,
       CAST((cnt * 1000000) // total AS BIGINT) AS confidence_x1e6
FROM r WHERE rn = 1
"""


def q_er_fuse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocked scoring -> match edges ->
    connected components -> referent dictionary -> attribute fusion, the
    full production composition (each stage individually gated:
    blocked_er_scores, cc_canonical, fuse_attributes). Fixture: customers
    vs a deterministically perturbed copy (ids offset by 1e6, every 3rd
    balance shifted); names are unique, so the only pairs clearing
    min_score=10 are (k, k+1e6) — the oracle replays the provably-equal
    canonical mapping (component min = k) in closed form while Spark runs
    the real CC, then both fuse: segment agrees 2/2, cents ties 1-1 for
    the perturbed third (smallest string wins)."""
    from .linking.blocking import blocked_match_scores
    from .linking.canonicalize import connected_components
    from .linking.fusion import fuse_attributes

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    pert = base.select(
        (F.col("id") + 1000000).alias("id"),
        "name",
        "nation",
        "segment",
        F.when(F.col("id") % 3 == 0, F.col("cents") + 10000)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )
    edges = blocked_match_scores(
        base,
        pert,
        id_col="id",
        blocks=[["nation", "segment"]],
        agreements=[("name", 10)],
        min_score=10,
    ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    recs = base.unionByName(pert)
    cc = connected_components(edges, all_nodes=recs.select(F.col("id").alias("node")))
    refs = cc.select(
        F.col("node").alias("alias"), F.col("component").alias("canonical")
    )
    assertions = recs.select(
        F.col("id").alias("entity"),
        F.lit("segment").alias("attr"),
        F.col("segment").alias("value"),
    ).unionByName(
        recs.select(
            F.col("id").alias("entity"),
            F.lit("cents").alias("attr"),
            F.col("cents").cast("string").alias("value"),
        )
    )
    return fuse_attributes(assertions, referents=refs)


ER_FUSE_PIPELINE_SQL = """
WITH base AS (
  SELECT c_custkey AS k, c_mktsegment AS segment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
pert AS (
  SELECT k, segment,
         CASE WHEN k % 3 = 0 THEN cents + 10000 ELSE cents END AS cents
  FROM base
),
recs AS (
  SELECT k AS entity, segment, cents FROM base
  UNION ALL SELECT k, segment, cents FROM pert
),
a AS (
  SELECT entity, 'segment' AS attr, segment AS value FROM recs
  UNION ALL SELECT entity, 'cents', CAST(cents AS VARCHAR) FROM recs
),
c AS (SELECT entity, attr, value, count(*) AS cnt FROM a GROUP BY 1, 2, 3),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY entity, attr
                            ORDER BY cnt DESC, value ASC) AS rn,
         sum(cnt)  OVER (PARTITION BY entity, attr) AS total,
         count(*)  OVER (PARTITION BY entity, attr) AS n_values
  FROM c
)
SELECT entity, attr, value AS fused_value, CAST(cnt AS BIGINT) AS votes,
       CAST(total AS BIGINT) AS total, CAST(n_values AS BIGINT) AS n_values,
       CAST((cnt * 1000000) // total AS BIGINT) AS confidence_x1e6
FROM r WHERE rn = 1
"""


def q_transe_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TransE-style link-prediction eval (graph/link_prediction.py): learn
    the integer translation prototype of relation t = h+17 over the int8-
    quantized embeddings, then rank each test triple's true tail among ALL
    entities by the n²-scaled exact-integer distance (same argsort as the
    rational TransE distance, no float ever enters). Candidates scan is a
    map-only broadcast nested loop over the entity table; ranks, reciprocal
    ranks, and hits@10 are exact integers the oracle replays bit-for-bit."""
    from .graph.link_prediction import transe_rank_eval
    from .operators.similarity import quantize_vectors

    emb = _t(spark, sf_dir, "embeddings")
    ents = quantize_vectors(emb).select("vec_id", "qvec")
    triples = (
        ents.select(
            F.col("vec_id").alias("h"),
            F.lit("shift17").alias("r"),
            (F.col("vec_id") + 17).alias("t"),
        )
        .join(ents.select(F.col("vec_id").alias("tid")), F.col("t") == F.col("tid"))
        .drop("tid")
    )
    out = transe_rank_eval(triples, ents, k=10, test_filter=F.col("h") % 10 == 0)
    return out.select(
        "h", "t", "rank", "rr_x1e6", F.col("hit").alias("hit_at_10")
    )


TRANSE_LINK_PRED_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
tr AS (
  SELECT hq.vec_id AS h, hq.q AS hv, tq.vec_id AS t, tq.q AS tvx
  FROM qz hq JOIN qz tq ON tq.vec_id = hq.vec_id + 17
),
dx AS (
  SELECT generate_subscripts(hv, 1) AS pos,
         CAST(unnest(tvx) AS BIGINT) - CAST(unnest(hv) AS BIGINT) AS d
  FROM tr
),
rel AS (SELECT pos, CAST(sum(d) AS BIGINT) AS s, count(*) AS n FROM dx GROUP BY pos),
tx AS (
  SELECT h, t, generate_subscripts(hv, 1) AS pos,
         CAST(unnest(hv) AS BIGINT) AS hx, CAST(unnest(tvx) AS BIGINT) AS tvv
  FROM tr WHERE h % 10 = 0
),
qvx AS (
  SELECT h, t, pos, rel.n * hx + rel.s AS qx, rel.n AS n, tvv
  FROM tx JOIN rel USING (pos)
),
dtrue AS (
  SELECT h, t, CAST(sum((qx - n * tvv) * (qx - n * tvv)) AS BIGINT) AS d_true
  FROM qvx GROUP BY 1, 2
),
cx AS (
  SELECT vec_id AS cid, generate_subscripts(q, 1) AS pos,
         CAST(unnest(q) AS BIGINT) AS cv
  FROM qz
),
dc AS (
  SELECT q.h, q.t, c.cid,
         CAST(sum((q.qx - q.n * c.cv) * (q.qx - q.n * c.cv)) AS BIGINT) AS d
  FROM qvx q JOIN cx c USING (pos) GROUP BY 1, 2, 3
),
rk AS (
  SELECT c.h, c.t,
         CAST(1 + sum(CASE WHEN c.d < s.d_true
                             OR (c.d = s.d_true AND c.cid < c.t)
                           THEN 1 ELSE 0 END) AS BIGINT) AS rank
  FROM dc c JOIN dtrue s USING (h, t) GROUP BY 1, 2
)
SELECT h, t, rank, CAST(1000000 // rank AS BIGINT) AS rr_x1e6,
       CAST(CASE WHEN rank <= 10 THEN 1 ELSE 0 END AS BIGINT) AS hit_at_10
FROM rk
"""


def q_er_clustering_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER evaluation harness: run the REAL blocked-scoring -> connected-
    components pipeline on a fixture with deterministic errors, then score
    the predicted clustering against record identity with pairwise P/R/F1
    + B-cubed (linking/er_eval.clustering_eval — the clustering-side
    counterpart of the reference's set-overlap eval, src/evaluation.py).
    Fixture: customers vs a perturbed copy (ids +1e6; gold entity = k for
    both copies). Errors: every 5th key's copy gets an 'X'-suffixed name
    (false negative -> singleton); every 22nd key's copy takes the name of
    base k+11 ('R' suffix when k+11 is absent), creating a false-positive
    merge into entity k+11 whenever k and k+11 share (nation, segment).
    Components stay diameter <= 2 with a base-node center, so the oracle
    replays canonical = min in closed form while Spark runs the real CC."""
    from .linking.blocking import blocked_match_scores
    from .linking.canonicalize import connected_components
    from .linking.er_eval import clustering_eval

    cust = _t(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    )
    nxt = base.select(
        (F.col("id") - 11).alias("id"),
        F.col("name").alias("rname"),
        F.col("nation").alias("rnation"),
        F.col("segment").alias("rsegment"),
    )
    pert = (
        base.join(nxt, "id", "left")
        .select(
            (F.col("id") + 1000000).alias("id"),
            F.when(
                F.col("id") % 22 == 0,
                F.coalesce("rname", F.concat("name", F.lit("R"))),
            )
            .when(F.col("id") % 5 == 0, F.concat("name", F.lit("X")))
            .otherwise(F.col("name"))
            .alias("name"),
            "nation",
            "segment",
        )
    )
    edges = blocked_match_scores(
        base,
        pert,
        id_col="id",
        blocks=[["nation", "segment"]],
        agreements=[("name", 10)],
        min_score=10,
    ).select(F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    recs = base.select("id").unionByName(pert.select("id"))
    cc = connected_components(
        edges, all_nodes=recs.select(F.col("id").alias("node"))
    )
    labeled = cc.select(
        F.col("component").alias("pred"),
        (F.col("node") % 1000000).alias("gold"),
    )
    return clustering_eval(labeled)


ER_CLUSTERING_EVAL_SQL = """
WITH base AS (
  SELECT c_custkey AS k, c_name AS name, c_nationkey AS n, c_mktsegment AS s
  FROM customer
),
pcl AS (
  SELECT b.k + 1000000 AS id,
         CASE WHEN b.k % 22 = 0 THEN
                CASE WHEN nb.k IS NOT NULL AND nb.n = b.n AND nb.s = b.s
                     THEN b.k + 11 ELSE b.k + 1000000 END
              WHEN b.k % 5 = 0 THEN b.k + 1000000
              ELSE b.k END AS pred,
         b.k AS gold
  FROM base b LEFT JOIN base nb ON nb.k = b.k + 11
),
l AS (
  SELECT k AS id, k AS pred, k AS gold FROM base
  UNION ALL SELECT id, pred, gold FROM pcl
),
cells AS (SELECT pred, gold, CAST(count(*) AS BIGINT) AS c FROM l GROUP BY 1, 2),
ps AS (SELECT pred, CAST(count(*) AS BIGINT) AS np FROM l GROUP BY 1),
gs AS (SELECT gold, CAST(count(*) AS BIGINT) AS ng FROM l GROUP BY 1),
cs AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_records,
         CAST(sum(c * (c - 1) // 2) AS BIGINT) AS tp_pairs,
         CAST(sum(c * ((c * 1000000) // np)) AS BIGINT) AS b3p,
         CAST(sum(c * ((c * 1000000) // ng)) AS BIGINT) AS b3r
  FROM cells JOIN ps USING (pred) JOIN gs USING (gold)
),
pp AS (SELECT CAST(count(*) AS BIGINT) AS n_pred,
              CAST(sum(np * (np - 1) // 2) AS BIGINT) AS pred_pairs FROM ps),
gp AS (SELECT CAST(count(*) AS BIGINT) AS n_gold,
              CAST(sum(ng * (ng - 1) // 2) AS BIGINT) AS gold_pairs FROM gs)
SELECT n_records, n_pred, n_gold, pred_pairs, gold_pairs, tp_pairs,
       CAST(tp_pairs * 1000000 // nullif(pred_pairs, 0) AS BIGINT) AS pair_p_x1e6,
       CAST(tp_pairs * 1000000 // nullif(gold_pairs, 0) AS BIGINT) AS pair_r_x1e6,
       CAST(2 * tp_pairs * 1000000 // nullif(pred_pairs + gold_pairs, 0) AS BIGINT) AS pair_f1_x1e6,
       CAST(b3p // nullif(n_records, 0) AS BIGINT) AS b3_p_x1e6,
       CAST(b3r // nullif(n_records, 0) AS BIGINT) AS b3_r_x1e6
FROM cs, pp, gp
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
    from .extraction.gazetteer import gazetteer_match

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


def q_temporal_kg_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time KG snapshot: the temporal-scoping read that the SCD-2
    fact table exists for — "what did the graph believe at T" (north-star
    temporal ordering surface; the reference keeps only current values,
    make_narrative_graph's dict overwrite). Composes the gated
    scd2_compact on the same (user, event_type) fixture, then selects the
    interval covering T = 2024-01-15 00:00:00: valid_from <= T < valid_to
    (open current run counts). Half-open semantics make the snapshot
    unique per key by construction. At rest this is the partition-pruned
    read of a history table partitioned on a valid_to bucket — a filter,
    never a window."""
    from .operators.temporal import scd2_compact

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") / 25).cast("long").alias("v"),
    )
    out = scd2_compact(
        ev, keys=["user_id", "event_type"], value_col="v", tiebreak="event_id"
    )
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return out.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select(
        "user_id",
        "event_type",
        "value",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("from_str"),
        "n_obs",
    )


TEMPORAL_KG_ASOF_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id, ts,
         CAST(floor(value / 25) AS BIGINT) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(v) OVER w IS NOT DISTINCT FROM v THEN 0 ELSE 1 END
              AS chg
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
),
isl AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id, event_type
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged
),
runs AS (
  SELECT user_id, event_type, island, min(v) AS value,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_obs
  FROM isl GROUP BY user_id, event_type, island
),
iv AS (
  SELECT user_id, event_type, value, valid_from, n_obs,
         lead(valid_from) OVER (PARTITION BY user_id, event_type
                                ORDER BY valid_from) AS valid_to
  FROM runs
)
SELECT user_id, event_type, value,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS from_str, n_obs
FROM iv
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
"""



# ---------------------------------------------------------------------------
# Q: strongly connected components of the nation trade-flow digraph
# ---------------------------------------------------------------------------

# Shared fragment: directed nation->nation trade flows (customer nation ships
# demand to supplier nation), the relational digraph the SCC/SSSP operators
# condense. count(*) is BIGINT in both engines.
FLOWS_FRAGMENT = """
flows AS (
  SELECT cn.n_name AS src, sn.n_name AS dst, CAST(count(*) AS BIGINT) AS n_flows
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE cn.n_name <> sn.n_name
  GROUP BY 1, 2
)
"""


def _nation_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n_flows): mirrors FLOWS_FRAGMENT. nation is 25 rows ->
    broadcast twice; the lineitem->orders->customer chain shuffles on its
    natural keys and the final agg is 625-key map-side combined."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("src"))),
            F.col("c_nationkey") == F.col("ck"),
        )
        .join(
            F.broadcast(n.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("dst"))),
            F.col("s_nationkey") == F.col("sk"),
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n_flows"))
    )


def q_scc_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC over the thresholded trade digraph (keep edges whose flow count
    is at least half the max flow): a dense mutual-trade core plus
    peripheral one-way exporters/importers, so the run exercises trim,
    color, AND mark. scc = min member nation name; the oracle recomputes
    it from recursive-CTE mutual reachability."""
    from .operators.graph_algos import strongly_connected_components

    flows = _nation_flows(spark, sf_dir)
    mx = flows.agg(F.max("n_flows").alias("m"))
    edges = (
        flows.crossJoin(F.broadcast(mx))
        .filter(F.col("n_flows") * 2 >= F.col("m"))
        .select("src", "dst")
    )
    return strongly_connected_components(edges).select("node", "scc")


SCC_NATIONS_SQL = f"""
WITH RECURSIVE {FLOWS_FRAGMENT.strip()},
mx AS (SELECT max(n_flows) AS m FROM flows),
edges AS (SELECT src, dst FROM flows, mx WHERE n_flows * 2 >= m),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
mutual AS (
  SELECT a.src AS node, a.dst AS m
  FROM reach a JOIN reach b ON a.src = b.dst AND a.dst = b.src
)
SELECT node, min(m) AS scc FROM (
  SELECT node, node AS m FROM nodes
  UNION ALL
  SELECT node, m FROM mutual
) GROUP BY node
"""


# ---------------------------------------------------------------------------
# Q: bounded-hop weighted shortest path over the trade-flow digraph
# ---------------------------------------------------------------------------


def q_sssp_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-round Bellman-Ford from the highest-outflow nation with integer
    "rarity" edge costs (10^6 DIV n_flows: rare trade lanes are
    expensive). Exact-integer quotients keep the oracle float-free; the
    oracle unrolls the identical 4 relaxations. The 1-row source pick is
    the only driver collect."""
    from .operators.graph_algos import bounded_sssp

    flows = _nation_flows(spark, sf_dir).localCheckpoint(eager=True)
    wedges = flows.select(
        "src", "dst", F.expr("CAST(1000000 AS BIGINT) DIV n_flows").alias("w")
    )
    src_row = (
        flows.groupBy("src")
        .agg(F.sum("n_flows").alias("t"))
        .orderBy(F.desc("t"), F.asc("src"))
        .first()
    )
    return bounded_sssp(wedges, src_row["src"], rounds=4).select("node", "dist")


def _sssp_rounds_sql(k: int) -> str:
    parts = []
    for i in range(1, k + 1):
        parts.append(
            f""",
d{i} AS (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{i - 1}
    UNION ALL
    SELECT e.dst AS node, d.dist + e.w AS dist
    FROM d{i - 1} d JOIN wedges e ON d.node = e.src
  ) GROUP BY node
)"""
        )
    return "".join(parts)


SSSP_NATIONS_SQL = f"""
WITH {FLOWS_FRAGMENT.strip()},
wedges AS (
  SELECT src, dst, CAST(1000000 AS BIGINT) // n_flows AS w FROM flows
),
totals AS (SELECT src, sum(n_flows) AS t FROM flows GROUP BY src),
src_pick AS (SELECT src AS node FROM totals ORDER BY t DESC, src ASC LIMIT 1),
d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM src_pick){_sssp_rounds_sql(4)}
SELECT node, CAST(dist AS BIGINT) AS dist FROM d4
"""



# ---------------------------------------------------------------------------
# Q: iterative truth discovery (source-reliability fusion) over event claims
# ---------------------------------------------------------------------------


def q_truth_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources are user buckets, each claiming a quantized daily value per
    event type; 2 rounds (majority vote, then reliability-weighted
    re-vote). The oracle unrolls the identical integer-exact rounds."""
    from .linking.fusion import truth_discovery

    ev = _t(spark, sf_dir, "events")
    claims = ev.select(
        (F.col("user_id") % 20).cast("long").alias("src"),
        F.col("event_type").alias("entity"),
        F.date_format("ts", "yyyy-MM-dd").alias("attr"),
        F.floor(F.col("value") / 50).cast("long").cast("string").alias("value"),
    )
    return truth_discovery(claims, rounds=2).select(
        "entity", "attr", "fused_value", "score", "n_sources"
    )


TRUTH_DISCOVERY_SQL = """
WITH claims AS (
  SELECT DISTINCT CAST(user_id % 20 AS BIGINT) AS src,
         event_type AS entity,
         strftime(ts, '%Y-%m-%d') AS attr,
         CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR) AS value
  FROM events
),
srcstats AS (
  SELECT src, CAST(count(*) AS BIGINT) AS n_claims FROM claims GROUP BY src
),
s1 AS (
  SELECT entity, attr, value, CAST(count(*) AS BIGINT) * 1000000 AS score
  FROM claims GROUP BY entity, attr, value
),
w1 AS (
  SELECT entity, attr, value AS fused_value FROM s1
  QUALIFY row_number() OVER (
    PARTITION BY entity, attr ORDER BY score DESC, value ASC) = 1
),
backing AS (
  SELECT c.src, CAST(count(*) AS BIGINT) AS n_backing
  FROM claims c JOIN w1
    ON c.entity = w1.entity AND c.attr = w1.attr AND c.value = w1.fused_value
  GROUP BY c.src
),
trust AS (
  SELECT s.src, COALESCE(b.n_backing, 0) * 1000000 // s.n_claims AS trust
  FROM srcstats s LEFT JOIN backing b ON s.src = b.src
),
s2 AS (
  SELECT entity, attr, value, CAST(sum(t.trust) AS BIGINT) AS score,
         CAST(count(*) AS BIGINT) AS n_sources
  FROM claims c JOIN trust t ON c.src = t.src
  GROUP BY entity, attr, value
)
SELECT entity, attr, value AS fused_value, score, n_sources FROM s2
QUALIFY row_number() OVER (
  PARTITION BY entity, attr ORDER BY score DESC, value ASC) = 1
"""



# ---------------------------------------------------------------------------
# Q: approximate functional-dependency profile (schema discovery)
# ---------------------------------------------------------------------------


def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four candidate FDs over events, one exact (event_id -> event_type,
    g3 = 0) and three approximate, so the profile spans both regimes."""
    from .graph.constraints import induce_fd_candidates

    ev = _t(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    return induce_fd_candidates(
        ev,
        [
            ("event2type", "event_id", "event_type"),
            ("user2type", "user_id", "event_type"),
            ("type2day", "event_type", "day"),
            ("day2type", "day", "event_type"),
        ],
    ).select("fd", "total", "n_groups", "viol_groups", "g3_x1e6")


FD_PROFILE_SQL = """
WITH ev AS (
  SELECT CAST(event_id AS VARCHAR) AS event_id,
         CAST(user_id AS VARCHAR) AS user_id,
         event_type,
         strftime(ts, '%Y-%m-%d') AS day
  FROM events
),
pairs AS (
  SELECT 'event2type' AS fd, event_id AS det, event_type AS dep FROM ev
  UNION ALL
  SELECT 'user2type' AS fd, user_id AS det, event_type AS dep FROM ev
  UNION ALL
  SELECT 'type2day' AS fd, event_type AS det, day AS dep FROM ev
  UNION ALL
  SELECT 'day2type' AS fd, day AS det, event_type AS dep FROM ev
),
vc AS (
  SELECT fd, det, dep, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY fd, det, dep
),
per_det AS (
  SELECT fd, det, CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(max(cnt) AS BIGINT) AS keep,
         CAST(count(*) AS BIGINT) AS n_vals
  FROM vc GROUP BY fd, det
)
SELECT fd, CAST(sum(n_rows) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n_vals > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS viol_groups,
       CAST((CAST(sum(n_rows) AS BIGINT) - CAST(sum(keep) AS BIGINT))
            * 1000000 // CAST(sum(n_rows) AS BIGINT) AS BIGINT) AS g3_x1e6
FROM per_det GROUP BY fd
"""



# ---------------------------------------------------------------------------
# Q: fixed-point power-iteration PCA projection over the embeddings
# ---------------------------------------------------------------------------


def q_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-direction projection of every embedding, exact
    BIGINT end to end (quantize → scatter matrix → 2 rescaled power
    steps → projection); the oracle replays the identical fixed-point
    algebra, so the gate is a full bit-match with zero float discipline."""
    from .operators.similarity import pca_power_scores

    emb = _t(spark, sf_dir, "embeddings")
    return pca_power_scores(emb, "embedding", "vec_id").select(
        "vec_id", "pc1_score"
    )


PCA_SCORES_SQL = """
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (
  SELECT vec_id,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
idx AS (SELECT unnest(generate_series(1, 64)) AS i),
qi AS (SELECT vec_id, i, CAST(q[i] AS BIGINT) AS v FROM qz, idx),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qz),
s1 AS (SELECT i, CAST(sum(v) AS BIGINT) AS s1 FROM qi GROUP BY i),
s2 AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS s2
  FROM qi a JOIN qi b USING (vec_id) GROUP BY 1, 2
),
mraw AS (
  SELECT s2.i, s2.j, CAST(nn.n * s2.s2 - sa.s1 * sb.s1 AS BIGINT) AS m
  FROM s2 CROSS JOIN nn
  JOIN s1 sa ON sa.i = s2.i
  JOIN s1 sb ON sb.i = s2.j
),
dm AS (SELECT greatest(1, CAST(max(abs(m)) AS BIGINT) // 1073741824) AS d FROM mraw),
m AS (SELECT i, j, CAST(m // (SELECT d FROM dm) AS BIGINT) AS m FROM mraw),
v1r AS (SELECT i, CAST(sum(m) AS BIGINT) AS raw FROM m GROUP BY i),
d1 AS (SELECT greatest(1, CAST(max(abs(raw)) AS BIGINT) // 65536) AS d FROM v1r),
v1 AS (SELECT i AS j, CAST(raw // (SELECT d FROM d1) AS BIGINT) AS w FROM v1r),
v2r AS (
  SELECT m.i, CAST(sum(m.m * v1.w) AS BIGINT) AS raw
  FROM m JOIN v1 ON v1.j = m.j GROUP BY m.i
),
d2 AS (SELECT greatest(1, CAST(max(abs(raw)) AS BIGINT) // 65536) AS d FROM v2r),
v2 AS (SELECT i, CAST(raw // (SELECT d FROM d2) AS BIGINT) AS w FROM v2r)
SELECT qi.vec_id, CAST(sum(qi.v * v2.w) AS BIGINT) AS pc1_score
FROM qi JOIN v2 ON v2.i = qi.i GROUP BY qi.vec_id
"""


# ---------------------------------------------------------------------------
# Q: l-diversity of event_type within (day, value-band) classes
# ---------------------------------------------------------------------------


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive attribute = event_type (5 values): l=2,4,6 spans both
    sides — every class is below l=6 by pigeonhole, few below l=2."""
    from .operators.text import l_diversity_profile

    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("vband"),
        "event_type",
    )
    return l_diversity_profile(
        ev, ["day", "vband"], "event_type", l_thresholds=(2, 4, 6)
    ).select("l", "n_classes", "classes_below", "rows_at_risk", "risk_x1e6")


L_DIVERSITY_SQL = """
WITH pv AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value / 50) AS BIGINT) AS vband,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
classes AS (
  SELECT day, vband, CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(n) AS BIGINT) AS sz
  FROM pv GROUP BY day, vband
),
fan AS (
  SELECT n_distinct, sz, l FROM classes, (VALUES (2), (4), (6)) AS t(l)
)
SELECT CAST(l AS INT) AS l,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN n_distinct < l THEN 1 ELSE 0 END) AS BIGINT)
         AS classes_below,
       CAST(sum(CASE WHEN n_distinct < l THEN sz ELSE 0 END) AS BIGINT)
         AS rows_at_risk,
       CAST(CAST(sum(CASE WHEN n_distinct < l THEN sz ELSE 0 END) AS BIGINT)
            * 1000000 // CAST(sum(sz) AS BIGINT) AS BIGINT) AS risk_x1e6
FROM fan GROUP BY l
"""


# ---------------------------------------------------------------------------
# Q: sorted-neighborhood candidate pairs over a text-prefix order
# ---------------------------------------------------------------------------


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge/purge blocking over the 16-char text prefix (corpus is
    ASCII, so the two engines' string orders agree byte-for-byte);
    window 5 emits ~5n candidate pairs."""
    from .linking.blocking import sorted_neighborhood_pairs

    docs = _t(spark, sf_dir, "documents").select(
        F.substring("text", 1, 16).alias("key"), "doc_id"
    )
    return sorted_neighborhood_pairs(docs, ["key"], "doc_id", window=5).select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    )


SNM_PAIRS_SQL = """
WITH r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY substring(text, 1, 16), doc_id) AS rank
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(b.rank - a.rank AS BIGINT) AS dist
FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank <= 5
"""


# ---------------------------------------------------------------------------
# Q: Pareto skyline of documents on (length, distinct-token count)
# ---------------------------------------------------------------------------


def q_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents no other document beats on BOTH length and vocabulary —
    the multi-criteria keep set; the oracle is the literal NOT-EXISTS
    dominance definition, so the grid-pruned two-phase plan is verified
    against brute force."""
    from .operators.sampling import skyline_2d

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_unique"),
    )
    return skyline_2d(docs, "n_chars", "n_unique", bucket_width=256).select(
        "doc_id", "n_chars", "n_unique"
    )


SKYLINE_DOCS_SQL = """
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_unique
  FROM documents
)
SELECT r.doc_id, r.n_chars, r.n_unique FROM d r
WHERE NOT EXISTS (
  SELECT 1 FROM d s
  WHERE s.n_chars >= r.n_chars AND s.n_unique >= r.n_unique
    AND (s.n_chars > r.n_chars OR s.n_unique > r.n_unique)
)
"""


# ---------------------------------------------------------------------------
# Q: coalesce per-(user, type) activity intervals (gaps-and-islands)
# ---------------------------------------------------------------------------


def q_coalesce_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event opens a 1-hour activity window; overlapping windows per
    (user, event_type) conflate to disjoint validity intervals — ~13
    events per key over 30 days yields a mix of singletons and chained
    merges."""
    from .operators.temporal import coalesce_intervals

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_timestamp("ts").alias("start"),
        (F.unix_timestamp("ts") + 3600).alias("end"),
    )
    return coalesce_intervals(
        ev, ["user_id", "event_type"], "start", "end"
    ).select("user_id", "event_type", "start", "end", "n_merged")


COALESCE_INTERVALS_SQL = """
WITH iv AS (
  SELECT user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e
  FROM events
),
flg AS (
  SELECT user_id, event_type, s, e,
         CASE WHEN max(e) OVER w IS NULL OR s > max(e) OVER w
              THEN 1 ELSE 0 END AS nw
  FROM iv
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl AS (
  SELECT user_id, event_type, s, e,
         sum(nw) OVER (PARTITION BY user_id, event_type ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM flg
)
SELECT user_id, event_type,
       CAST(min(s) AS BIGINT) AS start,
       CAST(max(e) AS BIGINT) AS "end",
       CAST(count(*) AS BIGINT) AS n_merged
FROM isl GROUP BY user_id, event_type, island
"""


# ---------------------------------------------------------------------------
# Q: modularity of the region partition over the nation trade graph
# ---------------------------------------------------------------------------


def q_modularity_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-partition quality over the undirected nation-trade graph:
    trade is global, so the readout shows WEAK community structure
    (q_x1e6 near or below zero per region) — the evaluation companion to
    label_propagation/cc clustering."""
    from .operators.graph_algos import modularity_profile

    flows = _nation_flows(spark, sf_dir)
    und = flows.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    n = _t(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    comm = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_name").alias("node"), F.col("r_name").alias("community"))
    return modularity_profile(und, comm).select(
        "community", "n_nodes", "degree_sum", "intra_edges", "q_x1e6"
    )


MODULARITY_REGIONS_SQL = f"""
WITH {FLOWS_FRAGMENT.strip().lstrip()},
und AS (
  SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst FROM flows
),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM und),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT src AS n FROM und UNION ALL SELECT dst AS n FROM und)
  GROUP BY n
),
comm AS (
  SELECT n_name AS node, r_name AS community
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
dc AS (
  SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(deg) AS BIGINT) AS degree_sum
  FROM deg JOIN comm ON deg.n = comm.node GROUP BY community
),
intra AS (
  SELECT cs.community, CAST(count(*) AS BIGINT) AS intra_edges
  FROM und
  JOIN comm cs ON und.src = cs.node
  JOIN comm cd ON und.dst = cd.node
  WHERE cs.community = cd.community
  GROUP BY cs.community
)
SELECT dc.community, dc.n_nodes, dc.degree_sum,
       CAST(coalesce(intra.intra_edges, 0) AS BIGINT) AS intra_edges,
       CAST((coalesce(intra.intra_edges, 0) * 1000000 // mm.m)
            - ((dc.degree_sum * 1000 // (2 * mm.m))
               * (dc.degree_sum * 1000 // (2 * mm.m))
               * 1000000 // (1000 * 1000)) AS BIGINT) AS q_x1e6
FROM dc LEFT JOIN intra ON dc.community = intra.community CROSS JOIN mm
"""


# ---------------------------------------------------------------------------
# Q: t-closeness of event_type within (day, value-band) classes
# ---------------------------------------------------------------------------


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same (day, vband) classes as l_diversity so the two readouts
    compose into one governance report; thresholds straddle the observed
    per-class TVD range so classes_above is non-trivial at every t."""
    from .operators.text import t_closeness_profile

    ev = _t(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / 50).cast("long").alias("vband"),
        "event_type",
    )
    return t_closeness_profile(
        ev, ["day", "vband"], "event_type",
        t_thresholds_x1e6=(50000, 150000, 300000),
    ).select("t_x1e6", "n_classes", "classes_above", "rows_at_risk", "risk_x1e6")


T_CLOSENESS_SQL = """
WITH pv AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value / 50) AS BIGINT) AS vband,
         event_type AS v, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2, 3
),
gv AS (SELECT v, CAST(sum(n) AS BIGINT) AS gn FROM pv GROUP BY v),
tt AS (SELECT CAST(sum(gn) AS BIGINT) AS total FROM gv),
cl AS (
  SELECT day, vband,
         CAST(sum(abs(n * total - gn * sz)) AS BIGINT) AS present,
         CAST(sum(gn) AS BIGINT) AS covered,
         CAST(max(sz) AS BIGINT) AS sz, CAST(max(total) AS BIGINT) AS total
  FROM (
    SELECT pv.day, pv.vband, pv.n, gv.gn, tt.total,
           CAST(sum(pv.n) OVER (PARTITION BY pv.day, pv.vband) AS BIGINT) AS sz
    FROM pv JOIN gv USING (v) CROSS JOIN tt
  ) GROUP BY day, vband
),
dist AS (
  SELECT sz, total,
         CAST((present + sz * (total - covered)) * 1000000
              // (2 * sz * total) AS BIGINT) AS d
  FROM cl
),
fan AS (
  SELECT sz, total, d, t
  FROM dist, (VALUES (50000), (150000), (300000)) AS th(t)
)
SELECT CAST(t AS INT) AS t_x1e6,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN d > t THEN 1 ELSE 0 END) AS BIGINT) AS classes_above,
       CAST(sum(CASE WHEN d > t THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(CAST(sum(CASE WHEN d > t THEN sz ELSE 0 END) AS BIGINT) * 1000000
            // CAST(max(total) AS BIGINT) AS BIGINT) AS risk_x1e6
FROM fan GROUP BY t
"""


# ---------------------------------------------------------------------------
# Q: time-series resample + gap-fill (linear) per (event_type, user)
# ---------------------------------------------------------------------------


def q_resample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6h buckets per (event_type, user_id): ~13 events per key over 30
    days → most of the 120-slot spine is gaps, exercising interpolation,
    boundary fallbacks, and the obs path in one run."""
    from .operators.temporal import resample_timeseries

    ev = _t(spark, sf_dir, "events")
    return resample_timeseries(
        ev, keys=["event_type", "user_id"], bucket_seconds=21600,
        value_scale=100, method="linear",
    ).select("event_type", "user_id", "bucket_ts", "n_events", "v_x", "fill")


RESAMPLE_GAPFILL_SQL = """
WITH obs AS (
  SELECT event_type, user_id,
         CAST(floor(epoch(ts) / 21600) AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // count(*)
              AS BIGINT) AS v_obs
  FROM events GROUP BY 1, 2, 3
),
bounds AS (
  SELECT event_type, user_id, min(b) AS lo, max(b) AS hi
  FROM obs GROUP BY 1, 2
),
spine AS (
  SELECT event_type, user_id, unnest(generate_series(lo, hi)) AS b
  FROM bounds
),
grid AS (
  SELECT s.event_type, s.user_id, s.b, o.n_events, o.v_obs,
         CASE WHEN o.n_events IS NOT NULL THEN 'obs' ELSE 'gap' END AS fill
  FROM spine s
  LEFT JOIN obs o ON o.event_type = s.event_type
    AND o.user_id = s.user_id AND o.b = s.b
),
w AS (
  SELECT *,
    last_value(v_obs IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
    last_value(CASE WHEN fill = 'obs' THEN b END IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
    first_value(v_obs IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
    first_value(CASE WHEN fill = 'obs' THEN b END IGNORE NULLS) OVER
      (PARTITION BY event_type, user_id ORDER BY b
       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
  FROM grid
)
SELECT event_type, user_id, b * 21600 AS bucket_ts,
       CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
       CAST(CASE WHEN fill = 'obs' THEN v_obs
                 WHEN pv IS NULL THEN nv
                 WHEN nv IS NULL THEN pv
                 ELSE pv + (nv - pv) * (b - pb) // (nb - pb)
            END AS BIGINT) AS v_x,
       fill
FROM w
"""


# ---------------------------------------------------------------------------
# Q: CUSUM level-shift alarms over daily event-type rates
# ---------------------------------------------------------------------------


def q_cusum_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic events table is rate-uniform, so a deterministic
    level shift is injected in-query: 'click' events from Jan 21 on are
    duplicated (rate doubles for the last third). CUSUM accumulates the
    sustained surplus and alarms in the shifted tail; the other four keys
    stay silent, proving the max(0, .) reset absorbs uniform noise. The
    oracle replays the identical union + prefix-sum identity."""
    from .operators.temporal import cusum_alarms

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return cusum_alarms(
        ev.unionAll(shift), key="event_type", ts_col="ts",
        bucket="day", thr_buckets=2,
    ).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_events", "s_scaled", "total_events", "n_buckets",
    )


CUSUM_LEVEL_SHIFT_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS bucket_ts,
         CAST(count(*) AS BIGINT) AS n_events
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total_events,
         CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY event_type
),
st AS (
  SELECT c.event_type, c.bucket_ts, c.n_events, p.total_events, p.n_buckets,
         CAST(sum(c.n_events * p.n_buckets - p.total_events) OVER w
              AS BIGINT) AS pre
  FROM cnt c JOIN pk p USING (event_type)
  WINDOW w AS (PARTITION BY c.event_type ORDER BY c.bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s2 AS (
  SELECT event_type, bucket_ts, n_events, total_events, n_buckets,
         CAST(pre - least(CAST(0 AS BIGINT), min(pre) OVER
              (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
              AS BIGINT) AS s_scaled
  FROM st
)
SELECT event_type, strftime(bucket_ts, '%Y-%m-%d') AS day,
       n_events, s_scaled, total_events, n_buckets
FROM s2 WHERE s_scaled > 2 * total_events
"""


# ---------------------------------------------------------------------------
# Q: rdfs:domain/range induction over a TPC-H entity KG
# ---------------------------------------------------------------------------


def q_domain_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KG built in-query from TPC-H entities (shared _tpch_kg fixture):
    in_nation has a MIXED domain (customers outnumber suppliers 15:1 —
    share ~937500), in_region is clean; nations/regions are multi-typed
    with 'Place' so the extensional counting path is exercised."""
    from .graph.constraints import induce_domain_range

    triples, types = _tpch_kg(spark, sf_dir)
    return induce_domain_range(triples, types).select(
        "p", "n_triples", "domain_type", "domain_share_x1e6",
        "range_type", "range_share_x1e6",
    )


DOMAIN_RANGE_KG_SQL = """
WITH triples AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS s, 'in_nation' AS p,
         'n' || CAST(c_nationkey AS VARCHAR) AS o FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 'in_nation',
         'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'in_region',
         'r' || CAST(n_regionkey AS VARCHAR) FROM nation
),
types AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node, 'Customer' AS typ
  FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 'Supplier' FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'Place' FROM nation
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'Region' FROM region
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'Place' FROM region
),
nt AS (SELECT p, CAST(count(*) AS BIGINT) AS n_triples FROM triples GROUP BY p),
dside AS (
  SELECT p, typ, CAST(count(*) AS BIGINT) AS cnt
  FROM triples JOIN types ON triples.s = types.node GROUP BY p, typ
),
dtop AS (
  SELECT p, typ, cnt,
         CAST(sum(cnt) OVER (PARTITION BY p) AS BIGINT) AS typed,
         row_number() OVER (PARTITION BY p ORDER BY cnt DESC, typ DESC) AS rn
  FROM dside
),
rside AS (
  SELECT p, typ, CAST(count(*) AS BIGINT) AS cnt
  FROM triples JOIN types ON triples.o = types.node GROUP BY p, typ
),
rtop AS (
  SELECT p, typ, cnt,
         CAST(sum(cnt) OVER (PARTITION BY p) AS BIGINT) AS typed,
         row_number() OVER (PARTITION BY p ORDER BY cnt DESC, typ DESC) AS rn
  FROM rside
)
SELECT nt.p, nt.n_triples,
       d.typ AS domain_type,
       CAST(coalesce(d.cnt * 1000000 // d.typed, 0) AS BIGINT)
         AS domain_share_x1e6,
       r.typ AS range_type,
       CAST(coalesce(r.cnt * 1000000 // r.typed, 0) AS BIGINT)
         AS range_share_x1e6
FROM nt
LEFT JOIN (SELECT * FROM dtop WHERE rn = 1) d ON nt.p = d.p
LEFT JOIN (SELECT * FROM rtop WHERE rn = 1) r ON nt.p = r.p
"""


# ---------------------------------------------------------------------------
# Q: vocabulary rank movers between doc-id halves
# ---------------------------------------------------------------------------


def q_term_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank_movers applied to token frequencies of the corpus's doc-id
    halves — the vocabulary-shift readout (same-distribution halves, so
    moves are sampling noise: the null calibration again)."""
    from .operators.ranking import rank_movers

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    half = toks.agg(F.max("doc_id")).first()[0] // 2
    a = toks.filter(F.col("doc_id") <= half).select("tok")
    b = toks.filter(F.col("doc_id") > half).select("tok")
    return rank_movers(a, b, "tok").select(
        "key", "n_a", "n_b", "rank_a", "rank_b", "rank_delta", "status"
    )


TERM_MOVERS_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(
    regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
tk AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
h AS (SELECT CAST(max(doc_id) AS BIGINT) // 2 AS m FROM tk),
ca AS (
  SELECT tok AS key, CAST(count(*) AS BIGINT) AS n_a
  FROM tk, h WHERE doc_id <= h.m GROUP BY tok
),
cb AS (
  SELECT tok AS key, CAST(count(*) AS BIGINT) AS n_b
  FROM tk, h WHERE doc_id > h.m GROUP BY tok
),
ra AS (
  SELECT key, n_a, CAST(row_number() OVER (ORDER BY n_a DESC, key ASC)
         AS BIGINT) AS rank_a FROM ca
),
rb AS (
  SELECT key, n_b, CAST(row_number() OVER (ORDER BY n_b DESC, key ASC)
         AS BIGINT) AS rank_b FROM cb
)
SELECT coalesce(ra.key, rb.key) AS key, n_a, n_b, rank_a, rank_b,
       CAST(rank_a - rank_b AS BIGINT) AS rank_delta,
       CASE WHEN rank_a IS NULL THEN 'new'
            WHEN rank_b IS NULL THEN 'vanished'
            WHEN rank_a - rank_b <> 0 THEN 'moved'
            ELSE 'steady' END AS status
FROM ra FULL OUTER JOIN rb ON ra.key = rb.key
"""


# ---------------------------------------------------------------------------
# Q: inter-arrival gap histogram per event type
# ---------------------------------------------------------------------------


def q_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~2000 events per type over 30 days → mean gap ~20 min: mass
    concentrates in the lt_1h band with honest tails both ways — the
    empirical input to sessionize's threshold."""
    from .operators.temporal import gap_histogram

    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    return gap_histogram(ev, id_col="event_id").select(
        "event_type", "band", "n", "share_x1e6"
    )


GAP_HISTOGRAM_SQL = """
WITH g AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gp
  FROM events
),
banded AS (
  SELECT event_type,
         CASE WHEN gp < 60 THEN 'lt_1m'
              WHEN gp < 600 THEN 'lt_10m'
              WHEN gp < 3600 THEN 'lt_1h'
              WHEN gp < 21600 THEN 'lt_6h'
              WHEN gp < 86400 THEN 'lt_1d'
              ELSE 'ge_1d' END AS band
  FROM g WHERE gp IS NOT NULL
),
c AS (
  SELECT event_type, band, CAST(count(*) AS BIGINT) AS n
  FROM banded GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
SELECT c.event_type, c.band, c.n,
       CAST(c.n * 1000000 // t.tot AS BIGINT) AS share_x1e6
FROM c JOIN t ON c.event_type = t.event_type
"""


# ---------------------------------------------------------------------------
# Q: hour-of-day x day-of-week seasonal profile
# ---------------------------------------------------------------------------


def q_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity rhythm of the events stream — uniform by construction, so
    every occupied cell's share hovers near 1/168; the value is the
    engine-neutral calendar arithmetic being hash-gated."""
    from .operators.temporal import seasonal_profile

    ev = _t(spark, sf_dir, "events").select("ts")
    return seasonal_profile(ev).select("dow", "hour", "n", "share_x1e6")


SEASONAL_PROFILE_SQL = """
WITH c AS (
  SELECT CAST((CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS INT)
           AS dow,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS INT)
           AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
SELECT dow, hour, n,
       CAST(n * 1000000 // t.tot AS BIGINT) AS share_x1e6
FROM c CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Q: blocking quality of sorted-neighborhood vs exact-dup gold pairs
# ---------------------------------------------------------------------------


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does window-5 prefix blocking keep the true exact-duplicate pairs?
    Gold = pairs sharing the normalized-text md5; candidates = the gated
    snm_pairs set. Exact dups share their 16-char prefix, so PC should
    read high while RR stays near 1 — the combination that justifies the
    blocker. Runs one eager count (n_records), like tfidf's documented
    exception."""
    from .linking.blocking import sorted_neighborhood_pairs
    from .linking.er_eval import blocking_quality

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.substring("text", 1, 16).alias("key")
    )
    n = docs.count()
    cand = sorted_neighborhood_pairs(
        docs.select("key", "doc_id"), ["key"], "doc_id", window=5
    )
    fp = docs.select(
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("f"),
        "doc_id",
    )
    gold = (
        fp.alias("x")
        .join(fp.alias("y"), "f")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
    )
    return blocking_quality(cand, gold, n_records=n).select(
        "n_records", "n_candidates", "n_gold", "n_covered", "all_pairs",
        "rr_x1e6", "pc_x1e6",
    )


BLOCKING_QUALITY_SQL = r"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents),
r AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY substring(text, 1, 16), doc_id) AS rank
  FROM documents
),
cand AS (
  SELECT DISTINCT least(a.doc_id, b.doc_id) AS pa,
         greatest(a.doc_id, b.doc_id) AS pb
  FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank <= 5
),
fp AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
         doc_id
  FROM documents
),
gold AS (
  SELECT DISTINCT least(x.doc_id, y.doc_id) AS pa,
         greatest(x.doc_id, y.doc_id) AS pb
  FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
),
cov AS (
  SELECT g.pa, g.pb FROM gold g JOIN cand c ON g.pa = c.pa AND g.pb = c.pb
)
SELECT n.c AS n_records,
       (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_candidates,
       (SELECT CAST(count(*) AS BIGINT) FROM gold) AS n_gold,
       (SELECT CAST(count(*) AS BIGINT) FROM cov) AS n_covered,
       CAST(n.c * (n.c - 1) // 2 AS BIGINT) AS all_pairs,
       CAST((n.c * (n.c - 1) // 2 - (SELECT count(*) FROM cand)) * 1000000
            // (n.c * (n.c - 1) // 2) AS BIGINT) AS rr_x1e6,
       CAST(CASE WHEN (SELECT count(*) FROM gold) = 0 THEN 0
                 ELSE (SELECT count(*) FROM cov) * 1000000
                      // (SELECT count(*) FROM gold) END AS BIGINT)
         AS pc_x1e6
FROM n
"""


# ---------------------------------------------------------------------------
# Q: cross-source duplicate overlap matrix
# ---------------------------------------------------------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic 'mirror' feed re-serves every 20th document (and
    every 40th TWICE, populating the mirror's own diagonal), so the
    matrix shows exactly the cross-source and within-source duplicate
    mass the operator exists to expose."""
    from .operators.dedup import source_overlap_matrix

    docs = _t(spark, sf_dir, "documents").select("source", "text", "doc_id")
    mirror = docs.filter(F.col("doc_id") % 20 == 0).select(
        F.lit("mirror").alias("source"), "text", "doc_id"
    )
    mirror2 = docs.filter(F.col("doc_id") % 40 == 0).select(
        F.lit("mirror").alias("source"), "text", "doc_id"
    )
    return source_overlap_matrix(
        docs.unionAll(mirror).unionAll(mirror2).select("source", "text")
    ).select("source_a", "source_b", "n_shared")


SOURCE_OVERLAP_SQL = r"""
WITH d AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror', text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT 'mirror', text FROM documents WHERE doc_id % 40 = 0
),
fp AS (
  SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f,
         source AS s
  FROM d
),
per AS (
  SELECT f, s, CAST(count(*) AS BIGINT) AS n FROM fp GROUP BY f, s
)
SELECT a.s AS source_a, b.s AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM per a JOIN per b ON a.f = b.f AND a.s <= b.s
WHERE a.s <> b.s OR a.n > 1
GROUP BY a.s, b.s
"""


# ---------------------------------------------------------------------------
# Q: quality-ranked token-budget planning curve
# ---------------------------------------------------------------------------


def q_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Take the best-scoring documents until the token budget" as a
    planning table: per classifier-score band (descending), cumulative
    docs and whitespace tokens — the curve a data lead reads the budget
    off before launching the mixture job (budget_sample then executes
    it). Cumulative window runs over the ≤20 collapsed bands."""
    from .operators.classifier import classify_documents

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", (F.col("lang") == "en").cast("long")
    )
    scored = classify_documents(docs, label_col="is_en", min_count=5).select(
        F.col("id").alias("doc_id"), "score_x1e6"
    )
    toks = docs.select(
        "doc_id",
        F.size(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "))
        .cast("long")
        .alias("__t"),
    )
    banded = (
        scored.join(toks, "doc_id")
        .select(
            F.expr("score_x1e6 DIV 50000").cast("long").alias("band"), "__t"
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
        )
    )
    w = Window.orderBy(F.desc("band")).rowsBetween(Window.unboundedPreceding, 0)
    return banded.select(
        "band",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.sum("n_docs").over(w).cast("long").alias("cum_docs"),
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
    )


BUDGET_CURVE_SQL = r"""
WITH tok AS (
  SELECT doc_id AS id,
         CAST(lang = 'en' AS BIGINT) AS is_pos,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
model AS (
  SELECT tok,
         CAST(sum(is_pos) AS BIGINT) AS n_pos,
         CAST(sum(1 - is_pos) AS BIGINT) AS n_neg
  FROM tok GROUP BY 1 HAVING count(*) >= 5
),
m2 AS (
  SELECT tok, (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS aff FROM model
),
sc AS (
  SELECT id, CAST(sum(aff) // count(*) AS BIGINT) AS score
  FROM tok JOIN m2 USING (tok) GROUP BY 1
),
tl AS (
  SELECT doc_id AS id,
         CAST(len(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
           AS BIGINT) AS t
  FROM documents
),
banded AS (
  SELECT CAST(sc.score // 50000 AS BIGINT) AS band,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tl.t) AS BIGINT) AS n_tokens
  FROM sc JOIN tl ON sc.id = tl.id
  GROUP BY 1
)
SELECT band, n_docs, n_tokens,
       CAST(sum(n_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens
FROM banded
WINDOW w AS (ORDER BY band DESC ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Q: per-label centroid shift between vec_id-parity snapshot halves
# ---------------------------------------------------------------------------


def q_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even vs odd vec_ids stand in for two snapshots: same distribution,
    so shifts are small sampling noise — the null calibration a monitor
    alerts against; exactness (not magnitude) is what the gate checks."""
    from .operators.similarity import centroid_shift

    emb = _t(spark, sf_dir, "embeddings").select("label", "embedding", "vec_id")
    a = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("label").alias("src"), "embedding"
    )
    b = emb.filter(F.col("vec_id") % 2 == 1).select(
        F.col("label").alias("src"), "embedding"
    )
    return centroid_shift(a, b, "src", scale=1000).select(
        F.col("key").cast("int").alias("label"), "n_a", "n_b", "dim", "shift_sq"
    )


CENTROID_SHIFT_SQL = """
WITH q AS (
  SELECT label, vec_id % 2 AS half, CAST(i - 1 AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
  WHERE embedding IS NOT NULL
),
m AS (
  SELECT label, half, dim, CAST(sum(val) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY 1, 2, 3
),
c AS (SELECT label, half, dim, s // n AS v, n FROM m),
j AS (
  SELECT a.label, a.dim, a.v AS va, b.v AS vb, a.n AS n_a, b.n AS n_b
  FROM c a JOIN c b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 0 AND b.half = 1
)
SELECT CAST(label AS INT) AS label,
       CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       CAST(count(*) AS INT) AS dim,
       CAST(sum((va - vb) * (va - vb)) AS BIGINT) AS shift_sq
FROM j GROUP BY label
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
    from .operators.dialogue import transcript_conformance

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
# Q: bag-of-words duplicate groups over documents
# ---------------------------------------------------------------------------


def q_bow_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-duplicates are injected deterministically (every 20th doc
    gets a token-REVERSED twin at id+10^9 — same multiset, different
    surface), proving the bag key groups what exact dedup cannot; both
    engines replay the reversal."""
    from .operators.dedup import bow_dup_groups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = docs.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 1000000000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
    )
    return bow_dup_groups(docs.unionAll(twins), min_group=2).select(
        "bow_fp", "group_size", "rep_id"
    )


BOW_DUPS_SQL = r"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000000,
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
  FROM documents WHERE doc_id % 20 = 0
),
fp AS (
  SELECT doc_id,
         md5(array_to_string(list_sort(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')), ' '))
           AS bow_fp
  FROM d
)
SELECT bow_fp, CAST(count(*) AS BIGINT) AS group_size,
       CAST(min(doc_id) AS BIGINT) AS rep_id
FROM fp GROUP BY bow_fp HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# Q: order-independent partition checksums of the orders table
# ---------------------------------------------------------------------------


def q_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity manifest of orders partitioned by order status: count +
    additive md5-int checksum over (o_orderkey, o_custkey, o_orderdate) —
    the copy-validation readout two engines can compute independently and
    compare, which is exactly what the gate does."""
    from .io.catalog import partition_checksums

    o = _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("od"),
    )
    return partition_checksums(
        o, "o_orderstatus", cols=["o_orderkey", "o_custkey", "od"]
    ).select("partition", "n_rows", "checksum")


PARTITION_CHECKSUMS_SQL = """
SELECT o_orderstatus AS partition,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CAST(concat('0x', substr(md5(
              CAST(o_orderkey AS VARCHAR) || '|' ||
              CAST(o_custkey AS VARCHAR) || '|' ||
              strftime(o_orderdate, '%Y-%m-%d')), 1, 8)) AS BIGINT))
            AS BIGINT) AS checksum
FROM orders GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Q: hard-negative mining over the embeddings table
# ---------------------------------------------------------------------------


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cross-label neighbors from a 20-candidate window per anchor —
    the contrastive-training pair miner; the oracle replays the full n²
    quantized-cosine ranking, the candidate cut, the cross-label filter,
    and the re-rank."""
    from .operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return hard_negatives(emb, k=3, candidates=20).select(
        "anchor_id", "neg_id", "neg_rank", "cos_x1e6"
    )


HARD_NEGATIVES_SQL = """
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
qz AS (
  SELECT vec_id, label,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0
                   / list_max(list_transform(v, y -> abs(y))) + 0.5)
                   AS INTEGER))
         END AS q
  FROM emb
),
qn AS (
  SELECT vec_id, label, q,
         CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT)
              * CAST(x AS BIGINT))) AS BIGINT) AS n2
  FROM qz
),
sims AS (
  SELECT a.vec_id AS query_id, a.label AS ol, b.vec_id AS vid,
         b.label AS nl,
         CAST(list_sum(list_transform(list_zip(a.q, b.q),
              x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
         / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) AS qcos
  FROM qn a JOIN qn b ON true
),
ranked AS (
  SELECT query_id, ol, vid, nl, qcos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qcos DESC, vid ASC) AS rn
  FROM sims
),
cand AS (
  SELECT query_id, ol, vid, nl, qcos
  FROM ranked WHERE rn <= 20 AND vid <> query_id
),
cross_lab AS (
  SELECT query_id, vid, qcos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY floor(qcos * 1000000 + 0.5) DESC,
                                     vid ASC) AS neg_rank
  FROM cand WHERE nl <> ol
)
SELECT query_id AS anchor_id, vid AS neg_id,
       CAST(neg_rank AS INT) AS neg_rank,
       CAST(floor(qcos * 1000000 + 0.5) AS BIGINT) AS cos_x1e6
FROM cross_lab WHERE neg_rank <= 3
"""


# ---------------------------------------------------------------------------
# Q: end-to-end SFT curation pipeline (filter -> dedup -> fold -> account)
# ---------------------------------------------------------------------------


def q_sft_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The integration composition a training-data team actually ships:
    quality filter (length + lang) -> exact dedup (min-id representative
    per normalized text) -> group-aware 3-fold split -> per-fold document
    / token / char accounting. Four individually-gated stages chained;
    the oracle replays the whole flow in one CTE chain."""
    from .operators.dedup import exact_dedup
    from .operators.sampling import group_kfold

    docs = _t(spark, sf_dir, "documents").filter(
        (F.col("n_chars") >= 50) & (F.col("lang") == "en")
    )
    kept = exact_dedup(docs, text_col="text", id_col="doc_id")
    folded = group_kfold(kept, "doc_id", k=3, seed=23)
    toks = F.size(F.split(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "))
    return (
        folded.select("fold", toks.cast("long").alias("__t"),
                      F.col("n_chars").cast("long").alias("__c"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
            F.sum("__c").cast("long").alias("n_chars"),
        )
    )


SFT_PIPELINE_SQL = r"""
WITH filt AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE n_chars >= 50 AND lang = 'en'
),
norm AS (
  SELECT doc_id, text, n_chars,
         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nt
  FROM filt
),
keep AS (
  SELECT nt, min(doc_id) AS doc_id FROM norm GROUP BY nt
),
kept AS (
  SELECT n.doc_id, n.text, n.n_chars, n.nt
  FROM norm n JOIN keep k ON n.doc_id = k.doc_id AND n.nt = k.nt
),
folded AS (
  SELECT CAST(CAST(concat('0x', substr(md5('23:' || CAST(doc_id AS VARCHAR)),
              1, 8)) AS BIGINT) % 3 AS INT) AS fold,
         CAST(len(string_split(nt, ' ')) AS BIGINT) AS t,
         CAST(n_chars AS BIGINT) AS c
  FROM kept
)
SELECT fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS n_tokens,
       CAST(sum(c) AS BIGINT) AS n_chars
FROM folded GROUP BY fold
"""


# ---------------------------------------------------------------------------
# Q: unicode script-mix audit per source
# ---------------------------------------------------------------------------


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus is ASCII by construction, so the confusable signal is
    injected deterministically in-query: docs with doc_id%7==0 get a
    Cyrillic suffix, doc_id%11==0 a CJK one — mixed_docs then counts
    exactly those, replayed by codepoint arithmetic in both engines."""
    from .operators.text import script_profile

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" привет")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit(" 中文")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return script_profile(docs, text_col="text", group_col="source").select(
        "source", "n_docs", "n_chars", "n_latin", "n_digit", "n_space",
        "n_cyrillic", "n_cjk", "n_other", "mixed_docs",
    )


SCRIPT_MIX_SQL = """
WITH d AS (
  SELECT source,
         text || CASE WHEN doc_id % 7 = 0 THEN ' привет' ELSE '' END
              || CASE WHEN doc_id % 11 = 0 THEN ' 中文' ELSE '' END AS t
  FROM documents
  WHERE text IS NOT NULL AND len(text) > 0
),
cls AS (
  SELECT source, length(t) AS n_chars,
         list_transform(string_split(t, ''), c -> unicode(c)) AS cps
  FROM d
),
per AS (
  SELECT source, n_chars,
         CAST(len(list_filter(cps, p -> (p >= 65 AND p <= 90)
              OR (p >= 97 AND p <= 122))) AS BIGINT) AS lat,
         CAST(len(list_filter(cps, p -> p >= 48 AND p <= 57)) AS BIGINT)
           AS dig,
         CAST(len(list_filter(cps, p -> p = 32 OR p = 9 OR p = 10
              OR p = 13)) AS BIGINT) AS spc,
         CAST(len(list_filter(cps, p -> p >= 1024 AND p <= 1279)) AS BIGINT)
           AS cyr,
         CAST(len(list_filter(cps, p -> p >= 19968 AND p <= 40959))
              AS BIGINT) AS cjk
  FROM cls
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars,
       CAST(sum(lat) AS BIGINT) AS n_latin,
       CAST(sum(dig) AS BIGINT) AS n_digit,
       CAST(sum(spc) AS BIGINT) AS n_space,
       CAST(sum(cyr) AS BIGINT) AS n_cyrillic,
       CAST(sum(cjk) AS BIGINT) AS n_cjk,
       CAST(sum(n_chars) - sum(lat) - sum(dig) - sum(spc) - sum(cyr)
            - sum(cjk) AS BIGINT) AS n_other,
       CAST(sum(CASE WHEN lat > 0 AND (cyr > 0 OR cjk > 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS mixed_docs
FROM per GROUP BY source
"""


# ---------------------------------------------------------------------------
# Q: median/MAD robust outlier screen over event values
# ---------------------------------------------------------------------------


def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value outliers at 3 MADs, cents quantization: the events
    value column is uniform so outliers are the distribution's tails —
    exact doubled-integer medians make the whole screen hash-gateable."""
    from .operators.temporal import robust_outlier_report

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    return robust_outlier_report(
        ev, key="event_type", value_col="value", scale=100, k_mad=3
    ).select("event_type", "n", "med2", "mad2", "n_outliers", "outlier_x1e6")


VALUE_OUTLIERS_SQL = """
WITH q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
med AS (
  SELECT event_type, CAST(median(v) * 2 AS BIGINT) AS med2
  FROM q GROUP BY event_type
),
dev AS (
  SELECT q.event_type, q.v, med.med2, abs(q.v * 2 - med.med2) AS d
  FROM q JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, CAST(median(d) * 2 AS BIGINT) AS mad2
  FROM dev GROUP BY event_type
)
SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(max(dev.med2) AS BIGINT) AS med2,
       CAST(max(mad.mad2) AS BIGINT) AS mad2,
       CAST(sum(CASE WHEN dev.d * 2 > 3 * mad.mad2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN dev.d * 2 > 3 * mad.mad2 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS outlier_x1e6
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


# ---------------------------------------------------------------------------
# Q: brand rank movers between order-date halves
# ---------------------------------------------------------------------------


def q_brand_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand popularity leaderboard, pre-1998 vs 1998-onward order halves:
    25 brands all present on both sides, so every row is moved/steady —
    the leaderboard-diff companion to type_drift."""
    from .operators.ranking import rank_movers

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    base = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select("p_brand", "o_orderdate")
    )
    a = base.filter(F.col("o_orderdate") < "1998-01-01")
    b = base.filter(F.col("o_orderdate") >= "1998-01-01")
    return rank_movers(a, b, "p_brand").select(
        "key", "n_a", "n_b", "rank_a", "rank_b", "rank_delta", "status"
    )


BRAND_MOVERS_SQL = """
WITH base AS (
  SELECT p_brand, o_orderdate
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
),
ca AS (
  SELECT p_brand AS key, CAST(count(*) AS BIGINT) AS n_a
  FROM base WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1
),
cb AS (
  SELECT p_brand AS key, CAST(count(*) AS BIGINT) AS n_b
  FROM base WHERE o_orderdate >= DATE '1998-01-01' GROUP BY 1
),
ra AS (
  SELECT key, n_a,
         CAST(row_number() OVER (ORDER BY n_a DESC, key ASC) AS BIGINT)
           AS rank_a
  FROM ca
),
rb AS (
  SELECT key, n_b,
         CAST(row_number() OVER (ORDER BY n_b DESC, key ASC) AS BIGINT)
           AS rank_b
  FROM cb
)
SELECT coalesce(ra.key, rb.key) AS key, n_a, n_b, rank_a, rank_b,
       CAST(rank_a - rank_b AS BIGINT) AS rank_delta,
       CASE WHEN rank_a IS NULL THEN 'new'
            WHEN rank_b IS NULL THEN 'vanished'
            WHEN rank_a - rank_b <> 0 THEN 'moved'
            ELSE 'steady' END AS status
FROM ra FULL OUTER JOIN rb ON ra.key = rb.key
"""


# ---------------------------------------------------------------------------
# Q: calibration table for the trained affinity classifier
# ---------------------------------------------------------------------------


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the gated affinity classifier against its
    own training label (is_en): scores cluster around the base rate, so
    occupied bands sit near the diagonal — the calibration companion to
    classifier_pr_curve."""
    from .operators.classifier import calibration_table, classify_documents

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", (F.col("lang") == "en").cast("long")
    )
    scored = classify_documents(docs, label_col="is_en", min_count=5).select(
        F.col("id").alias("doc_id"), "score_x1e6"
    )
    labeled = scored.join(
        docs.select(F.col("doc_id"), "is_en"), "doc_id"
    )
    return calibration_table(labeled, "is_en", band_width=50000).select(
        "band", "n", "n_pos", "pos_rate_x1e6", "mean_score_x1e6"
    )


CLASSIFIER_CALIBRATION_SQL = """
WITH tok AS (
  SELECT doc_id AS id,
         CAST(lang = 'en' AS BIGINT) AS is_pos,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
model AS (
  SELECT tok,
         CAST(sum(is_pos) AS BIGINT) AS n_pos,
         CAST(sum(1 - is_pos) AS BIGINT) AS n_neg
  FROM tok GROUP BY 1 HAVING count(*) >= 5
),
m2 AS (
  SELECT tok, (n_pos + 1) * 1000000 // (n_pos + n_neg + 2) AS aff FROM model
),
sc AS (
  SELECT id, CAST(sum(aff) // count(*) AS BIGINT) AS score
  FROM tok JOIN m2 USING (tok) GROUP BY 1
),
lab AS (
  SELECT sc.id, sc.score, CAST(d.lang = 'en' AS BIGINT) AS y
  FROM sc JOIN documents d ON sc.id = d.doc_id
)
SELECT CAST(score // 50000 AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(y) AS BIGINT) AS n_pos,
       CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS pos_rate_x1e6,
       CAST(sum(score) // count(*) AS BIGINT) AS mean_score_x1e6
FROM lab GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q: weighted PageRank over the nation trade graph
# ---------------------------------------------------------------------------


def q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 iterations with rank flowing proportional to n_flows — heavy
    trade routes carry endorsement; the unrolled oracle replays the same
    double arithmetic (float discipline per the pagerank_2iter family:
    gate values scaled with margin)."""
    from .operators.graph_algos import pagerank

    flows = _nation_flows(spark, sf_dir).select(
        "src", "dst", F.col("n_flows").alias("w")
    )
    return pagerank(flows, iterations=2, weight_col="w").select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("long")
        .alias("rank_x1e6"),
    )


PAGERANK_WEIGHTED_SQL = f"""
WITH {FLOWS_FRAGMENT.strip()},
e AS (SELECT src, dst, CAST(n_flows AS DOUBLE) AS w FROM flows),
nodes AS (
  SELECT DISTINCT node FROM
    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
outw AS (SELECT src, sum(w) AS d FROM e GROUP BY src),
r0 AS (SELECT node, CAST(1 AS DOUBLE) AS r FROM nodes),
r1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r0.r * e.w / o.d) AS m
    FROM e JOIN r0 ON r0.node = e.src JOIN outw o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
r2 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r1.r * e.w / o.d) AS m
    FROM e JOIN r1 ON r1.node = e.src JOIN outw o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)
SELECT node, CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rank_x1e6 FROM r2
"""


# ---------------------------------------------------------------------------
# Q: survival / at-risk life table over user activity spans
# ---------------------------------------------------------------------------


def q_survival_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KM life-table ingredients over the events fixture: most users'
    first/last events cluster near the corpus edges (13 draws over 30
    days), so endings ramp up toward the censoring boundary — the shape a
    retention analyst expects from a bounded observation window."""
    from .operators.temporal import survival_table

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return survival_table(ev, bucket="day").select(
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_starting", "n_ending", "n_at_risk", "censored", "hazard_x1e6",
    )


SURVIVAL_USERS_SQL = """
WITH span AS (
  SELECT user_id, min(date_trunc('day', ts)) AS f,
         max(date_trunc('day', ts)) AS l
  FROM events GROUP BY user_id
),
mx AS (SELECT max(l) AS maxb FROM span),
st AS (SELECT f AS b, CAST(count(*) AS BIGINT) AS n_starting
       FROM span GROUP BY f),
en AS (SELECT l AS b, CAST(count(*) AS BIGINT) AS n_ending
       FROM span GROUP BY l),
m AS (
  SELECT coalesce(st.b, en.b) AS b,
         CAST(coalesce(n_starting, 0) AS BIGINT) AS n_starting,
         CAST(coalesce(n_ending, 0) AS BIGINT) AS n_ending
  FROM st FULL OUTER JOIN en ON st.b = en.b
),
c AS (
  SELECT b, n_starting, n_ending,
         CAST(sum(n_starting) OVER w - sum(n_ending) OVER w + n_ending
              AS BIGINT) AS n_at_risk
  FROM m
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT strftime(b, '%Y-%m-%d') AS day, n_starting, n_ending, n_at_risk,
       CAST(CASE WHEN b = mx.maxb THEN n_ending ELSE 0 END AS BIGINT)
         AS censored,
       CAST(n_ending * 1000000 // n_at_risk AS BIGINT) AS hazard_x1e6
FROM c CROSS JOIN mx
"""


# ---------------------------------------------------------------------------
# Q: label-noise report by quantized-cosine neighbor voting
# ---------------------------------------------------------------------------


def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood voting over the embeddings table (labels are random
    w.r.t. the vectors, so flagged rows are the chance 3-of-5 agreements
    — the null-calibration reading an auditor compares a REAL corpus
    against); exactness is the point: the oracle replays the full
    n² quantized-cosine vote bit-for-bit."""
    from .operators.similarity import label_noise_report

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    return label_noise_report(emb, k=5, min_votes=3).select(
        F.col("label").cast("int").alias("label"), "n", "n_flagged", "noise_x1e6"
    )


LABEL_NOISE_SQL = """
WITH emb AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
qz AS (
  SELECT vec_id, label,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0
                   / list_max(list_transform(v, y -> abs(y))) + 0.5)
                   AS INTEGER))
         END AS q
  FROM emb
),
qn AS (
  SELECT vec_id, label, q,
         CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT)
              * CAST(x AS BIGINT))) AS BIGINT) AS n2
  FROM qz
),
sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS vid, b.label AS nl,
         CAST(list_sum(list_transform(list_zip(a.q, b.q),
              x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS DOUBLE)
         / sqrt(CAST(a.n2 * b.n2 AS DOUBLE)) AS qcos
  FROM qn a JOIN qn b ON true
),
ranked AS (
  SELECT query_id, vid, nl,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY qcos DESC, vid ASC) AS rn
  FROM sims
),
nbrs AS (
  SELECT query_id, vid, nl FROM ranked WHERE rn <= 6 AND vid <> query_id
),
votes AS (
  SELECT query_id, nl, CAST(count(*) AS BIGINT) AS cnt
  FROM nbrs GROUP BY query_id, nl
),
best AS (
  SELECT query_id, nl AS maj_label, cnt AS maj_cnt,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cnt DESC, nl DESC) AS rn
  FROM votes
),
flagged AS (
  SELECT e.label AS own,
         CASE WHEN b.maj_label IS NOT NULL AND b.maj_label <> e.label
                   AND b.maj_cnt >= 3 THEN 1 ELSE 0 END AS f
  FROM emb e LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
    ON e.vec_id = b.query_id
)
SELECT CAST(own AS INT) AS label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(f) AS BIGINT) AS n_flagged,
       CAST(sum(f) * 1000000 // count(*) AS BIGINT) AS noise_x1e6
FROM flagged GROUP BY own
"""


# ---------------------------------------------------------------------------
# Q: Z-order layout keys over document (length, vocabulary) space
# ---------------------------------------------------------------------------


def q_zorder_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton keys over (n_chars, distinct-token count) — the layout key
    a 100 TB curation table would be z-ordered by so scans filtered on
    EITHER dimension prune row groups; emitted per doc for the exact
    cross-engine bit-arithmetic check."""
    from .operators.sampling import morton_key

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_unique"),
    )
    return morton_key(docs, "n_chars", "n_unique", bits=16).select(
        "doc_id", "n_chars", "n_unique", "zkey"
    )


ZORDER_DOCS_SQL = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
           AS n_unique,
         least(CAST(65535 AS BIGINT),
               greatest(CAST(0 AS BIGINT), CAST(n_chars AS BIGINT))) AS cx,
         least(CAST(65535 AS BIGINT), greatest(CAST(0 AS BIGINT),
               CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)))
           AS cy
  FROM documents
)
SELECT doc_id, n_chars, n_unique,
       CAST({" | ".join(
           f"(((cx >> {i}) & 1) << {2 * i}) | (((cy >> {i}) & 1) << {2 * i + 1})"
           for i in range(16)
       )} AS BIGINT) AS zkey
FROM d
"""


# ---------------------------------------------------------------------------
# Q: co-burst cross-correlation between event-type series
# ---------------------------------------------------------------------------


def q_coburst_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH click and view get the Jan-21 duplication, so the pair
    (click, view) co-bursts (r² strongly positive) while pairs with
    untouched keys hover near zero — the co-movement readout beside
    cusum/acf/mk on the same fixture family."""
    from .operators.temporal import cross_correlation

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        F.col("event_type").isin("click", "view")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return cross_correlation(
        ev.unionAll(shift), key="event_type", ts_col="ts", bucket="day"
    ).select("key_a", "key_b", "n_joint", "num", "r2_x1e6")


COBURST_XCORR_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type IN ('click', 'view')
    AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS nb
  FROM cnt GROUP BY 1
),
dev AS (
  SELECT c.event_type AS k, c.b,
         least(CAST(1000000 AS BIGINT), greatest(CAST(-1000000 AS BIGINT),
           (c.n * p.nb - p.t) // p.t * 1000
           + (c.n * p.nb - p.t) % p.t * 1000 // p.t)) AS d
  FROM cnt c JOIN pk p USING (event_type)
),
paired AS (
  SELECT a.k AS key_a, b.k AS key_b, a.d AS da, b.d AS db
  FROM dev a JOIN dev b ON a.b = b.b AND a.k < b.k
),
rolled AS (
  SELECT key_a, key_b, CAST(count(*) AS BIGINT) AS n_joint,
         CAST(sum(da * db) AS BIGINT) AS num,
         CAST(sum(da * da) AS BIGINT) AS da2,
         CAST(sum(db * db) AS BIGINT) AS db2
  FROM paired GROUP BY key_a, key_b
)
SELECT key_a, key_b, n_joint, num,
       CAST(CASE WHEN da2 = 0 OR db2 = 0 THEN 0
                 ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                      * (abs(num) * 1000 // da2)
                      * (abs(num) * 1000 // db2)
            END AS BIGINT) AS r2_x1e6
FROM rolled
"""


# ---------------------------------------------------------------------------
# Q: event-type distribution drift, first half vs shifted second half
# ---------------------------------------------------------------------------


def q_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/serve skew readout over the cusum fixture: first 15 days
    vs the rest with the injected click duplication — drift concentrates
    on 'click' (positive delta) and dilutes every other share."""
    from .operators.text import distribution_drift

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    cut = F.lit("2024-01-16").cast("timestamp")
    a = ev.filter(F.col("ts") < cut)
    late = ev.filter(F.col("ts") >= cut)
    shift = late.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return distribution_drift(a, late.unionAll(shift), "event_type").select(
        F.col("cat").alias("event_type"),
        "n_a", "n_b", "share_a_x1e6", "share_b_x1e6", "delta_x1e6",
        "tvd_x1e6",
    )


TYPE_DRIFT_SQL = """
WITH a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_a
  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1
),
braw AS (
  SELECT event_type, ts FROM events WHERE ts >= TIMESTAMP '2024-01-16'
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
b AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_b FROM braw GROUP BY 1
),
j AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type,
         CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
         CAST(coalesce(n_b, 0) AS BIGINT) AS n_b
  FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
),
t AS (
  SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb,
         CAST(sum(abs(n_a * (SELECT sum(n_b) FROM j)
                      - n_b * (SELECT sum(n_a) FROM j))) AS BIGINT) AS dsum
  FROM j
)
SELECT j.event_type, j.n_a, j.n_b,
       CAST(j.n_a * 1000000 // t.ta AS BIGINT) AS share_a_x1e6,
       CAST(j.n_b * 1000000 // t.tb AS BIGINT) AS share_b_x1e6,
       CAST(abs(j.n_a * t.tb - j.n_b * t.ta) * 1000000
            // (t.ta * t.tb) AS BIGINT) AS delta_x1e6,
       CAST(t.dsum * 1000000 // (2 * t.ta * t.tb) AS BIGINT) AS tvd_x1e6
FROM j CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Q: label-centroid pooling over the embeddings table
# ---------------------------------------------------------------------------


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool the 64-dim embeddings per label (10 centroids), then
    re-explode the assembled arrays so the gate compares exact integers
    row-wise — exercising quantization, the integer mean, AND the
    dim-ordered reassembly."""
    from .operators.similarity import pool_vectors

    emb = _t(spark, sf_dir, "embeddings").select("label", "embedding")
    pooled = pool_vectors(emb, "label", vec_col="embedding", scale=1000)
    return pooled.select(
        F.col("key").cast("int").alias("label"),
        "n_vectors",
        F.posexplode("vec").alias("dim", "val"),
    )


LABEL_CENTROIDS_SQL = """
WITH q AS (
  SELECT label, CAST(i - 1 AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
  WHERE embedding IS NOT NULL
),
a AS (
  SELECT label, dim, CAST(sum(val) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY label, dim
)
SELECT CAST(label AS INT) AS label, CAST(max(n) OVER (PARTITION BY label)
         AS BIGINT) AS n_vectors,
       dim, CAST(s // n AS BIGINT) AS val
FROM a
"""


# ---------------------------------------------------------------------------
# Q: SHACL-lite constraint validation over the TPC-H entity KG
# ---------------------------------------------------------------------------


def _tpch_kg(spark: SparkSession, sf_dir: str):
    """The in-query TPC-H entity KG shared by domain_range and
    validate_rules: triples (customers/suppliers in_nation, nations
    in_region), types with multi-typed Place nations/regions."""
    c = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("s"),
        F.lit("in_nation").alias("p"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("o"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("s"),
        F.lit("in_nation").alias("p"),
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("o"),
    )
    n = _t(spark, sf_dir, "nation").select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("s"),
        F.lit("in_region").alias("p"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("o"),
    )
    triples = c.unionAll(s).unionAll(n)
    types = (
        _t(spark, sf_dir, "customer")
        .select(F.concat(F.lit("c"), F.col("c_custkey")).alias("node"),
                F.lit("Customer").alias("type"))
        .unionAll(
            _t(spark, sf_dir, "supplier").select(
                F.concat(F.lit("s"), F.col("s_suppkey")).alias("node"),
                F.lit("Supplier").alias("type"))
        )
        .unionAll(
            _t(spark, sf_dir, "nation").select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("node"),
                F.lit("Nation").alias("type"))
        )
        .unionAll(
            _t(spark, sf_dir, "nation").select(
                F.concat(F.lit("n"), F.col("n_nationkey")).alias("node"),
                F.lit("Place").alias("type"))
        )
        .unionAll(
            _t(spark, sf_dir, "region").select(
                F.concat(F.lit("r"), F.col("r_regionkey")).alias("node"),
                F.lit("Region").alias("type"))
        )
        .unionAll(
            _t(spark, sf_dir, "region").select(
                F.concat(F.lit("r"), F.col("r_regionkey")).alias("node"),
                F.lit("Place").alias("type"))
        )
    )
    return triples, types


def q_validate_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four rule kinds over the TPC-H KG: a domain rule suppliers violate
    (~62500 ppm at every sf), a clean range rule, a clean cardinality cap,
    and a disjointness rule every multi-typed nation violates (25/30 —
    scale-invariant by construction)."""
    from .graph.constraints import validate_constraints

    triples, types = _tpch_kg(spark, sf_dir)
    rules = [
        ("dom_in_nation", "domain", "in_nation", "Customer"),
        ("rng_in_nation", "range", "in_nation", "Place"),
        ("one_nation", "max_card", "in_nation", "1"),
        ("nation_place", "disjoint", "Nation", "Place"),
    ]
    return validate_constraints(triples, types, rules).select(
        "rule", "kind", "n_checked", "n_violations", "viol_x1e6",
        "example_node",
    )


VALIDATE_RULES_SQL = """
WITH triples AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS s, 'in_nation' AS p,
         'n' || CAST(c_nationkey AS VARCHAR) AS o FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 'in_nation',
         'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'in_region',
         'r' || CAST(n_regionkey AS VARCHAR) FROM nation
),
types AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS node, 'Customer' AS typ
  FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR), 'Supplier' FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'Nation' FROM nation
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR), 'Place' FROM nation
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'Region' FROM region
  UNION ALL
  SELECT 'r' || CAST(r_regionkey AS VARCHAR), 'Place' FROM region
),
dom AS (
  SELECT 'dom_in_nation' AS rule, 'domain' AS kind,
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(sum(CASE WHEN ok.node IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
         min(CASE WHEN ok.node IS NULL THEN t.s END) AS example_node
  FROM (SELECT s FROM triples WHERE p = 'in_nation') t
  LEFT JOIN (SELECT DISTINCT node FROM types WHERE typ = 'Customer') ok
    ON t.s = ok.node
),
rng AS (
  SELECT 'rng_in_nation' AS rule, 'range' AS kind,
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(sum(CASE WHEN ok.node IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
         min(CASE WHEN ok.node IS NULL THEN t.o END) AS example_node
  FROM (SELECT o FROM triples WHERE p = 'in_nation') t
  LEFT JOIN (SELECT DISTINCT node FROM types WHERE typ = 'Place') ok
    ON t.o = ok.node
),
card AS (
  SELECT 'one_nation' AS rule, 'max_card' AS kind,
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
         min(CASE WHEN n > 1 THEN s END) AS example_node
  FROM (
    SELECT s, CAST(count(DISTINCT o) AS BIGINT) AS n
    FROM triples WHERE p = 'in_nation' GROUP BY s
  )
),
dis AS (
  SELECT 'nation_place' AS rule, 'disjoint' AS kind,
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(sum(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violations,
         min(CASE WHEN k > 1 THEN node END) AS example_node
  FROM (
    SELECT node, CAST(count(DISTINCT typ) AS BIGINT) AS k
    FROM types WHERE typ IN ('Nation', 'Place') GROUP BY node
  )
),
u AS (
  SELECT * FROM dom UNION ALL SELECT * FROM rng
  UNION ALL SELECT * FROM card UNION ALL SELECT * FROM dis
)
SELECT rule, kind, n_checked, n_violations,
       CAST(CASE WHEN n_checked = 0 THEN 0
                 ELSE n_violations * 1000000 // n_checked END AS BIGINT)
         AS viol_x1e6,
       example_node
FROM u
"""


# ---------------------------------------------------------------------------
# Q: GCN-style feature propagation over a ring+skip fixture graph
# ---------------------------------------------------------------------------


def q_feature_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two smoothing rounds over vec_ids wired as a ring with +7 skip
    edges (a deterministic fixture graph derived from the embeddings
    table itself — the operator is graph-agnostic; production edges come
    from the canonicalization/co-occurrence joins). Features: the first 4
    embedding dims quantized x1000; output stays exploded (node, dim,
    val) for exact integer compare."""
    from .operators.graph_algos import feature_propagation

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.agg(F.count(F.lit(1)).alias("c"))
    feats = emb.select(
        F.col("vec_id").alias("node"),
        F.transform(
            F.slice("embedding", 1, 4),
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("long"),
        ).alias("vec"),
    )
    base = emb.select("vec_id").crossJoin(F.broadcast(n))
    edges = base.select(
        F.col("vec_id").alias("src"),
        F.pmod(F.col("vec_id") + 1, F.col("c")).alias("dst"),
    ).unionAll(
        base.select(
            F.col("vec_id").alias("src"),
            F.pmod(F.col("vec_id") + 7, F.col("c")).alias("dst"),
        )
    )
    return feature_propagation(edges, feats, rounds=2).select(
        "node", "dim", "val"
    )


FEATURE_PROP_SQL = """
WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM embeddings),
f0 AS (
  SELECT vec_id AS node, CAST(i - 1 AS INT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5) AS BIGINT)
           AS val
  FROM embeddings, unnest(generate_series(1, 4)) AS t(i)
),
e AS (
  SELECT vec_id AS src, (vec_id + 1) % nn.c AS dst FROM embeddings, nn
  UNION ALL
  SELECT vec_id, (vec_id + 7) % nn.c FROM embeddings, nn
),
a1 AS (
  SELECT e.dst AS node, g.dim, CAST(sum(g.val) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM e JOIN f0 g ON g.node = e.src GROUP BY e.dst, g.dim
),
f1 AS (
  SELECT f.node, f.dim,
         CAST(CASE WHEN a1.n IS NULL THEN f.val
                   ELSE (f.val + a1.s) // (1 + a1.n) END AS BIGINT) AS val
  FROM f0 f LEFT JOIN a1 ON f.node = a1.node AND f.dim = a1.dim
),
a2 AS (
  SELECT e.dst AS node, g.dim, CAST(sum(g.val) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM e JOIN f1 g ON g.node = e.src GROUP BY e.dst, g.dim
)
SELECT f.node, f.dim,
       CAST(CASE WHEN a2.n IS NULL THEN f.val
                 ELSE (f.val + a2.s) // (1 + a2.n) END AS BIGINT) AS val
FROM f1 f LEFT JOIN a2 ON f.node = a2.node AND f.dim = a2.dim
"""


# ---------------------------------------------------------------------------
# Q: group-aware K-fold balance + leakage report
# ---------------------------------------------------------------------------


def q_kfold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold group split keyed on user_id over events: folds are a pure
    function of the group key (md5), shares land near 200k ppm each, and
    n_leaky is structurally zero — asserted, not assumed."""
    from .operators.sampling import kfold_report

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id")
    return kfold_report(ev, "user_id", k=5, seed=23).select(
        "fold", "n_rows", "n_groups", "n_leaky", "share_x1e6"
    )


KFOLD_REPORT_SQL = """
WITH folded AS (
  SELECT CAST(
           CAST(concat('0x', substr(md5('23:' || CAST(user_id AS VARCHAR)),
                1, 8)) AS BIGINT) % 5 AS INT) AS fold,
         user_id
  FROM events
),
pg AS (
  SELECT fold, user_id, CAST(count(*) AS BIGINT) AS n_rows
  FROM folded GROUP BY fold, user_id
),
span AS (
  SELECT user_id, CAST(count(DISTINCT fold) AS BIGINT) AS nf
  FROM pg GROUP BY user_id
),
tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM pg)
SELECT pg.fold,
       CAST(sum(pg.n_rows) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN span.nf > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky,
       CAST(sum(pg.n_rows) * 1000000 // max(tot.t) AS BIGINT) AS share_x1e6
FROM pg JOIN span USING (user_id) CROSS JOIN tot
GROUP BY pg.fold
"""


# ---------------------------------------------------------------------------
# Q: trailing 7-day rolling counts per event type
# ---------------------------------------------------------------------------


def q_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar RANGE frames over daily counts: the first six days ramp
    the trailing sum up (partial frames), then it plateaus — per-key,
    both trailing aggregates from ONE window."""
    from .operators.temporal import rolling_counts

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    return rolling_counts(
        ev, key="event_type", ts_col="ts", bucket="day", trail_buckets=7
    ).select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_events", "trail_sum", "trail_active",
    )


ROLLING_7D_SQL = """
WITH cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS ep,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, strftime(b, '%Y-%m-%d') AS day, n AS n_events,
       CAST(sum(n) OVER w AS BIGINT) AS trail_sum,
       CAST(count(*) OVER w AS BIGINT) AS trail_active
FROM cnt
WINDOW w AS (PARTITION BY event_type ORDER BY ep
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Q: Benford first-digit forensics over order totals
# ---------------------------------------------------------------------------


def q_benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit profile of o_totalprice: TPC-H prices are synthetic
    sums of uniform draws, so the profile deviates from Benford with the
    characteristic mid-digit hump — exactly what the forensic exists to
    flag."""
    from .operators.text import benford_profile

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("value")
    )
    return benford_profile(o, value_col="value").select(
        "digit", "n", "share_x1e6", "benford_x1e6", "dev_x1e6"
    )


BENFORD_ORDERS_SQL = """
WITH exp(digit, benford_x1e6) AS (
  VALUES (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
         (6, 66946), (7, 57991), (8, 51152), (9, 45757)
),
scaled AS (
  SELECT CAST(floor(abs(o_totalprice) * 1000000) AS BIGINT) AS s
  FROM orders
),
d AS (
  SELECT CAST(substring(CAST(s AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM scaled WHERE s > 0 GROUP BY 1
),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d)
SELECT d.digit, d.n,
       CAST(d.n * 1000000 // t.tot AS BIGINT) AS share_x1e6,
       CAST(exp.benford_x1e6 AS BIGINT) AS benford_x1e6,
       CAST(d.n * 1000000 // t.tot - exp.benford_x1e6 AS BIGINT) AS dev_x1e6
FROM d JOIN exp ON d.digit = exp.digit CROSS JOIN t
"""


# ---------------------------------------------------------------------------
# Q: n-gram novelty curve over the documents corpus
# ---------------------------------------------------------------------------


def q_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus saturation in doc_id order, 100-doc buckets, word 3-grams:
    the word-soup corpus repeats heavily, so the curve drops fast from
    its all-novel first bucket — the dedup-ROI readout."""
    from .operators.text import ngram_novelty_curve

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return ngram_novelty_curve(
        docs, text_col="text", id_col="doc_id", n=3, bucket_size=100
    ).select("bucket", "n_grams", "n_novel", "cum_novel", "cum_grams", "novelty_x1e6")


NOVELTY_CURVE_SQL = """
WITH toks AS (
  SELECT doc_id // 100 AS bkt, string_split(text, ' ') AS w
  FROM documents WHERE len(string_split(text, ' ')) >= 3
),
grams AS (
  SELECT bkt, list_aggr(w[i : i + 2], 'string_agg', ' ') AS g
  FROM toks, unnest(generate_series(1, len(w) - 2)) AS t(i)
),
first AS (
  SELECT g, CAST(min(bkt) AS BIGINT) AS bkt FROM grams GROUP BY g
),
novel AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS n_novel FROM first GROUP BY bkt
),
tot AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY bkt
),
cur AS (
  SELECT t.bkt, t.n_grams, coalesce(nv.n_novel, 0) AS n_novel,
         CAST(sum(coalesce(nv.n_novel, 0)) OVER w AS BIGINT) AS cum_novel,
         CAST(sum(t.n_grams) OVER w AS BIGINT) AS cum_grams
  FROM tot t LEFT JOIN novel nv ON t.bkt = nv.bkt
  WINDOW w AS (ORDER BY t.bkt ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT CAST(bkt AS BIGINT) AS bucket, n_grams,
       CAST(n_novel AS BIGINT) AS n_novel, cum_novel, cum_grams,
       CAST(cum_novel * 1000000 // cum_grams AS BIGINT) AS novelty_x1e6
FROM cur
"""


# ---------------------------------------------------------------------------
# Q: column completeness/cardinality profile of documents
# ---------------------------------------------------------------------------


def q_completeness_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card page one over the documents table: id/text columns are
    all-distinct, lang/source are low-cardinality with meaningful top
    values, n_chars sits between."""
    from .operators.text import completeness_profile

    docs = _t(spark, sf_dir, "documents")
    return completeness_profile(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).select(
        "col", "n_rows", "n_null", "n_empty", "n_distinct",
        "top_value", "top_count",
    )


COMPLETENESS_DOCS_SQL = """
WITH p AS (
  SELECT 'doc_id' AS col, CAST(doc_id AS VARCHAR) AS v,
         CAST(doc_id IS NULL AS INT) AS is_null FROM documents
  UNION ALL
  SELECT 'text', text, CAST(text IS NULL AS INT) FROM documents
  UNION ALL
  SELECT 'lang', lang, CAST(lang IS NULL AS INT) FROM documents
  UNION ALL
  SELECT 'source', source, CAST(source IS NULL AS INT) FROM documents
  UNION ALL
  SELECT 'n_chars', CAST(n_chars AS VARCHAR),
         CAST(n_chars IS NULL AS INT) FROM documents
),
vc AS (
  SELECT col, v, is_null, CAST(count(*) AS BIGINT) AS cnt
  FROM p GROUP BY 1, 2, 3
),
agg AS (
  SELECT col, CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN is_null = 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST(sum(CASE WHEN is_null = 0 AND trim(v) = '' THEN cnt ELSE 0 END)
              AS BIGINT) AS n_empty,
         CAST(count(CASE WHEN is_null = 0 THEN 1 END) AS BIGINT) AS n_distinct
  FROM vc GROUP BY col
),
top AS (
  SELECT col, v AS top_value, cnt AS top_count,
         row_number() OVER (PARTITION BY col ORDER BY cnt DESC, v DESC) AS rn
  FROM vc WHERE is_null = 0
)
SELECT agg.col, n_rows, n_null, n_empty, n_distinct,
       t.top_value, CAST(coalesce(t.top_count, 0) AS BIGINT) AS top_count
FROM agg LEFT JOIN (SELECT * FROM top WHERE rn = 1) t ON agg.col = t.col
"""


# ---------------------------------------------------------------------------
# Q: reciprocity of the thresholded trade digraph
# ---------------------------------------------------------------------------


def q_reciprocity_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same thresholded digraph as scc/hits/closeness: the mutual-trade
    core contributes reciprocal edges, one-way exporters dilute the ratio
    into the informative mid-range."""
    from .operators.graph_algos import reciprocity_profile

    flows = _nation_flows(spark, sf_dir)
    mx = flows.agg(F.max("n_flows").alias("m"))
    edges = (
        flows.crossJoin(F.broadcast(mx))
        .filter(F.col("n_flows") * 2 >= F.col("m"))
        .select("src", "dst")
    )
    return reciprocity_profile(edges).select(
        "n_nodes", "n_edges", "n_reciprocal", "n_self", "reciprocity_x1e6"
    )


RECIPROCITY_TRADE_SQL = f"""
WITH {FLOWS_FRAGMENT.strip()},
mx AS (SELECT max(n_flows) AS m FROM flows),
e AS (SELECT DISTINCT src AS s, dst AS d FROM flows, mx WHERE n_flows * 2 >= m),
nl AS (SELECT s, d FROM e WHERE s <> d),
recip AS (
  SELECT a.s, a.d FROM nl a JOIN nl b ON a.s = b.d AND a.d = b.s
)
SELECT
  CAST((SELECT count(DISTINCT n) FROM
        (SELECT s AS n FROM e UNION ALL SELECT d FROM e)) AS BIGINT) AS n_nodes,
  CAST((SELECT count(*) FROM nl) AS BIGINT) AS n_edges,
  CAST((SELECT count(*) FROM recip) AS BIGINT) AS n_reciprocal,
  CAST((SELECT count(*) FROM e WHERE s = d) AS BIGINT) AS n_self,
  CAST(CASE WHEN (SELECT count(*) FROM nl) = 0 THEN 0
            ELSE (SELECT count(*) FROM recip) * 1000000
                 // (SELECT count(*) FROM nl) END AS BIGINT)
    AS reciprocity_x1e6
"""


# ---------------------------------------------------------------------------
# Q: Levenshtein-verified merge/purge candidate pairs
# ---------------------------------------------------------------------------


def q_snm_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-ER composition: window-5 sorted-neighborhood candidates
    over the 16-char prefix order, verified by edit distance on the
    64-char surface — exact/near duplicates in the corpus land at lev 0/
    small, prefix-coincidence pairs get filtered by max_dist=8."""
    from .linking.blocking import blocked_levenshtein_pairs

    docs = _t(spark, sf_dir, "documents").select(
        F.substring("text", 1, 16).alias("key"), "doc_id", "text"
    )
    return blocked_levenshtein_pairs(
        docs, ["key"], "doc_id", "text", window=5, max_dist=8, max_len=64
    ).select("id_a", "id_b", "dist", "lev")


SNM_LEVENSHTEIN_SQL = """
WITH r AS (
  SELECT doc_id, substring(text, 1, 64) AS t,
         row_number() OVER (ORDER BY substring(text, 1, 16), doc_id) AS rank
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(b.rank - a.rank AS BIGINT) AS dist,
       CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev
FROM r a JOIN r b ON b.rank > a.rank AND b.rank - a.rank <= 5
WHERE levenshtein(a.t, b.t) <= 8
"""


# ---------------------------------------------------------------------------
# Q: recency-weighted activity scores per user
# ---------------------------------------------------------------------------


def q_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot asof the day after the fixture's last event (2024-01-31),
    half-life one week: ~13 events per user spread over 30 days give every
    user a distinct mix of full/half/quarter weights."""
    from .operators.temporal import decayed_activity

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return decayed_activity(
        ev, key="user_id", ts_col="ts", asof="2024-01-31", halflife_days=7
    ).select("key", "n_events", "last_age_days", "score_x1e6")


DECAYED_ACTIVITY_SQL = """
SELECT user_id AS key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31'))
            AS BIGINT) AS last_age_days,
       CAST(sum(1000000 // (CAST(1 AS BIGINT) << CAST(least(40, greatest(0,
              CAST(date_diff('day', CAST(ts AS DATE), DATE '2024-01-31')
                   AS BIGINT) // 7)) AS INT)))
            AS BIGINT) AS score_x1e6
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Q: Goodman-Kruskal lambda association profile over event columns
# ---------------------------------------------------------------------------


def q_gk_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three associations spanning the range: day→month is a perfect
    predictor (λ = 1e6), user→type and type→valueband are independent by
    construction (λ near 0) — the error-reduction companion readout to
    fd_profile's g3 over the same table."""
    from .graph.constraints import gk_lambda

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.floor(F.col("value") / 50).cast("long").alias("vband"),
    )
    return gk_lambda(
        ev,
        [
            ("user_to_type", "user_id", "event_type"),
            ("day_to_month", "day", "month"),
            ("type_to_vband", "event_type", "vband"),
        ],
    ).select("assoc", "total", "n_x", "s_max", "maxcol", "lambda_x1e6")


GK_LAMBDA_SQL = """
WITH base AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
         strftime(ts, '%Y-%m-%d') AS day, strftime(ts, '%Y-%m') AS month,
         CAST(CAST(floor(value / 50) AS BIGINT) AS VARCHAR) AS vband
  FROM events
),
p AS (
  SELECT 'user_to_type' AS assoc, user_id AS x, event_type AS y FROM base
  UNION ALL
  SELECT 'day_to_month', day, month FROM base
  UNION ALL
  SELECT 'type_to_vband', event_type, vband FROM base
),
vc AS (
  SELECT assoc, x, y, CAST(count(*) AS BIGINT) AS cnt
  FROM p GROUP BY 1, 2, 3
),
per_x AS (
  SELECT assoc, x, CAST(max(cnt) AS BIGINT) AS keep,
         CAST(sum(cnt) AS BIGINT) AS n_rows
  FROM vc GROUP BY assoc, x
),
top AS (
  SELECT assoc, CAST(sum(n_rows) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_x,
         CAST(sum(keep) AS BIGINT) AS s_max
  FROM per_x GROUP BY assoc
),
cm AS (
  SELECT assoc, CAST(max(c) AS BIGINT) AS maxcol FROM (
    SELECT assoc, y, CAST(sum(cnt) AS BIGINT) AS c FROM vc GROUP BY assoc, y
  ) GROUP BY assoc
)
SELECT top.assoc, total, n_x, s_max, maxcol,
       CAST(CASE WHEN total = maxcol THEN 0
                 ELSE (s_max - maxcol) * 1000000 // (total - maxcol)
            END AS BIGINT) AS lambda_x1e6
FROM top JOIN cm ON top.assoc = cm.assoc
"""


# ---------------------------------------------------------------------------
# Q: online-CUSUM batch twin (calibration mode) over daily rates
# ---------------------------------------------------------------------------


def q_cusum_online(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming drift detector's batch twin in calibration mode:
    target = per-key empirical bucket mean (exact DIV), thr = 2×target —
    scale-free, so the injected click shift alarms at every sf. The
    parity test ties the stream to this exact semantics; this gate ties
    the semantics to DuckDB."""
    from .streaming.drift import cusum_stream_batch_twin

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return cusum_stream_batch_twin(
        ev.unionAll(shift), key_col="event_type", ts_col="ts",
        bucket="day", target=None, thr=None, thr_mult=2,
    ).select(
        "key",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("day"),
        "n_events", "s_scaled", "alarm",
    )


CUSUM_ONLINE_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT CAST(event_type AS VARCHAR) AS key, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT key, CAST(sum(n) // count(*) AS BIGINT) AS tgt,
         max(b) AS last_b
  FROM cnt GROUP BY key
),
pre AS (
  SELECT c.key, c.b, c.n, p.tgt, p.last_b,
         CAST(sum(c.n - p.tgt) OVER w AS BIGINT) AS p
  FROM cnt c JOIN pk p USING (key)
  WINDOW w AS (PARTITION BY c.key ORDER BY c.b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
st AS (
  SELECT key, b, n, tgt, last_b, p,
         CAST(min(p) OVER (PARTITION BY key ORDER BY b
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS m
  FROM pre
)
SELECT key, strftime(b, '%Y-%m-%d') AS day, n AS n_events,
       CAST(p - least(CAST(0 AS BIGINT), m) AS BIGINT) AS s_scaled,
       CAST(CASE WHEN p - least(CAST(0 AS BIGINT), m) > 2 * tgt
                 THEN 1 ELSE 0 END AS INT) AS alarm
FROM st WHERE b < last_b
"""


# ---------------------------------------------------------------------------
# Q: Gini concentration of per-user mass within event types
# ---------------------------------------------------------------------------


def q_gini_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-mass inequality per event type: Poisson thinning of a uniform
    assignment gives a small but non-zero Gini per key — the skew readout
    a partitioner consults before choosing hash vs salt."""
    from .operators.text import gini_concentration

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    return gini_concentration(ev, key="event_type", unit_col="user_id").select(
        "event_type", "n_units", "total", "gini_x1e6"
    )


GINI_USERS_SQL = """
WITH cnt AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, x,
         CAST(row_number() OVER (PARTITION BY event_type
                                 ORDER BY x, user_id) AS BIGINT) AS r
  FROM cnt
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_units,
       CAST(sum(x) AS BIGINT) AS total,
       CAST((2 * CAST(sum(r * x) AS BIGINT)
             - (CAST(count(*) AS BIGINT) + 1) * CAST(sum(x) AS BIGINT))
            * 1000000
            // (CAST(count(*) AS BIGINT) * CAST(sum(x) AS BIGINT))
            AS BIGINT) AS gini_x1e6
FROM ranked GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Q: Mann-Kendall trend over daily event-type rates
# ---------------------------------------------------------------------------


def q_mk_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third lens on the injected 'click' level shift (with cusum and acf):
    a step change is monotone-ish in the pair order, so click reads a
    strongly positive Kendall tau while the uniform keys straddle zero."""
    from .operators.temporal import mk_trend

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return mk_trend(
        ev.unionAll(shift), key="event_type", ts_col="ts", bucket="day"
    ).select("event_type", "n_buckets", "n_pairs", "s_stat", "tau_x1e6")


MK_TREND_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY 1
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN c.n > a.n THEN 1
                       WHEN c.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM cnt a JOIN cnt c ON a.event_type = c.event_type AND c.b > a.b
  GROUP BY a.event_type
)
SELECT p.event_type, pk.n_buckets, p.n_pairs, p.s_stat,
       CAST(p.s_stat * 1000000 // p.n_pairs AS BIGINT) AS tau_x1e6
FROM pairs p JOIN pk ON p.event_type = pk.event_type
"""


# ---------------------------------------------------------------------------
# Q: truncated harmonic closeness over the thresholded trade digraph
# ---------------------------------------------------------------------------


def q_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop harmonic centrality on the same thresholded digraph scc/hits
    use (full trade graph is near-complete — every node would read
    (V−1)·1e6); every node is a source (25 nations is dimension-scale, the
    all-sources case the operator documents as fine there)."""
    from .operators.graph_algos import harmonic_closeness

    flows = _nation_flows(spark, sf_dir)
    mx = flows.agg(F.max("n_flows").alias("m"))
    edges = (
        flows.crossJoin(F.broadcast(mx))
        .filter(F.col("n_flows") * 2 >= F.col("m"))
        .select("src", "dst")
    )
    return harmonic_closeness(edges, rounds=3).select(
        "node", "n_reached", "harmonic_x1e6"
    )


HARMONIC_CLOSENESS_SQL = f"""
WITH RECURSIVE {FLOWS_FRAGMENT.strip()},
mx AS (SELECT max(n_flows) AS m FROM flows),
edges AS (SELECT src, dst FROM flows, mx WHERE n_flows * 2 >= m),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
walk(lm, node, dist) AS (
  SELECT node, node, 0 FROM nodes
  UNION
  SELECT w.lm, e.dst, w.dist + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3
),
d AS (
  SELECT lm, node, min(dist) AS dist FROM walk GROUP BY lm, node
),
agg AS (
  SELECT lm, CAST(count(*) AS BIGINT) AS n_reached,
         CAST(sum(1000000 // dist) AS BIGINT) AS harmonic_x1e6
  FROM d WHERE dist > 0 GROUP BY lm
)
SELECT nd.node,
       CAST(coalesce(agg.n_reached, 0) AS BIGINT) AS n_reached,
       CAST(coalesce(agg.harmonic_x1e6, 0) AS BIGINT) AS harmonic_x1e6
-- DISTINCT guard: under WITH RECURSIVE DuckDB re-expands a non-recursive
-- CTE referenced by the recursive member, dropping `nodes`' UNION dedup
FROM (SELECT DISTINCT node FROM nodes) nd LEFT JOIN agg ON agg.lm = nd.node
"""


# ---------------------------------------------------------------------------
# Q: lag-k autocorrelation of daily event-type rates
# ---------------------------------------------------------------------------


def q_acf_daily_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same injected 'click' level shift as cusum_level_shift, read through
    the stationarity lens: the shifted key's sustained deviation shows up
    as strong positive low-lag ACF while the untouched uniform keys hover
    near zero — the two operators corroborate on one fixture."""
    from .operators.temporal import acf_buckets

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    shift = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return acf_buckets(
        ev.unionAll(shift), key="event_type", ts_col="ts",
        bucket="day", lags=(1, 2, 3),
    ).select("event_type", "lag", "n_buckets", "n_pairs", "acf_x1e3")


ACF_DAILY_RATES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pk AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS nb
  FROM cnt GROUP BY 1
),
dev AS (
  SELECT c.event_type, c.b, p.nb,
         least(CAST(1000000 AS BIGINT), greatest(CAST(-1000000 AS BIGINT),
           (c.n * p.nb - p.t) // p.t * 1000
           + (c.n * p.nb - p.t) % p.t * 1000 // p.t)) AS d
  FROM cnt c JOIN pk p USING (event_type)
),
led AS (
  SELECT event_type, nb, d,
         lead(d, 1) OVER w AS l1,
         lead(d, 2) OVER w AS l2,
         lead(d, 3) OVER w AS l3
  FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY b)
),
roll AS (
  SELECT event_type, CAST(max(nb) AS BIGINT) AS n_buckets,
         CAST(sum(d * d) AS BIGINT) AS den,
         CAST(sum(d * l1) AS BIGINT) AS num1, CAST(count(l1) AS BIGINT) AS np1,
         CAST(sum(d * l2) AS BIGINT) AS num2, CAST(count(l2) AS BIGINT) AS np2,
         CAST(sum(d * l3) AS BIGINT) AS num3, CAST(count(l3) AS BIGINT) AS np3
  FROM led GROUP BY event_type
),
fan AS (
  SELECT event_type, n_buckets, den,
         unnest([
           struct_pack(lag := 1, num := num1, np := np1),
           struct_pack(lag := 2, num := num2, np := np2),
           struct_pack(lag := 3, num := num3, np := np3)
         ]) AS x
  FROM roll
)
SELECT event_type, CAST(x.lag AS INT) AS lag, n_buckets,
       CAST(x.np AS BIGINT) AS n_pairs,
       CAST(CASE WHEN den = 0 THEN 0
                 ELSE x.num * 1000 // den END AS BIGINT) AS acf_x1e3
FROM fan
"""


# ---------------------------------------------------------------------------
# Q: cohort retention matrix over daily user activity
# ---------------------------------------------------------------------------


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-granularity cohorts over the events table: users average ~13
    events across 30 days, so per-day activity probability is ~0.35 —
    retention decays from the mandatory 1e6 at age 0 to a non-trivial
    plateau, exercising the full (cohort, age) matrix."""
    from .operators.temporal import cohort_retention

    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return cohort_retention(ev, bucket="day").select(
        "cohort", "age", "n_active", "cohort_size", "retention_x1e6"
    )


COHORT_RETENTION_SQL = """
WITH act AS (
  SELECT DISTINCT user_id AS u, date_trunc('day', ts) AS b FROM events
),
coh AS (SELECT u, min(b) AS c FROM act GROUP BY u),
mat AS (
  SELECT c, CAST(date_diff('day', c, b) AS BIGINT) AS age,
         CAST(count(*) AS BIGINT) AS n_active
  FROM act JOIN coh USING (u) GROUP BY c, age
),
sz AS (SELECT c, n_active AS cohort_size FROM mat WHERE age = 0)
SELECT strftime(mat.c, '%Y-%m-%d') AS cohort, age, n_active,
       cohort_size,
       CAST(n_active * 1000000 // cohort_size AS BIGINT) AS retention_x1e6
FROM mat JOIN sz ON mat.c = sz.c
"""


# ---------------------------------------------------------------------------
# Q: brand co-purchase lift over order baskets
# ---------------------------------------------------------------------------


def q_copurchase_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order = basket, part brand = item (25 brands keep the pair grid
    dense enough that lift separates from 1.0); the part dimension is
    broadcast, the pair fan is bounded by lineitems-per-order <= 7."""
    from .operators.baskets import copurchase_lift

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    b = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        F.col("l_orderkey").alias("basket_id"), F.col("p_brand").alias("item")
    )
    return copurchase_lift(b, min_pairs=5).select(
        "item_a", "item_b", "n_pairs", "n_a", "n_b", "n_baskets", "lift_x1e6"
    )


COPURCHASE_BRANDS_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bsk, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
marg AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM b GROUP BY item),
tot AS (SELECT CAST(count(DISTINCT bsk) AS BIGINT) AS nb FROM b),
pairs AS (
  SELECT a.item AS item_a, c.item AS item_b,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM b a JOIN b c ON a.bsk = c.bsk AND a.item < c.item
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT item_a, item_b, n_pairs, ma.n AS n_a, mb.n AS n_b,
       tot.nb AS n_baskets,
       CAST(((n_pairs * 1000000) // ma.n) * tot.nb // mb.n AS BIGINT)
         AS lift_x1e6
FROM pairs
JOIN marg ma ON ma.item = item_a
JOIN marg mb ON mb.item = item_b
CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# Q: HITS hubs/authorities over the thresholded trade digraph
# ---------------------------------------------------------------------------


def q_hits_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2 unnormalized iterations over the same thresholded flow digraph
    scc_nations uses: the mutual-trade core scores high on both axes,
    one-way exporters separate hub from authority."""
    from .operators.graph_algos import hits

    flows = _nation_flows(spark, sf_dir)
    mx = flows.agg(F.max("n_flows").alias("m"))
    edges = (
        flows.crossJoin(F.broadcast(mx))
        .filter(F.col("n_flows") * 2 >= F.col("m"))
        .select("src", "dst")
    )
    return hits(edges, iterations=2).select("node", "hub", "auth")


HITS_NATIONS_SQL = f"""
WITH {FLOWS_FRAGMENT.strip().lstrip()},
mx AS (SELECT max(n_flows) AS m FROM flows),
edges AS (SELECT src, dst FROM flows, mx WHERE n_flows * 2 >= m),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
auth1 AS (
  SELECT n.node,
         CAST(coalesce((SELECT count(*) FROM edges e WHERE e.dst = n.node), 0)
              AS BIGINT) AS auth
  FROM nodes n
),
hub1 AS (
  SELECT n.node,
         CAST(coalesce((SELECT sum(a.auth) FROM edges e
                        JOIN auth1 a ON a.node = e.dst
                        WHERE e.src = n.node), 0) AS BIGINT) AS hub
  FROM nodes n
),
auth2 AS (
  SELECT n.node,
         CAST(coalesce((SELECT sum(h.hub) FROM edges e
                        JOIN hub1 h ON h.node = e.src
                        WHERE e.dst = n.node), 0) AS BIGINT) AS auth
  FROM nodes n
),
hub2 AS (
  SELECT n.node,
         CAST(coalesce((SELECT sum(a.auth) FROM edges e
                        JOIN auth2 a ON a.node = e.dst
                        WHERE e.src = n.node), 0) AS BIGINT) AS hub
  FROM nodes n
)
SELECT h.node, h.hub, a.auth
FROM hub2 h JOIN auth2 a ON h.node = a.node
"""


# ---------------------------------------------------------------------------
# Q: frequent sequential patterns over per-conversation tool calls
# ---------------------------------------------------------------------------


def q_frequent_subseqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_support=10 prunes real patterns at sf0.001 (15 conversations)
    and keeps the 5-tool vocabulary fan-out bounded at any scale."""
    from .operators.sequence import frequent_subsequences

    tx = transcripts_from_events(spark, sf_dir)
    return frequent_subsequences(
        tx, seq_col="conv_id", order_col="turn_idx", item_col="tool",
        min_support=10, max_len=3,
    ).select("pattern", "length", "support")


# Oracle: brute-force position-level joins. Anti-monotonicity makes the
# unpruned brute force return exactly the frequent sets the levelwise
# Spark miner emits.
FREQUENT_SUBSEQS_SQL = f"""
{TX_SQL},
calls AS (
  SELECT conv_id AS seq, turn_idx AS pos, tool AS item
  FROM tx WHERE tool <> ''
),
l1 AS (
  SELECT item AS pattern, 1 AS length,
         CAST(count(DISTINCT seq) AS BIGINT) AS support
  FROM calls GROUP BY item HAVING count(DISTINCT seq) >= 10
),
l2 AS (
  SELECT a.item || '>' || b.item AS pattern, 2 AS length,
         CAST(count(DISTINCT a.seq) AS BIGINT) AS support
  FROM calls a JOIN calls b ON a.seq = b.seq AND a.pos < b.pos
  GROUP BY a.item, b.item HAVING count(DISTINCT a.seq) >= 10
),
l3 AS (
  SELECT a.item || '>' || b.item || '>' || c.item AS pattern, 3 AS length,
         CAST(count(DISTINCT a.seq) AS BIGINT) AS support
  FROM calls a
  JOIN calls b ON a.seq = b.seq AND a.pos < b.pos
  JOIN calls c ON b.seq = c.seq AND b.pos < c.pos
  GROUP BY a.item, b.item, c.item HAVING count(DISTINCT a.seq) >= 10
)
SELECT pattern, CAST(length AS INT) AS length, support FROM l1
UNION ALL SELECT pattern, CAST(length AS INT), support FROM l2
UNION ALL SELECT pattern, CAST(length AS INT), support FROM l3
"""


# ---------------------------------------------------------------------------
# Q: unary inclusion-dependency discovery across the TPC-H key columns
# ---------------------------------------------------------------------------


def q_ind_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seven key/foreign-key columns across five tables: the genuine
    TPC-H INDs (c_nationkey ⊆ n_nationkey, s_nationkey ⊆ n_nationkey,
    n_regionkey ⊆ r_regionkey, o_custkey ⊆ c_custkey) must come out with
    holds=1; reverse directions exercise the partial-containment path."""
    from .graph.constraints import discover_unary_inds

    attrs = [
        ("nation.n_nationkey", _t(spark, sf_dir, "nation"), "n_nationkey"),
        ("nation.n_regionkey", _t(spark, sf_dir, "nation"), "n_regionkey"),
        ("region.r_regionkey", _t(spark, sf_dir, "region"), "r_regionkey"),
        ("customer.c_nationkey", _t(spark, sf_dir, "customer"), "c_nationkey"),
        ("customer.c_custkey", _t(spark, sf_dir, "customer"), "c_custkey"),
        ("supplier.s_nationkey", _t(spark, sf_dir, "supplier"), "s_nationkey"),
        ("orders.o_custkey", _t(spark, sf_dir, "orders"), "o_custkey"),
    ]
    return discover_unary_inds(attrs).select(
        "dep", "ref", "n_dep", "n_common", "holds", "containment_x1e6"
    )


IND_PROFILE_SQL = """
WITH raw AS (
  SELECT 'nation.n_nationkey' AS attr, CAST(n_nationkey AS VARCHAR) AS value
  FROM nation WHERE n_nationkey IS NOT NULL
  UNION ALL
  SELECT 'nation.n_regionkey', CAST(n_regionkey AS VARCHAR) FROM nation
  WHERE n_regionkey IS NOT NULL
  UNION ALL
  SELECT 'region.r_regionkey', CAST(r_regionkey AS VARCHAR) FROM region
  WHERE r_regionkey IS NOT NULL
  UNION ALL
  SELECT 'customer.c_nationkey', CAST(c_nationkey AS VARCHAR) FROM customer
  WHERE c_nationkey IS NOT NULL
  UNION ALL
  SELECT 'customer.c_custkey', CAST(c_custkey AS VARCHAR) FROM customer
  WHERE c_custkey IS NOT NULL
  UNION ALL
  SELECT 'supplier.s_nationkey', CAST(s_nationkey AS VARCHAR) FROM supplier
  WHERE s_nationkey IS NOT NULL
  UNION ALL
  SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  WHERE o_custkey IS NOT NULL
),
dv AS (SELECT DISTINCT attr, value FROM raw),
pair_counts AS (
  SELECT a.attr AS dep, b.attr AS ref, CAST(count(*) AS BIGINT) AS n_common
  FROM dv a JOIN dv b USING (value) GROUP BY a.attr, b.attr
)
SELECT p.dep, p.ref, t.n_common AS n_dep, p.n_common,
       CAST(CASE WHEN p.n_common = t.n_common THEN 1 ELSE 0 END AS INT)
         AS holds,
       CAST(p.n_common * 1000000 // t.n_common AS BIGINT)
         AS containment_x1e6
FROM pair_counts p
JOIN pair_counts t ON t.dep = p.dep AND t.ref = p.dep
WHERE p.dep <> p.ref
"""


# ---------------------------------------------------------------------------
# Q: k-anonymity risk profile over event quasi-identifiers
# ---------------------------------------------------------------------------


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifiers = (event_type, day, value decile bucket): coarse
    enough that most classes are large, fine enough that some day/type
    combinations fall below k — both branches of the risk agg exercise."""
    from .operators.text import k_anonymity_profile

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.floor(F.col("value") / 100).cast("long").alias("vband"),
    )
    return k_anonymity_profile(
        ev, ["event_type", "day", "vband"], k_thresholds=(2, 5, 20)
    ).select("k", "n_classes", "classes_below", "rows_at_risk", "risk_x1e6")


K_ANONYMITY_SQL = """
WITH ev AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(floor(value / 100) AS BIGINT) AS vband
  FROM events
),
classes AS (
  SELECT event_type, day, vband, CAST(count(*) AS BIGINT) AS sz
  FROM ev GROUP BY event_type, day, vband
),
fan AS (
  SELECT sz, k FROM classes, (VALUES (2), (5), (20)) AS t(k)
)
SELECT CAST(k AS INT) AS k,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS classes_below,
       CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT) AS rows_at_risk,
       CAST(CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
            * 1000000 // CAST(sum(sz) AS BIGINT) AS BIGINT) AS risk_x1e6
FROM fan GROUP BY k
"""


# ---------------------------------------------------------------------------
# Q: resource-allocation link prediction over the user<->event-type graph
# ---------------------------------------------------------------------------


def q_ra_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-allocation index (Zhou 2009) over the same bipartite
    user<->event-type graph as `neighborhood_overlap`: the degree-weighted
    merge-candidate ranking — pairs sharing only hub event types score near
    zero even when their raw common-neighbor count clears the bar."""
    from .operators.graph_algos import resource_allocation

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return resource_allocation(edges, min_common=4)


RA_LINKPRED_SQL = """
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
    FROM events
    UNION ALL
    SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) FROM events
  )
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src)
SELECT a.src AS node_a, b.src AS node_b,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(CAST(1000000 AS BIGINT) // dz.deg) AS BIGINT) AS ra_x1e6
FROM e0 a
JOIN e0 b ON a.dst = b.dst AND a.src < b.src
JOIN deg dz ON dz.src = a.dst
GROUP BY 1, 2
HAVING count(*) >= 4
"""


# ---------------------------------------------------------------------------
# Q: two-sample Kolmogorov-Smirnov drift on the event value column
# ---------------------------------------------------------------------------


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-integer two-sample KS between even-event values and odd-event
    values shifted by +25 (pre-scaled to x1e6 integers per row) — the
    ordered-value drift lens beside type_drift's categorical TVD. The
    injected +25 shift guarantees a decisive D; the even/odd split is the
    same-distribution null underneath it."""
    from .operators.temporal import ks_two_sample

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    scaled = F.floor(
        F.col("value") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    a = ev.filter(F.col("event_id") % 2 == 0).select(scaled.alias("v"))
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        (scaled + F.lit(25000000)).alias("v")
    )
    return ks_two_sample(a, b, "v")


KS_DRIFT_SQL = """
WITH av AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
bv AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) + 25000000 AS v
  FROM events WHERE event_id % 2 = 1
),
cnt AS (
  SELECT v,
         CAST(sum(ia) AS BIGINT) AS ca,
         CAST(sum(ib) AS BIGINT) AS cb
  FROM (
    SELECT v, 1 AS ia, 0 AS ib FROM av
    UNION ALL
    SELECT v, 0, 1 FROM bv
  )
  GROUP BY v
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM cnt
),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
  FROM cnt
),
d AS (
  SELECT v, abs(cuma * t.nb - cumb * t.na) AS dnum
  FROM cum, tot t
),
sel AS (SELECT v, dnum FROM d ORDER BY dnum DESC, v ASC LIMIT 1)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(s.dnum AS BIGINT) AS d_num,
       CAST(CAST(s.dnum AS BIGINT) * CAST(1000000 AS BIGINT)
            // (t.na * t.nb) AS BIGINT) AS ks_x1e6,
       s.v AS at_value
FROM sel s, tot t
"""


# ---------------------------------------------------------------------------
# Q: degree assortativity of the user<->event-type graph
# ---------------------------------------------------------------------------


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity over the bipartite user<->event-type
    graph — strongly negative by construction (few hub types, many
    low-degree users), the KG-profile readout that flags hub-skewed
    traversals before they run."""
    from .operators.graph_algos import degree_assortativity

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return degree_assortativity(edges)


ASSORTATIVITY_SQL = """
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
    FROM events
    UNION ALL
    SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) FROM events
  )
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
ed AS (
  SELECT dx.deg AS dx, dy.deg AS dy
  FROM e0
  JOIN deg dx ON dx.src = e0.src
  JOIN deg dy ON dy.src = e0.dst
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS m, CAST(sum(dx) AS BIGINT) AS s
  FROM ed
),
dev AS (
  SELECT
    least(CAST(10000 AS BIGINT), greatest(CAST(-10000 AS BIGINT),
      (dx * t.m - t.s) // t.s * 1000
      + (dx * t.m - t.s) % t.s * 1000 // t.s)) AS ddx,
    least(CAST(10000 AS BIGINT), greatest(CAST(-10000 AS BIGINT),
      (dy * t.m - t.s) // t.s * 1000
      + (dy * t.m - t.s) % t.s * 1000 // t.s)) AS ddy
  FROM ed, tot t
),
rolled AS (
  SELECT CAST(sum(ddx * ddy) AS BIGINT) AS num,
         CAST(sum(ddx * ddx) AS BIGINT) AS sxx,
         CAST(sum(ddy * ddy) AS BIGINT) AS syy
  FROM dev
)
SELECT t.m AS m_edges, t.s AS s_deg, num, sxx, syy,
       CAST(CASE WHEN sxx = 0 OR syy = 0 THEN 0
            ELSE (CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (abs(num) * 1000 // sxx)
                 * (abs(num) * 1000 // syy) END AS BIGINT) AS r2_x1e6
FROM rolled, tot t
"""


# ---------------------------------------------------------------------------
# Q: Weisfeiler-Leman structural color classes of the user<->type graph
# ---------------------------------------------------------------------------


def q_wl_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round WL refinement over the customer/supplier–nation–region
    tree, starting from the node-kind letter: customers split by their
    nation's population profile (two customers are same-colored iff their
    nations host identical customer/supplier counts), nations by their
    own neighborhood shape — the color-class profile (color, n_nodes) is
    the subgraph-dedup readout. (The user<->event-type graph is complete
    at every SF — every user hits all 5 types — so WL there collapses to
    2 classes; this tree actually refines.)"""
    from .operators.graph_algos import wl_colors

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    edges = (
        cust.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
        )
        .unionByName(
            supp.select(
                F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
                F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
            )
        )
        .unionByName(
            nat.select(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("src"),
                F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
            )
        )
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.select("node", F.substring("node", 1, 1).alias("label"))
    return (
        wl_colors(edges, labels, rounds=2)
        .groupBy("color")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


_WL_ROUND_SQL = """
d{r} AS (
  SELECT e.src AS node,
         CAST(sum(CAST(concat('0x', substr(md5(c.color), 1, 8)) AS BIGINT))
              AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS d
  FROM e0 e JOIN c{p} c ON c.node = e.dst
  GROUP BY e.src
),
c{r} AS (
  SELECT c.node,
         md5(c.color || '#' || CAST(coalesce(d.s, 0) AS VARCHAR)
             || '#' || CAST(coalesce(d.d, 0) AS VARCHAR)) AS color
  FROM c{p} c LEFT JOIN d{r} d ON d.node = c.node
)"""

WL_CLASSES_SQL = (
    """
WITH raw AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
         'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR),
         'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR),
         'r' || CAST(n_regionkey AS VARCHAR) FROM nation
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  )
),
c0 AS (
  SELECT node, substr(node, 1, 1) AS color
  FROM (SELECT DISTINCT src AS node FROM e0)
),"""
    + _WL_ROUND_SQL.format(r=1, p=0)
    + ","
    + _WL_ROUND_SQL.format(r=2, p=1)
    + """
SELECT color, CAST(count(*) AS BIGINT) AS n_nodes
FROM c2 GROUP BY color
"""
)


# ---------------------------------------------------------------------------
# Q: unique-column-combination (key) discovery over orders
# ---------------------------------------------------------------------------

_UCC_COMBOS = [
    ("o_orderkey", ["o_orderkey"]),
    ("o_custkey", ["o_custkey"]),
    ("o_orderstatus", ["o_orderstatus"]),
    ("o_orderdate", ["o_orderdate"]),
    ("o_custkey,o_orderdate", ["o_custkey", "o_orderdate"]),
    ("o_custkey,o_orderstatus", ["o_custkey", "o_orderstatus"]),
    ("o_orderstatus,o_orderdate", ["o_orderstatus", "o_orderdate"]),
    ("o_orderkey,o_orderstatus", ["o_orderkey", "o_orderstatus"]),
]


def q_ucc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key discovery over orders: o_orderkey is the minimal UCC,
    (o_orderkey, o_orderstatus) is unique but NON-minimal (dominated by
    its singleton), and the non-key combos report their duplicate-class
    profile — the readout merge_upsert key choice runs on."""
    from .graph.constraints import discover_uccs

    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.col("o_orderdate").cast("string")
    )
    return discover_uccs(orders, _UCC_COMBOS)


def _ucc_branch(name: str, cols: list[str]) -> str:
    rendered = " || '|' || ".join(
        f"coalesce(CAST({c} AS VARCHAR), 'NULL')" for c in cols
    )
    return f"SELECT '{name}' AS combo, {rendered} AS val FROM o"


UCC_PROFILE_SQL = (
    """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
  FROM orders
),
vals AS (
"""
    + "\n  UNION ALL\n".join(
        "  " + _ucc_branch(name, cols) for name, cols in _UCC_COMBOS
    )
    + """
),
vc AS (
  SELECT combo, val, CAST(count(*) AS BIGINT) AS cnt
  FROM vals GROUP BY combo, val
),
per AS (
  SELECT combo,
         CAST(sum(cnt) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(max(cnt) AS BIGINT) AS max_group
  FROM vc GROUP BY combo
),
flags AS (
  SELECT *, CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
           AS is_unique
  FROM per
),
dominated AS (
  SELECT DISTINCT p.combo
  FROM flags p JOIN flags s
    ON s.combo <> p.combo
   AND strpos(',' || p.combo || ',', ',' || s.combo || ',') > 0
   AND strpos(s.combo, ',') = 0
   AND s.is_unique = 1
)
SELECT f.combo, f.n_rows, f.n_distinct, f.max_group, f.is_unique,
       CAST(CASE WHEN f.is_unique = 1 AND d.combo IS NULL THEN 1 ELSE 0 END
            AS BIGINT) AS is_minimal_unique
FROM flags f LEFT JOIN dominated d ON d.combo = f.combo
"""
)


# ---------------------------------------------------------------------------
# Q: DP geometric-mechanism count release per event type
# ---------------------------------------------------------------------------


def q_dp_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided-geometric (discrete Laplace) DP release of the per-type
    event counts at epsilon = ln 2 — the perturbation mechanism beside
    the k-anon/l-div/t-closeness risk readouts; hash-seeded so the
    oracle replays the draw (see the operator's honesty note)."""
    from .operators.text import dp_geometric_release

    ev = _t(spark, sf_dir, "events")
    return dp_geometric_release(ev, "event_type", eps_log2=1, seed="dp")


DP_TYPE_COUNTS_SQL = """
WITH counts AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type
),
noise AS (
  SELECT event_type, n,
    least(CAST(bit_count((ha & -ha) - 1) AS BIGINT), 40) AS g1,
    least(CAST(bit_count((hb & -hb) - 1) AS BIGINT), 40) AS g2
  FROM (
    SELECT event_type, n,
      CAST(concat('0x', substr(md5('dp' || '#' || 'a' || '#' || event_type),
           1, 15)) AS BIGINT) AS ha,
      CAST(concat('0x', substr(md5('dp' || '#' || 'b' || '#' || event_type),
           1, 15)) AS BIGINT) AS hb
    FROM counts
  )
)
SELECT event_type, CAST(n + g1 - g2 AS BIGINT) AS n_released
FROM noise
"""


# ---------------------------------------------------------------------------
# Q: Soundex phonetic blocking pairs over part-name lead tokens
# ---------------------------------------------------------------------------


def q_soundex_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic ER blocking: part-name tokens plus deterministic
    vowel-rotated misspellings (translate aeiou->oieau — Soundex is
    vowel-blind, so every misspelling rejoins its original's block BY
    CONSTRUCTION, beside genuine collisions like red/rod), paired within
    a shared simplified-Soundex code — the sound-alike candidate set
    spelling-distance blocking (snm_levenshtein, ED-1) cannot produce."""
    from .functions.scalars import soundex_expr

    part = _t(spark, sf_dir, "part")
    base = part.select(
        F.explode(F.split(F.col("p_name"), " ")).alias("tok")
    ).distinct()
    toks = base.unionByName(
        base.select(F.translate("tok", "aeiou", "oieau").alias("tok"))
    ).distinct()
    coded = toks.select(
        "tok", soundex_expr(F.col("tok")).alias("code")
    ).filter(F.col("code") != "")
    a = coded.select(F.col("code"), F.col("tok").alias("tok_a"))
    b = coded.select(F.col("code"), F.col("tok").alias("tok_b"))
    return a.join(b, "code").filter(F.col("tok_a") < F.col("tok_b")).select(
        "code", "tok_a", "tok_b"
    )


SOUNDEX_BLOCKS_SQL = """
WITH base AS (
  SELECT DISTINCT unnest(string_split(p_name, ' ')) AS tok FROM part
),
toks AS (
  SELECT DISTINCT tok FROM (
    SELECT tok FROM base
    UNION ALL
    SELECT translate(tok, 'aeiou', 'oieau') FROM base
  )
),
s AS (
  SELECT tok, upper(regexp_replace(tok, '[^A-Za-z]', '', 'g')) AS su
  FROM toks
),
c AS (
  SELECT tok, su,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(
             translate(su, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                           '01230120022455012623010202'),
           '11+', '1', 'g'), '22+', '2', 'g'), '33+', '3', 'g'),
           '44+', '4', 'g'), '55+', '5', 'g'), '66+', '6', 'g') AS code0
  FROM s
),
sx AS (
  SELECT tok,
         CASE WHEN su = '' THEN ''
              ELSE substr(su, 1, 1) ||
                   rpad(substr(regexp_replace(substr(code0, 2), '0', '', 'g'),
                        1, 3), 3, '0')
         END AS code
  FROM c
)
SELECT a.code AS code, a.tok AS tok_a, b.tok AS tok_b
FROM sx a JOIN sx b ON a.code = b.code AND a.tok < b.tok
WHERE a.code <> ''
"""


# ---------------------------------------------------------------------------
# Q: densest-subgraph peeling over a clique-plus-periphery graph
# ---------------------------------------------------------------------------


def q_densest_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bahmani-peeling stats over a deterministic clique+periphery graph:
    the 25-nation clique (density 12) wrapped in the degree-1
    customer->nation periphery. Round 1 peels the periphery and the
    density readout jumps to the clique's 12.0 — the max row IS the
    densest core the approximation finds before overshooting."""
    from .operators.graph_algos import densest_subgraph

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    periphery = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    na = nat.select(F.col("n_nationkey").alias("a"))
    nb = nat.select(F.col("n_nationkey").alias("b"))
    clique = (
        na.crossJoin(nb)
        .filter(F.col("a") < F.col("b"))
        .select(
            F.concat(F.lit("n"), F.col("a").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("b").cast("string")).alias("dst"),
        )
    )
    return densest_subgraph(periphery.unionByName(clique), rounds=2)


DENSEST_ROUNDS_SQL = """
WITH raw AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
         'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
  UNION ALL
  SELECT 'n' || CAST(a.n_nationkey AS VARCHAR),
         'n' || CAST(b.n_nationkey AS VARCHAR)
  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst
),
t0 AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS m FROM e0),
deg0 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
keep0 AS (SELECT d.src FROM deg0 d, t0 WHERE d.deg * 10 * t0.v >= 11 * t0.m),
e1 AS (
  SELECT e.src, e.dst FROM e0 e
  JOIN keep0 a ON a.src = e.src
  JOIN keep0 b ON b.src = e.dst
),
t1 AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS m FROM e1),
deg1 AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e1 GROUP BY src),
keep1 AS (SELECT d.src FROM deg1 d, t1 WHERE d.deg * 10 * t1.v >= 11 * t1.m),
e2 AS (
  SELECT e.src, e.dst FROM e1 e
  JOIN keep1 a ON a.src = e.src
  JOIN keep1 b ON b.src = e.dst
),
t2 AS (SELECT CAST(count(DISTINCT src) AS BIGINT) AS v,
              CAST(count(*) AS BIGINT) AS m FROM e2)
SELECT CAST(0 AS BIGINT) AS round, v AS n_nodes, m // 2 AS n_edges,
       CASE WHEN v = 0 THEN 0 ELSE m // 2 * 1000000 // v END AS density_x1e6
FROM t0
UNION ALL
SELECT CAST(1 AS BIGINT), v, m // 2,
       CASE WHEN v = 0 THEN 0 ELSE m // 2 * 1000000 // v END FROM t1
UNION ALL
SELECT CAST(2 AS BIGINT), v, m // 2,
       CASE WHEN v = 0 THEN 0 ELSE m // 2 * 1000000 // v END FROM t2
"""


# ---------------------------------------------------------------------------
# Q: encoding-anomaly (mojibake) screen with injected corruption
# ---------------------------------------------------------------------------


def q_encoding_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-integrity screen over documents with deterministic
    injected corruption (doc_id residues get a mojibake 'é'-as-Latin-1,
    a U+FFFD, or a mis-decoded smart quote appended) — the clean corpus
    underneath calibrates the zero rows."""
    from .operators.text import encoding_anomaly_report

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    fixture = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 11 == 0, F.lit("Ã©")).otherwise(
                F.lit("")
            ),
            F.when(F.col("doc_id") % 13 == 0, F.lit("�")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 17 == 0, F.lit("â")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return encoding_anomaly_report(fixture)


ENCODING_ANOMALIES_SQL = """
WITH d AS (
  SELECT doc_id,
         coalesce(text, '')
         || CASE WHEN doc_id % 11 = 0 THEN chr(195) || chr(169) ELSE '' END
         || CASE WHEN doc_id % 13 = 0 THEN chr(65533) ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN chr(226) || chr(128) || chr(153) ELSE '' END AS text
  FROM documents
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
markers AS (
  SELECT * FROM (VALUES
    ('mojibake_a_tilde', chr(195)),
    ('mojibake_smartq', chr(226) || chr(128)),
    ('mojibake_a_caret', chr(194)),
    ('replacement_char', chr(65533)),
    ('bom_in_body', chr(239) || chr(187) || chr(191)),
    ('nul_byte', chr(0))
  ) AS t(anomaly, marker)
),
fan AS (
  SELECT m.anomaly,
         CASE WHEN strpos(d.text, m.marker) > 0 THEN 1 ELSE 0 END AS hit
  FROM d, markers m
)
SELECT anomaly,
       CAST(sum(hit) AS BIGINT) AS n_docs,
       (SELECT n FROM tot) AS n_total,
       CAST(CAST(sum(hit) AS BIGINT) * 1000000
            // greatest((SELECT n FROM tot), 1) AS BIGINT) AS share_x1e6
FROM fan GROUP BY anomaly
"""


# ---------------------------------------------------------------------------
# Q: split conformal calibration on the event value column
# ---------------------------------------------------------------------------


def q_conformal_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal at alpha=0.10: calibrate qhat on even-event scores,
    audit coverage on odd-event scores — same-distribution halves, so the
    audited coverage lands at the >= 90% guarantee."""
    from .operators.classifier import conformal_report

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    scaled = F.floor(
        F.col("value") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    cal = ev.filter(F.col("event_id") % 2 == 0).select(scaled.alias("score"))
    test = ev.filter(F.col("event_id") % 2 == 1).select(scaled.alias("score"))
    return conformal_report(cal, test, "score", alpha_x100=10)


CONFORMAL_VALUE_SQL = """
WITH c AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
t AS (
  SELECT CAST(floor(value * CAST(1000000 AS DOUBLE)
              + CAST(0.5 AS DOUBLE)) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 1
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM c),
kk AS (
  SELECT n_cal,
         least(greatest(((n_cal + 1) * 90 + 99) // 100, 1), n_cal) AS k
  FROM n
),
cum AS (
  SELECT v, CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
  FROM (SELECT v, count(*) AS cnt FROM c GROUP BY v)
),
q AS (SELECT min(v) AS qhat FROM cum, kk WHERE cum.cum >= kk.k)
SELECT kk.n_cal AS n_cal,
       CAST(kk.k AS BIGINT) AS k_rank,
       q.qhat AS qhat,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.v <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
         AS n_covered,
       CAST(CAST(sum(CASE WHEN t.v <= q.qhat THEN 1 ELSE 0 END) AS BIGINT)
            * 1000000 // greatest(count(*), 1) AS BIGINT) AS coverage_x1e6
FROM t, kk, q
GROUP BY kk.n_cal, kk.k, q.qhat
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
    from .operators.dialogue import tool_cache_hits

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
# Q: Wasserstein-1 drift on unit-bucketed event values
# ---------------------------------------------------------------------------


def q_w1_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earth-mover distance between even-event unit-bucketed values and
    odd-event values shifted +25: W1 prices the shift at ~25 units
    (w1_x1e6 ~ 25e6) where ks_drift only reports the crossing — the
    integral drift lens beside KS's max and TVD's categorical view."""
    from .operators.temporal import wasserstein_two_sample

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    bucket = F.floor(F.col("value")).cast("long")
    a = ev.filter(F.col("event_id") % 2 == 0).select(bucket.alias("v"))
    b = ev.filter(F.col("event_id") % 2 == 1).select(
        (bucket + F.lit(25)).alias("v")
    )
    return wasserstein_two_sample(a, b, "v")


W1_DRIFT_SQL = """
WITH av AS (
  SELECT CAST(floor(value) AS BIGINT) AS v
  FROM events WHERE event_id % 2 = 0
),
bv AS (
  SELECT CAST(floor(value) AS BIGINT) + 25 AS v
  FROM events WHERE event_id % 2 = 1
),
cnt AS (
  SELECT v,
         CAST(sum(ia) AS BIGINT) AS ca,
         CAST(sum(ib) AS BIGINT) AS cb
  FROM (
    SELECT v, 1 AS ia, 0 AS ib FROM av
    UNION ALL
    SELECT v, 0, 1 FROM bv
  )
  GROUP BY v
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM cnt
),
cum AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS BIGINT) AS cumb,
         lead(v) OVER (ORDER BY v) AS nv
  FROM cnt
),
d AS (
  SELECT abs(cuma * t.nb - cumb * t.na) * (coalesce(nv, v) - v) AS term
  FROM cum, tot t
)
SELECT t.na AS n_a, t.nb AS n_b,
       CAST(coalesce(sum(term), 0) AS BIGINT) AS w1_num,
       -- staged quotient: same headroom contract as the operator
       CAST(CAST(coalesce(sum(term), 0) AS BIGINT)
              // greatest(t.na, 1) // greatest(t.nb, 1)
              * CAST(1000000 AS BIGINT)
            + CAST(coalesce(sum(term), 0) AS BIGINT)
              % (greatest(t.na, 1) * greatest(t.nb, 1))
              * CAST(1000000 AS BIGINT)
              // (greatest(t.na, 1) * greatest(t.nb, 1)) AS BIGINT)
         AS w1_x1e6
FROM d, tot t
GROUP BY t.na, t.nb
"""


# ---------------------------------------------------------------------------
# Q: Cohen's kappa between two rule raters over documents
# ---------------------------------------------------------------------------


def q_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between a char-length rater and a
    token-count rater labeling docs long/short — correlated rules, so
    kappa lands well above 0 (raw agreement alone would overstate it;
    kappa subtracts the chance floor)."""
    from .operators.classifier import cohens_kappa

    docs = _t(spark, sf_dir, "documents").select(
        F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    labeled = docs.select(
        F.when(F.length("text") >= 60, F.lit("long"))
        .otherwise(F.lit("short"))
        .alias("rater_a"),
        F.when(
            F.size(
                F.split(
                    F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "), " "
                )
            )
            >= 12,
            F.lit("long"),
        )
        .otherwise(F.lit("short"))
        .alias("rater_b"),
    )
    return cohens_kappa(labeled, "rater_a", "rater_b")


KAPPA_RATERS_SQL = r"""
WITH d AS (SELECT coalesce(text, '') AS text FROM documents),
lab AS (
  SELECT
    CASE WHEN length(text) >= 60 THEN 'long' ELSE 'short' END AS la,
    CASE WHEN len(string_split(
           regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')) >= 12
         THEN 'long' ELSE 'short' END AS lb
  FROM d
),
ct AS (SELECT la, lb, CAST(count(*) AS BIGINT) AS n FROM lab GROUP BY la, lb),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(sum(CASE WHEN la = lb THEN n ELSE 0 END) AS BIGINT) AS diag
  FROM ct
),
pe AS (
  SELECT CAST(coalesce(sum(ra * cb), 0) AS BIGINT) AS pe_num
  FROM (SELECT la, CAST(sum(n) AS BIGINT) AS ra FROM ct GROUP BY la) r
  JOIN (SELECT lb, CAST(sum(n) AS BIGINT) AS cb FROM ct GROUP BY lb) c
    ON r.la = c.lb
)
SELECT t.n AS n, t.diag AS diag, p.pe_num AS pe_num,
       CAST(t.diag * 1000000 // t.n AS BIGINT) AS po_x1e6,
       CAST(CASE WHEN t.n * t.n = p.pe_num THEN 0
            ELSE (CASE WHEN t.diag * t.n - p.pe_num < 0 THEN -1 ELSE 1 END)
                 * (abs(t.diag * t.n - p.pe_num) * 1000000
                    // (t.n * t.n - p.pe_num))
            END AS BIGINT) AS kappa_x1e6
FROM tot t, pe p
"""


# ---------------------------------------------------------------------------
# Q: Markov next-tool model eval, even->odd conversation split
# ---------------------------------------------------------------------------


def q_markov_tool_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit the transition model on even-numbered conversations, score
    top-1 next-tool accuracy on odd ones — the predictability baseline
    any learned tool policy must beat, per predecessor tool."""
    from .operators.dialogue import markov_next_tool_eval

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
# Q: dispersion (variance-to-mean) index per event type
# ---------------------------------------------------------------------------


def q_dispersion_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher dispersion of daily counts per type, with 'click' events on
    2024-01-21 tripled in — the clumped key reads D >> the untouched
    keys, calibrating what the burst/CUSUM detectors should assume."""
    from .operators.temporal import dispersion_index

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    burst = ev.filter(
        (F.col("event_type") == "click")
        & (F.to_date("ts") == F.lit("2024-01-21"))
    )
    return dispersion_index(
        ev.unionAll(burst).unionAll(burst), "event_type", "ts", "day"
    )


DISPERSION_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
),
cnt AS (
  SELECT event_type, date_trunc('day', ts) AS b,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS total,
       CAST(sum(n * n) AS BIGINT) AS sum_sq,
       CAST(CASE WHEN count(*) <= 1 OR sum(n) = 0 THEN 0
            ELSE (count(*) * CAST(sum(n * n) AS BIGINT)
                  - CAST(sum(n) AS BIGINT) * CAST(sum(n) AS BIGINT)) * 1000000
                 // ((count(*) - 1) * CAST(sum(n) AS BIGINT))
            END AS BIGINT) AS dispersion_x1e6
FROM cnt GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# Q: bond-percolation robustness profile of the user<->type graph
# ---------------------------------------------------------------------------

_PERC_RATES = (100, 75, 50, 25)


def q_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bond-percolation robustness: keep each edge iff its md5 draw falls
    under the keep rate (NESTED across rates — the 25% graph is a subset
    of the 50% graph, the standard monotone percolation), then ONE
    connected-components run over the rate-prefixed disjoint union scores
    fragmentation per rate — the giant-component curve that tells a KG
    how sensitive its connectivity is to edge loss (missing extractions,
    filtered predicates). Returns per rate: n_nodes, n_edges,
    n_components, largest, largest_share_x1e6."""
    from .linking.canonicalize import connected_components

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("a"),
        F.concat(F.lit("t"), F.col("event_type")).alias("b"),
    ).distinct()
    h = (
        F.conv(
            F.substring(F.md5(F.concat_ws("#", "a", "b")), 1, 8), 16, 10
        ).cast("long")
        % 100
    )
    rates = F.array(*[F.lit(r) for r in _PERC_RATES])
    fan = (
        base.withColumn("h", h)
        .select("a", "b", "h", F.explode(rates).alias("rate"))
        .filter(F.col("h") < F.col("rate"))
        .localCheckpoint(eager=True)  # edges + per-rate edge counts share it
    )
    pref = lambda r, c: F.concat_ws("|", F.col(r).cast("string"), F.col(c))
    edges = fan.select(pref("rate", "a").alias("src"), pref("rate", "b").alias("dst"))
    node_base = (
        base.select(F.col("a").alias("n"))
        .unionByName(base.select(F.col("b").alias("n")))
        .distinct()
    )
    all_nodes = node_base.select(
        F.explode(rates).alias("rate"), "n"
    ).select(pref("rate", "n").alias("node"))
    cc = connected_components(edges, all_nodes=all_nodes)
    sizes = cc.select(
        F.split("node", r"\|").getItem(0).cast("long").alias("keep_rate"),
        "component",
    ).groupBy("keep_rate", "component").agg(F.count(F.lit(1)).alias("sz"))
    ec = fan.groupBy(F.col("rate").cast("long").alias("keep_rate")).agg(
        F.count(F.lit(1)).alias("n_edges")
    )
    return (
        sizes.groupBy("keep_rate")
        .agg(
            F.sum("sz").cast("long").alias("n_nodes"),
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("largest"),
            F.expr("CAST(max(sz) * 1000000 DIV sum(sz) AS BIGINT)").alias(
                "largest_share_x1e6"
            ),
        )
        .join(F.broadcast(ec), "keep_rate", "left")
        .select(
            "keep_rate",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).cast("long").alias("n_edges"),
            "n_components",
            "largest",
            "largest_share_x1e6",
        )
    )


PERCOLATION_SQL = """
WITH RECURSIVE base AS (
  SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS a,
                  't' || event_type AS b
  FROM events
),
hb AS (
  SELECT a, b,
         CAST(concat('0x', substr(md5(a || '#' || b), 1, 8)) AS BIGINT)
           % 100 AS h
  FROM base
),
fan AS (
  SELECT r, a, b
  FROM hb, (VALUES (100), (75), (50), (25)) AS t(r)
  WHERE h < r
),
edges AS (
  SELECT CAST(r AS VARCHAR) || '|' || a AS src,
         CAST(r AS VARCHAR) || '|' || b AS dst FROM fan
  UNION
  SELECT CAST(r AS VARCHAR) || '|' || b,
         CAST(r AS VARCHAR) || '|' || a FROM fan
),
nodes AS (
  SELECT CAST(r AS VARCHAR) || '|' || n AS node
  FROM (SELECT a AS n FROM base UNION SELECT b FROM base),
       (VALUES (100), (75), (50), (25)) AS t(r)
),
reach(node, lbl) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node, min(lbl) AS c FROM reach GROUP BY node),
sizes AS (
  SELECT CAST(string_split(node, '|')[1] AS BIGINT) AS keep_rate, c,
         CAST(count(*) AS BIGINT) AS sz
  FROM comp GROUP BY 1, 2
),
ec AS (
  SELECT CAST(r AS BIGINT) AS keep_rate, CAST(count(*) AS BIGINT) AS n_edges
  FROM fan GROUP BY 1
)
SELECT s.keep_rate,
       CAST(sum(sz) AS BIGINT) AS n_nodes,
       coalesce(max(ec.n_edges), 0) AS n_edges,
       CAST(count(*) AS BIGINT) AS n_components,
       CAST(max(sz) AS BIGINT) AS largest,
       CAST(CAST(max(sz) AS BIGINT) * 1000000
            // CAST(sum(sz) AS BIGINT) AS BIGINT) AS largest_share_x1e6
FROM sizes s LEFT JOIN ec ON ec.keep_rate = s.keep_rate
GROUP BY s.keep_rate
"""


# ---------------------------------------------------------------------------
# Q: dictionary-encoding advisor over orders columns
# ---------------------------------------------------------------------------


def q_dict_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dictionary-vs-plain byte arithmetic over orders:
    o_orderstatus (3 values) wins big, o_orderkey (all-distinct) reads
    negative — keep it plain; the encoding half of the layout family."""
    from .operators.text import dict_encoding_advisor

    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_orderdate", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    return dict_encoding_advisor(
        orders,
        ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"],
    )


def _dict_branch(c: str) -> str:
    return (
        f"SELECT '{c}' AS col, coalesce(CAST({c} AS VARCHAR), NULL) AS val "
        f"FROM o"
    )


DICT_ADVISOR_SQL = (
    """
WITH o AS (
  SELECT o_orderkey, o_orderstatus, o_orderpriority,
         strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
  FROM orders
),
fan AS (
"""
    + "\n  UNION ALL\n".join(
        "  " + _dict_branch(c)
        for c in ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate"]
    )
    + """
),
vc AS (
  SELECT col, val, CAST(count(*) AS BIGINT) AS n FROM fan GROUP BY col, val
)
SELECT col,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN val IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_distinct,
       CAST(sum(coalesce(length(val), 0) * n) AS BIGINT) AS plain_bytes,
       CAST(sum(coalesce(length(val), 0)) + sum(n) * 4 AS BIGINT)
         AS dict_bytes,
       CAST((CAST(sum(coalesce(length(val), 0) * n) AS BIGINT)
             - (CAST(sum(coalesce(length(val), 0)) AS BIGINT)
                + CAST(sum(n) AS BIGINT) * 4)) * 1000000
            // greatest(CAST(sum(coalesce(length(val), 0) * n) AS BIGINT), 1)
            AS BIGINT) AS savings_x1e6
FROM vc GROUP BY col
"""
)


# ---------------------------------------------------------------------------
# Q: consecutive temporal 3-motif census per user
# ---------------------------------------------------------------------------


def q_temporal_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which ordered event-type triples actually occur back-to-back
    (within 1 day, per user), and how often — the behavioral-pattern
    census beside funnel_3step's single-pattern matcher."""
    from .operators.sequence import temporal_motifs

    ev = _t(spark, sf_dir, "events")
    return temporal_motifs(ev, within_seconds=86400)


TEMPORAL_MOTIFS_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS t0,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         CAST(floor(epoch(ts)) AS BIGINT) AS s0,
         CAST(floor(epoch(lead(ts, 2) OVER w)) AS BIGINT) AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t0, t1, t2, CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE t2 IS NOT NULL AND s2 - s0 <= 86400
GROUP BY t0, t1, t2
"""


# ---------------------------------------------------------------------------
# Q: perceptual-hash near-dup candidates over binary assets
# ---------------------------------------------------------------------------


def q_phash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset near-dup via the banded Hamming join: each asset gets a
    one-bit-perturbed variant (id + 100000, phash XOR one bit keyed by
    id) — every (asset, variant) pair sits at Hamming 1 and MUST surface
    under the n_blocks-1 pigeonhole guarantee; unrelated assets collide
    only by chance. The multimodal dedup path over documents-derived
    payload bytes."""
    from .operators.dedup import simhash_candidates
    from .operators.multimodal import assets_from_documents, phash_signatures

    docs = _t(spark, sf_dir, "documents")
    sig = phash_signatures(assets_from_documents(docs, limit=200))
    variants = sig.select(
        (F.col("asset_id") + 100000).alias("asset_id"),
        F.expr(
            "phash ^ shiftleft(CAST(1 AS BIGINT), CAST(asset_id % 60 AS INT))"
        ).alias("phash"),
    )
    all_sig = sig.unionByName(variants).select(
        F.col("asset_id").alias("doc_id"), F.col("phash").alias("simhash")
    )
    return simhash_candidates(
        all_sig, bits=60, n_blocks=4, max_hamming=3
    ).select(
        F.col("id_a").alias("asset_a"),
        F.col("id_b").alias("asset_b"),
        "hamming",
    )


PHASH_DUPS_SQL = """
WITH sig AS (
  SELECT doc_id AS asset_id,
         -- DuckDB's md5 takes VARCHAR and hashes its UTF-8 bytes — the
         -- same bytes Spark's md5(payload) sees (payload = encode(text))
         CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS phash
  FROM documents WHERE doc_id < 200
),
allsig AS (
  SELECT asset_id, phash FROM sig
  UNION ALL
  SELECT asset_id + 100000,
         xor(phash, CAST(1 AS BIGINT) << CAST(asset_id % 60 AS INT))
  FROM sig
),
blocks AS (
  SELECT asset_id, phash, b,
         (phash >> (b * 15)) & 32767 AS val
  FROM allsig, (VALUES (0), (1), (2), (3)) AS t(b)
),
cand AS (
  SELECT DISTINCT a.asset_id AS asset_a, b.asset_id AS asset_b,
         CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
  FROM blocks a JOIN blocks b ON a.b = b.b AND a.val = b.val
   AND a.asset_id < b.asset_id
)
SELECT asset_a, asset_b, hamming FROM cand WHERE hamming <= 3
"""


# ---------------------------------------------------------------------------
# Q: rich-club coefficient of the clique+periphery graph
# ---------------------------------------------------------------------------


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club curve over the nation-clique + customer-periphery graph:
    above k=23 only the 25 clique nations remain and phi hits exactly
    1e6 — the elite-core readout that complements assortativity's
    edge-level correlation (same graph as densest_rounds)."""
    from .operators.graph_algos import rich_club

    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    periphery = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    na = nat.select(F.col("n_nationkey").alias("a"))
    nb = nat.select(F.col("n_nationkey").alias("b"))
    clique = (
        na.crossJoin(nb)
        .filter(F.col("a") < F.col("b"))
        .select(
            F.concat(F.lit("n"), F.col("a").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("b").cast("string")).alias("dst"),
        )
    )
    return rich_club(periphery.unionByName(clique), thresholds=(2, 8, 23))


RICH_CLUB_SQL = """
WITH raw AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
         'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
  UNION ALL
  SELECT 'n' || CAST(a.n_nationkey AS VARCHAR),
         'n' || CAST(b.n_nationkey AS VARCHAR)
  FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src),
ed AS (
  SELECT least(da.deg, db.deg) AS mindeg
  FROM e0
  JOIN deg da ON da.src = e0.src
  JOIN deg db ON db.src = e0.dst
  WHERE e0.src < e0.dst
),
ks AS (SELECT * FROM (VALUES (2), (8), (23)) AS t(k)),
ek AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_edges
  FROM ed, ks WHERE mindeg > k GROUP BY k
),
nk AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_nodes
  FROM deg, ks WHERE deg > k GROUP BY k
)
SELECT CAST(nk.k AS BIGINT) AS k, nk.n_nodes,
       coalesce(ek.n_edges, 0) AS n_edges,
       CAST(CASE WHEN nk.n_nodes <= 1 THEN 0
            ELSE 2 * coalesce(ek.n_edges, 0) * 1000000
                 // (nk.n_nodes * (nk.n_nodes - 1)) END AS BIGINT)
         AS phi_x1e6
FROM nk LEFT JOIN ek ON ek.k = nk.k
"""


# ---------------------------------------------------------------------------
# Q: seasonally-adjusted residual anomalies per (type, dow, hour) cell
# ---------------------------------------------------------------------------


def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cells whose hourly counts spike against their OWN day-of-week x
    hour baseline: 'click' events on 2024-01-21 12:00-13:00 UTC are
    quadrupled, so exactly that cell family flags — anomalies the raw
    median screen dilutes away. Returns only flagged cells (bounded)."""
    from .operators.temporal import seasonal_anomaly_report

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    spike = ev.filter(
        (F.col("event_type") == "click")
        & (F.to_date("ts") == F.lit("2024-01-21"))
        & (F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 3600") == 12)
    )
    fixture = ev.unionAll(spike).unionAll(spike).unionAll(spike)
    out = seasonal_anomaly_report(fixture, "event_type", "ts", k_mad=3)
    return out.filter(F.col("n_anom") > 0)


SEASONAL_ANOMALIES_SQL = """
WITH base AS (
  SELECT event_type, ts FROM events
),
spike AS (
  SELECT event_type, ts FROM base
  WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-21'
    AND CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 = 12
),
ev AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM spike
  UNION ALL SELECT * FROM spike
  UNION ALL SELECT * FROM spike
),
obs AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS INT)
           AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2, 3
),
cells AS (
  SELECT event_type, CAST((d + 4) % 7 AS INT) AS dow, hour, n FROM obs
),
med AS (
  SELECT event_type, dow, hour, CAST(median(n) * 2 AS BIGINT) AS med2
  FROM cells GROUP BY 1, 2, 3
),
dev AS (
  SELECT c.event_type, c.dow, c.hour, c.n, m.med2,
         abs(c.n * 2 - m.med2) AS dd
  FROM cells c JOIN med m USING (event_type, dow, hour)
),
mad AS (
  SELECT event_type, dow, hour, CAST(median(dd) * 2 AS BIGINT) AS mad2
  FROM dev GROUP BY 1, 2, 3
)
SELECT d.event_type, d.dow, d.hour,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(max(d.med2) AS BIGINT) AS med2,
       CAST(max(m.mad2) AS BIGINT) AS mad2,
       CAST(sum(CASE WHEN d.dd * 2 > 3 * m.mad2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anom
FROM dev d JOIN mad m USING (event_type, dow, hour)
GROUP BY 1, 2, 3
HAVING sum(CASE WHEN d.dd * 2 > 3 * m.mad2 THEN 1 ELSE 0 END) > 0
"""


# ---------------------------------------------------------------------------
# Q: persistent daily top-k heavy hitters
# ---------------------------------------------------------------------------


def q_persistent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users appearing in the daily top-10 by event count on >= 3 days —
    persistence separates every-day power users from one-day spikes that
    top a single chart."""
    from .operators.ranking import persistent_topk

    ev = _t(spark, sf_dir, "events")
    return persistent_topk(ev, "user_id", "ts", k=10, min_days=3)


PERSISTENT_USERS_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT user_id, d, n,
         row_number() OVER (PARTITION BY d ORDER BY n DESC, user_id ASC)
           AS rk
  FROM daily
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS days_in_topk,
       CAST(min(rk) AS BIGINT) AS best_rank,
       CAST(sum(n) AS BIGINT) AS total_in_topk
FROM ranked WHERE rk <= 10
GROUP BY user_id
HAVING count(*) >= 3
"""


# ---------------------------------------------------------------------------
# Q: pass@k over event types as tasks
# ---------------------------------------------------------------------------


def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@1 / pass@5 per task (event type as the task id, value > 900
    as 'correct') — the sampled-generation eval metric; rare successes
    make pass@5 >> pass@1, exactly the rejection-sampling story."""
    from .operators.classifier import pass_at_k

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("value") > 900).alias("ok")
    )
    return pass_at_k(ev, "event_type", "ok", k=5)


def _passk_staged_sql(k: int) -> str:
    expr = "CAST(1000000 AS BIGINT)"
    for i in range(k):
        expr = f"(({expr}) * (n - c - {i}) // (n - {i}))"
    return expr


PASS_AT_K_SQL = f"""
WITH agg AS (
  SELECT event_type AS task,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN value > 900 THEN 1 ELSE 0 END) AS BIGINT) AS c
  FROM events GROUP BY event_type
)
SELECT task, n AS n_attempts, c AS n_correct,
       CAST(c * 1000000 // n AS BIGINT) AS pass1_x1e6,
       CAST(CASE WHEN c = 0 THEN 0
            WHEN n - c < 5 THEN 1000000
            ELSE 1000000 - {_passk_staged_sql(5)} END AS BIGINT)
         AS passk_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Q: landmark stress centrality from region nodes over the geo tree
# ---------------------------------------------------------------------------


def q_stress_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stress centrality from the 5 region landmarks over the symmetric
    customer/supplier-nation-region tree (2 BFS rounds): every nation's
    stress = its population (all region->member shortest paths run
    through it) — the load-bearing-node readout, exact integers."""
    from .operators.graph_algos import landmark_stress

    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    edges = (
        cust.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
        )
        .unionByName(
            supp.select(
                F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("src"),
                F.concat(F.lit("n"), F.col("s_nationkey").cast("string")).alias("dst"),
            )
        )
        .unionByName(
            nat.select(
                F.concat(F.lit("n"), F.col("n_nationkey").cast("string")).alias("src"),
                F.concat(F.lit("r"), F.col("n_regionkey").cast("string")).alias("dst"),
            )
        )
    )
    region = _t(spark, sf_dir, "region")
    lms = region.select(
        F.concat(F.lit("r"), F.col("r_regionkey").cast("string")).alias("node")
    )
    out = landmark_stress(edges, lms, rounds=2)
    return out.filter(F.col("stress") > 0)


STRESS_CENTRALITY_SQL = """
WITH raw AS (
  SELECT 'c' || CAST(c_custkey AS VARCHAR) AS src,
         'n' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
  UNION ALL
  SELECT 's' || CAST(s_suppkey AS VARCHAR),
         'n' || CAST(s_nationkey AS VARCHAR) FROM supplier
  UNION ALL
  SELECT 'n' || CAST(n_nationkey AS VARCHAR),
         'r' || CAST(n_regionkey AS VARCHAR) FROM nation
),
e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM raw UNION ALL SELECT dst, src FROM raw
  ) WHERE src <> dst
),
s0 AS (
  SELECT 'r' || CAST(r_regionkey AS VARCHAR) AS lm,
         'r' || CAST(r_regionkey AS VARCHAR) AS node,
         0 AS dist, CAST(1 AS BIGINT) AS sigma
  FROM region
),
f1 AS (
  SELECT s.lm, e.dst AS node, 1 AS dist,
         CAST(sum(s.sigma) AS BIGINT) AS sigma
  FROM s0 s JOIN e0 e ON e.src = s.node
  WHERE NOT EXISTS (
    SELECT 1 FROM s0 p WHERE p.lm = s.lm AND p.node = e.dst)
  GROUP BY s.lm, e.dst
),
f2 AS (
  SELECT f.lm, e.dst AS node, 2 AS dist,
         CAST(sum(f.sigma) AS BIGINT) AS sigma
  FROM f1 f JOIN e0 e ON e.src = f.node
  WHERE NOT EXISTS (
    SELECT 1 FROM s0 p WHERE p.lm = f.lm AND p.node = e.dst)
    AND NOT EXISTS (
    SELECT 1 FROM f1 p WHERE p.lm = f.lm AND p.node = e.dst)
  GROUP BY f.lm, e.dst
),
settled AS (
  SELECT * FROM s0 UNION ALL SELECT * FROM f1 UNION ALL SELECT * FROM f2
),
succ AS (
  SELECT a.lm, a.node AS src, b.node AS dst, a.dist AS dv
  FROM settled a
  JOIN e0 e ON e.src = a.node
  JOIN settled b ON b.lm = a.lm AND b.node = e.dst
  WHERE b.dist = a.dist + 1
),
chi2 AS (
  SELECT lm, node, CAST(0 AS BIGINT) AS chi FROM settled WHERE dist = 2
),
chi1 AS (
  SELECT l.lm, l.node,
         CAST(coalesce(sum(c.chi + 1), 0) AS BIGINT) AS chi
  FROM (SELECT lm, node FROM settled WHERE dist = 1) l
  LEFT JOIN succ s ON s.lm = l.lm AND s.src = l.node AND s.dv = 1
  LEFT JOIN chi2 c ON c.lm = s.lm AND c.node = s.dst
  GROUP BY l.lm, l.node
),
chi0 AS (
  SELECT l.lm, l.node,
         CAST(coalesce(sum(c.chi + 1), 0) AS BIGINT) AS chi
  FROM (SELECT lm, node FROM settled WHERE dist = 0) l
  LEFT JOIN succ s ON s.lm = l.lm AND s.src = l.node AND s.dv = 0
  LEFT JOIN chi1 c ON c.lm = s.lm AND c.node = s.dst
  GROUP BY l.lm, l.node
),
acc AS (
  SELECT * FROM chi2 UNION ALL SELECT * FROM chi1 UNION ALL SELECT * FROM chi0
)
SELECT st.node,
       CAST(min(st.dist) AS BIGINT) AS dist,
       CAST(sum(st.sigma) AS BIGINT) AS sigma,
       CAST(sum(a.chi) AS BIGINT) AS chi,
       CAST(sum(st.sigma * a.chi) AS BIGINT) AS stress
FROM settled st JOIN acc a ON a.lm = st.lm AND a.node = st.node
GROUP BY st.node
HAVING sum(st.sigma * a.chi) > 0
"""


# ---------------------------------------------------------------------------
# Q: Theil-Sen robust daily trend per event type
# ---------------------------------------------------------------------------


def q_theilsen_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen slope of daily counts per type with a linear ramp
    injected on 'click' (one extra copy of each click per day-index
    step is approximated by doubling the last third of days) — the
    spiked key reads a positive slope, the stationary keys hover near
    zero; magnitude beside mk_trend's sign."""
    from .operators.temporal import theilsen_trend

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    ramp = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return theilsen_trend(ev.unionAll(ramp), "event_type", "ts", "day")


THEILSEN_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) // 86400 AS t,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         (b.n - a.n) * CAST(1000000 AS BIGINT) // (b.t - a.t) AS slope
  FROM cnt a JOIN cnt b
    ON a.event_type = b.event_type AND a.t < b.t
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets
  FROM cnt GROUP BY event_type
),
med AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(median(slope) * 2 AS BIGINT) AS slope2_x1e6
  FROM pairs GROUP BY event_type
)
SELECT s.event_type, s.n_buckets,
       coalesce(m.n_pairs, 0) AS n_pairs,
       coalesce(m.slope2_x1e6, 0) AS slope2_x1e6
FROM stats s LEFT JOIN med m ON m.event_type = s.event_type
"""


# ---------------------------------------------------------------------------
# Q: funnel conversion + latency report (signup -> click -> purchase)
# ---------------------------------------------------------------------------


def q_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-level conversion funnel with exact median step latencies over
    the funnel_3step pattern — the dashboard readout derived from the
    same matcher the CEP gate verifies."""
    from .operators.sequence import funnel_report

    ev = _t(spark, sf_dir, "events")
    return funnel_report(
        ev,
        ["signup", "click", "purchase"],
        on=["user_id"],
        within_seconds=604800,
    )


FUNNEL_REPORT_SQL = """
WITH b AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
),
s0 AS (
  SELECT user_id, event_id AS id_0, s AS s_0 FROM b
  WHERE event_type = 'signup'
),
m1 AS (
  SELECT s0.user_id, s0.id_0, s0.s_0, b.event_id AS id_1, b.s AS s_1
  FROM s0 JOIN b ON b.user_id = s0.user_id AND b.event_type = 'click'
   AND b.s > s0.s_0 AND b.s <= s0.s_0 + 604800
  QUALIFY row_number() OVER (PARTITION BY s0.user_id, s0.id_0
                             ORDER BY b.s ASC, b.event_id ASC) = 1
),
m2 AS (
  SELECT m1.user_id, m1.id_0, m1.s_0, m1.id_1, m1.s_1,
         b.event_id AS id_2, b.s AS s_2
  FROM m1 JOIN b ON b.user_id = m1.user_id AND b.event_type = 'purchase'
   AND b.s > m1.s_1 AND b.s <= m1.s_0 + 604800
  QUALIFY row_number() OVER (PARTITION BY m1.user_id, m1.id_0, m1.id_1
                             ORDER BY b.s ASC, b.event_id ASC) = 1
),
c0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM s0),
c1 AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(median(s_1 - s_0) * 2, 0) AS BIGINT) AS med2
  FROM m1
),
c2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(coalesce(median(s_2 - s_0) * 2, 0) AS BIGINT) AS med2
  FROM m2
)
SELECT CAST(0 AS BIGINT) AS step_idx, 'signup' AS step, c0.n AS n_matched,
       CAST(1000000 AS BIGINT) AS conv_from_prev_x1e6,
       CAST(0 AS BIGINT) AS med2_from_anchor_s
FROM c0
UNION ALL
SELECT 1, 'click', c1.n,
       CAST(c1.n * 1000000 // greatest(c0.n, 1) AS BIGINT), c1.med2
FROM c0, c1
UNION ALL
SELECT 2, 'purchase', c2.n,
       CAST(c2.n * 1000000 // greatest(c1.n, 1) AS BIGINT), c2.med2
FROM c1, c2
"""


# ---------------------------------------------------------------------------
# Q: exact global quantiles of scaled event values
# ---------------------------------------------------------------------------


def q_global_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99/p999 of the x100-scaled value column via
    distributed rank selection — the 100TB-correct global quantile
    (no global sort, no percentile_approx error bars)."""
    from .operators.temporal import exact_quantiles

    ev = _t(spark, sf_dir, "events").select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v")
    )
    return exact_quantiles(ev, "v", ps_x100=(50, 90, 99))


GLOBAL_QUANTILES_SQL = """
WITH q AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events
),
cnt AS (SELECT v, CAST(count(*) AS BIGINT) AS n FROM q GROUP BY v),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cnt),
cum AS (
  SELECT v, CAST(sum(n) OVER (ORDER BY v) AS BIGINT) AS cum FROM cnt
),
ks AS (
  SELECT CAST(p AS BIGINT) AS p_x100,
         greatest((p * t.nt + 99) // 100, 1) AS k_rank
  FROM (VALUES (50), (90), (99)) AS ps(p), tot t
)
SELECT k.p_x100, CAST(k.k_rank AS BIGINT) AS k_rank,
       CAST(min(c.v) AS BIGINT) AS value
FROM cum c JOIN ks k ON c.cum >= k.k_rank
GROUP BY k.p_x100, k.k_rank
"""


# ---------------------------------------------------------------------------
# Q: Bowley quartile skewness per event type
# ---------------------------------------------------------------------------


def q_bowley_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust tail-asymmetry per type with a right tail injected on
    'click' (values re-appended at 3x): the spiked key reads positive
    Bowley skew, the symmetric keys hover near 0."""
    from .operators.temporal import bowley_skew

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    tail = ev.filter(F.col("event_type") == "click").select(
        "event_type", (F.col("value") * 3).alias("value")
    )
    return bowley_skew(ev.unionAll(tail), "event_type", "value", scale=100)


BOWLEY_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT event_type, value * 3 FROM events WHERE event_type = 'click'
),
q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM ev
),
per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         CAST(quantile_cont(v, 0.25) * 4 AS BIGINT) AS q1_4,
         CAST(quantile_cont(v, 0.5) * 4 AS BIGINT) AS q2_4,
         CAST(quantile_cont(v, 0.75) * 4 AS BIGINT) AS q3_4
  FROM q GROUP BY event_type
)
SELECT event_type, n, q1_4, q2_4, q3_4,
       CAST(CASE WHEN q3_4 = q1_4 THEN 0
            ELSE (CASE WHEN q3_4 + q1_4 - 2 * q2_4 < 0 THEN -1 ELSE 1 END)
                 * (abs(q3_4 + q1_4 - 2 * q2_4) * 1000000
                    // (q3_4 - q1_4)) END AS BIGINT) AS bowley_x1e6
FROM per
"""


# ---------------------------------------------------------------------------
# Q: BGP MINUS — sub-events with no end timestamp
# ---------------------------------------------------------------------------


def q_bgp_minus_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPARQL MINUS through the BGP compiler: TERMINAL events — carrying
    a begin timestamp but no ng:nextEvent edge (each conversation's last
    turn) — the exclusion-pattern surface (anti-join on the shared
    variable) beside bgp_sub_events' OPTIONAL. (Earlier fixtures tried
    'sub-events with no end' and 'root events': both EMPTY by
    construction — the A8 end:=begin rule materializes an end for every
    event and every begin-holder IS a sub-event — themselves verified
    invariants.)"""
    from .graph.bgp import bgp
    from .graph.ng_queries import P_BEGIN

    triples = _flagship_triples(spark, sf_dir)
    out = bgp(
        triples,
        patterns=[("?event", P_BEGIN, "?begin")],
        minus=[[("?event", "ng:nextEvent", "?nxt")]],
    )
    return out.select("event", "begin")


BGP_MINUS_OPEN_SQL = f"""
WITH g AS ({FLAGSHIP_SQL})
SELECT b.subject AS event, b.object AS begin
FROM (SELECT * FROM g WHERE predicate = 'sem:hasBeginTimeStamp') b
WHERE NOT EXISTS (
  SELECT 1 FROM g s
  WHERE s.predicate = 'ng:nextEvent' AND s.subject = b.subject
)
"""


# ---------------------------------------------------------------------------
# Q: per-type exact quantiles via grouped rank selection
# ---------------------------------------------------------------------------


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type p50/p90/p99 of x100-scaled values via grouped rank
    selection on the collapsed value table — the scale-correct per-key
    quantile (quantiles_by_type's production caveat, answered)."""
    from .operators.temporal import grouped_exact_quantiles

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("v"),
    )
    return grouped_exact_quantiles(ev, "event_type", "v", ps_x100=(50, 90, 99))


GROUPED_QUANTILES_SQL = """
WITH q AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
cnt AS (
  SELECT event_type, v, CAST(count(*) AS BIGINT) AS n
  FROM q GROUP BY event_type, v
),
cum AS (
  SELECT event_type, v,
         CAST(sum(n) OVER (PARTITION BY event_type ORDER BY v)
              AS BIGINT) AS cum
  FROM cnt
),
tot AS (
  SELECT event_type, CAST(max(cum) AS BIGINT) AS nt FROM cum
  GROUP BY event_type
),
ks AS (
  SELECT event_type, CAST(p AS BIGINT) AS p_x100,
         greatest((p * nt + 99) // 100, 1) AS k_rank
  FROM tot, (VALUES (50), (90), (99)) AS ps(p)
)
SELECT c.event_type, k.p_x100, CAST(k.k_rank AS BIGINT) AS k_rank,
       CAST(min(c.v) AS BIGINT) AS value
FROM cum c JOIN ks k ON k.event_type = c.event_type AND c.cum >= k.k_rank
GROUP BY c.event_type, k.p_x100, k.k_rank
"""


# ---------------------------------------------------------------------------
# Q: winsorized mean per event type
# ---------------------------------------------------------------------------


def q_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile-winsorized mean of the value column per type, with a
    garbage tail injected on 'click' (values x100, first 1000 clicks by
    event_id — deterministic, matching the oracle's ORDER BY) — the
    robust center barely moves while a plain mean would triple;
    completes the robust family's location estimate."""
    from .operators.temporal import winsorized_mean

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    tail = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .orderBy("event_id")
        .limit(1000)
        .select("event_type", (F.col("value") * 100).alias("value"))
    )
    fixture = ev.unionAll(tail)
    return winsorized_mean(fixture, "event_type", "value", scale=100)


WINSORIZED_VALUE_SQL = """
WITH tail AS (
  SELECT event_type, value * 100 AS value
  FROM events WHERE event_type = 'click'
  ORDER BY event_id LIMIT 1000
),
ev AS (
  SELECT event_type, value FROM events
  UNION ALL
  SELECT event_type, value FROM tail
),
q AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM ev
),
bounds AS (
  SELECT event_type,
         CAST(quantile_cont(v, 0.25) * 4 AS BIGINT) AS lo4,
         CAST(quantile_cont(v, 0.75) * 4 AS BIGINT) AS hi4
  FROM q GROUP BY event_type
),
clamped AS (
  SELECT q.event_type, b.lo4, b.hi4,
         least(greatest(q.v * 4, b.lo4), b.hi4) AS c4
  FROM q JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       lo4, hi4,
       CAST(sum(c4) AS BIGINT) AS sum4,
       CAST(CAST(sum(c4) AS BIGINT) // (4 * count(*))
              * CAST(1000000 AS BIGINT)
            + CAST(sum(c4) AS BIGINT) % (4 * count(*))
              * CAST(1000000 AS BIGINT) // (4 * count(*)) AS BIGINT)
         AS wmean_x1e6
FROM clamped GROUP BY event_type, lo4, hi4
"""


# ---------------------------------------------------------------------------
# Q: Boruvka minimum spanning forest over the nation trade graph
# ---------------------------------------------------------------------------


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected nation trade graph (u, v, w) with UNIQUE rarity
    weights: w = (1e6 DIV flow)·1000 + uk·25 + vk — high-volume lanes
    are cheap, the nationkey term is an injective per-pair tie-break.
    Shared fixture for `mst_trade` and `matching_trade`; mirrors the
    oracle's TRADE_EDGES_FRAGMENT."""
    flows = _nation_flows(spark, sf_dir)
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    und = (
        flows.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            "n_flows",
        )
        .groupBy("u", "v")
        .agg(F.sum("n_flows").alias("flow"))
    )
    return (
        und.join(
            F.broadcast(
                n.select(F.col("n_name").alias("u"), F.col("n_nationkey").alias("uk"))
            ),
            "u",
        )
        .join(
            F.broadcast(
                n.select(F.col("n_name").alias("v"), F.col("n_nationkey").alias("vk"))
            ),
            "v",
        )
        .select(
            "u",
            "v",
            (
                F.expr("CAST(1000000 AS BIGINT) DIV flow") * 1000
                + F.col("uk") * 25
                + F.col("vk")
            ).alias("w"),
        )
    )


TRADE_EDGES_FRAGMENT = f"""{FLOWS_FRAGMENT.strip().lstrip()},
und AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v,
         CAST(sum(n_flows) AS BIGINT) AS flow
  FROM flows GROUP BY 1, 2
),
ed AS (
  SELECT und.u, und.v,
         (1000000 // flow) * 1000 + nu.n_nationkey * 25 + nv.n_nationkey AS w
  FROM und
  JOIN nation nu ON nu.n_name = und.u
  JOIN nation nv ON nv.n_name = und.v
)"""


def q_mst_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the undirected nation trade graph with
    rarity weights (1e6 DIV flow: high-volume lanes are cheap) — the
    cheapest backbone connecting all trading nations through their
    strongest lanes. UNIQUE weights (see _trade_edges) make the MST
    unique, so the oracle can verify via the cycle property (edge in MST
    iff endpoints not connected by strictly lighter edges — one
    recursive reachability CTE) instead of replaying Boruvka rounds."""
    from .operators.graph_algos import boruvka_mst

    e = _trade_edges(spark, sf_dir)
    return boruvka_mst(e).select("u", "v", F.col("w").cast("long").alias("w"))


MST_TRADE_SQL = f"""
WITH RECURSIVE {TRADE_EDGES_FRAGMENT},
reach AS (
  SELECT u AS eu, v AS ev, w AS ew, u AS node FROM ed
  UNION
  SELECT r.eu, r.ev, r.ew,
         CASE WHEN e.u = r.node THEN e.v ELSE e.u END AS node
  FROM reach r JOIN ed e ON (e.u = r.node OR e.v = r.node) AND e.w < r.ew
)
SELECT DISTINCT d.u, d.v, CAST(d.w AS BIGINT) AS w
FROM ed d
WHERE NOT EXISTS (
  SELECT 1 FROM reach r WHERE r.eu = d.u AND r.ev = d.v AND r.node = d.v
)
"""


# ---------------------------------------------------------------------------
# Q: greedy maximum-weight matching over the nation trade graph
# ---------------------------------------------------------------------------


def q_matching_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Locally-dominant greedy matching (Preis) over the trade graph
    with INVERTED rarity weights (max-weight = strongest lane): each
    nation pairs exclusively with its best available partner — the
    one-to-one alignment primitive. With the fixture's unique weights
    the result equals sequential greedy exactly, so the oracle replays
    a FIXED 13 rounds (25 nodes: worst case |V|/2 matching rounds;
    converged rounds are no-ops, so both engines agree without agreeing
    on when convergence happened)."""
    from .operators.graph_algos import greedy_matching

    # invert: strongest lanes have the largest weight, tie-break intact
    e = _trade_edges(spark, sf_dir).select(
        "u", "v", (F.lit(2_000_000_000) - F.col("w")).alias("w")
    )
    return greedy_matching(e, max_rounds=13).select(
        "u", "v", F.col("w").cast("long").alias("w")
    )


def _matching_rounds_sql(k: int) -> str:
    # AS MATERIALIZED is load-bearing: without it DuckDB inlines each
    # multiply-referenced a{i}/s{i} CTE, the expansion grows ~3^k and the
    # flows fragment's parquet scans multiply until fd exhaustion
    # ("Too many open files" at k=13, observed).
    parts = [
        """,
a0 AS MATERIALIZED (SELECT u, v, 2000000000 - w AS w FROM ed),
m0 AS (SELECT u, v, w FROM a0 WHERE false)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f""",
b{i} AS MATERIALIZED (
  SELECT node, max(w) AS bw FROM (
    SELECT u AS node, w FROM a{i - 1}
    UNION ALL
    SELECT v AS node, w FROM a{i - 1}
  ) GROUP BY node
),
s{i} AS MATERIALIZED (
  SELECT a.u, a.v, a.w
  FROM a{i - 1} a
  JOIN b{i} bu ON bu.node = a.u AND bu.bw = a.w
  JOIN b{i} bv ON bv.node = a.v AND bv.bw = a.w
),
m{i} AS (SELECT u, v, w FROM m{i - 1} UNION ALL SELECT u, v, w FROM s{i}),
a{i} AS MATERIALIZED (
  SELECT a.u, a.v, a.w FROM a{i - 1} a
  WHERE NOT EXISTS (
    SELECT 1 FROM s{i} s
    WHERE s.u IN (a.u, a.v) OR s.v IN (a.u, a.v)
  )
)"""
        )
    return "".join(parts)


MATCHING_TRADE_SQL = f"""
WITH {TRADE_EDGES_FRAGMENT}{_matching_rounds_sql(13)}
SELECT u, v, CAST(w AS BIGINT) AS w FROM m13
"""


# ---------------------------------------------------------------------------
# Q: quantized SimRank over the nation trade digraph
# ---------------------------------------------------------------------------


def q_simrank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-iteration quantized SimRank (C = 1/2, ×1e6 integers) over the
    directed trade graph: two importers are similar if they buy from
    SIMILAR exporters — second-order structural equivalence beside
    neighborhood_overlap's direct Jaccard. The per-round DIV truncation
    is the quantized spec both engines replay."""
    from .operators.graph_algos import simrank_unrolled

    ed = _nation_flows(spark, sf_dir).select("src", "dst")
    return simrank_unrolled(ed, rounds=2)


SIMRANK_TRADE_SQL = f"""
WITH {FLOWS_FRAGMENT.strip().lstrip()},
ine AS MATERIALIZED (SELECT DISTINCT dst AS node, src AS nb FROM flows),
deg AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM ine GROUP BY node
),
diag AS MATERIALIZED (
  SELECT x.node AS a, y.node AS b, CAST(count(*) AS BIGINT) * 1000000 AS t
  FROM ine x JOIN ine y ON x.nb = y.nb AND x.node < y.node
  GROUP BY 1, 2
),
s1 AS MATERIALIZED (
  SELECT a, b, CAST(t // (2 * da.d * db.d) AS BIGINT) AS s
  FROM diag
  JOIN deg da ON da.node = diag.a
  JOIN deg db ON db.node = diag.b
  WHERE CAST(t // (2 * da.d * db.d) AS BIGINT) > 0
),
s1f AS (SELECT a, b, s FROM s1 UNION ALL SELECT b AS a, a AS b, s FROM s1),
off2 AS (
  SELECT x.node AS a, y.node AS b, CAST(sum(sv.s) AS BIGINT) AS t
  FROM ine x
  JOIN s1f sv ON sv.a = x.nb
  JOIN ine y ON y.nb = sv.b
  WHERE x.node < y.node
  GROUP BY 1, 2
),
tot2 AS (
  SELECT a, b, CAST(sum(t) AS BIGINT) AS t FROM (
    SELECT a, b, t FROM diag UNION ALL SELECT a, b, t FROM off2
  ) GROUP BY a, b
)
SELECT tot2.a, tot2.b, CAST(t // (2 * da.d * db.d) AS BIGINT) AS s_x1e6
FROM tot2
JOIN deg da ON da.node = tot2.a
JOIN deg db ON db.node = tot2.b
WHERE CAST(t // (2 * da.d * db.d) AS BIGINT) > 0
"""


# ---------------------------------------------------------------------------
# Q: Katz centrality over the tool-transition graph
# ---------------------------------------------------------------------------


def q_katz_tools(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (3 unrolled terms, β = 1/8) over the weighted
    tool-transition graph: ranks tools by attenuated workflow traffic
    flowing INTO them through walks of length <= 3 — the reachability
    centrality beside PageRank's random surfer. Exact integers: β is a
    binary power so katz_scaled = 64·A1 + 8·A²1 + A³1 with weighted
    adjacency A — both engines replay the three join+agg rounds
    bit-for-bit."""
    from .operators.dialogue import tool_transitions
    from .operators.graph_algos import katz_unrolled

    tx = transcripts_from_events(spark, sf_dir)
    ed = tool_transitions(tx).select(
        F.col("tool_from").alias("src"),
        F.col("tool_to").alias("dst"),
        F.col("n_transitions").alias("nt"),
    )
    return katz_unrolled(ed, rounds=3, beta_shift=3, weight_col="nt")


KATZ_TOOLS_SQL = f"""
{TX_SQL},
calls AS (
  SELECT conv_id, turn_idx, tool AS tool_to FROM tx WHERE tool <> ''
),
pairs AS (
  SELECT lag(tool_to) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS tool_from,
         tool_to
  FROM calls
),
ed AS (
  SELECT tool_from AS src, tool_to AS dst, CAST(count(*) AS BIGINT) AS nt
  FROM pairs WHERE tool_from IS NOT NULL GROUP BY 1, 2
),
nodes AS (
  SELECT src AS node FROM ed UNION SELECT dst FROM ed
),
x1 AS (
  SELECT dst AS node, CAST(sum(nt) AS BIGINT) AS x FROM ed GROUP BY dst
),
x2 AS (
  SELECT e.dst AS node, CAST(sum(e.nt * x1.x) AS BIGINT) AS x
  FROM ed e JOIN x1 ON x1.node = e.src GROUP BY e.dst
),
x3 AS (
  SELECT e.dst AS node, CAST(sum(e.nt * x2.x) AS BIGINT) AS x
  FROM ed e JOIN x2 ON x2.node = e.src GROUP BY e.dst
)
SELECT n.node,
       CAST(coalesce(a.x, 0) * 64 + coalesce(b.x, 0) * 8 + coalesce(c.x, 0)
            AS BIGINT) AS katz_scaled
FROM nodes n
LEFT JOIN x1 a ON a.node = n.node
LEFT JOIN x2 b ON b.node = n.node
LEFT JOIN x3 c ON c.node = n.node
"""


# ---------------------------------------------------------------------------
# Q: exact ROC AUC of order total price vs priority label
# ---------------------------------------------------------------------------


def q_auc_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the order total price (integer cents) as a
    predictor of urgent/high priority — the Mann-Whitney U identity over
    collapsed per-value counts with the KS family's two-phase prefix
    sum; ties contribute half. One row (n_pos, n_neg, u2, auc_x1e6),
    bit-exact in both engines."""
    from .operators.classifier import auc_exact

    o = _t(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("score"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("label"),
    )
    return auc_exact(o, "score", "label")


AUC_PRIORITY_SQL = """
WITH s AS (
  SELECT CAST(floor(CAST(o_totalprice AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS p
  FROM orders
),
cnt AS (
  SELECT v, CAST(sum(p) AS BIGINT) AS cp,
         CAST(count(*) - sum(p) AS BIGINT) AS cn
  FROM s GROUP BY v
),
cum AS (
  SELECT v, cp, cn,
         CAST(sum(cn) OVER (ORDER BY v) AS BIGINT) AS cum_n
  FROM cnt
),
tot AS (
  SELECT CAST(sum(cp) AS BIGINT) AS np, CAST(sum(cn) AS BIGINT) AS nn FROM cnt
),
u AS (
  SELECT CAST(sum(cp * (2 * (cum_n - cn) + cn)) AS BIGINT) AS u2 FROM cum
)
SELECT np AS n_pos, nn AS n_neg, u2,
       CAST(u2 // (2 * np * nn) * CAST(1000000 AS BIGINT)
            + u2 % (2 * np * nn) * CAST(1000000 AS BIGINT) // (2 * np * nn)
            AS BIGINT) AS auc_x1e6
FROM u, tot
"""


# ---------------------------------------------------------------------------
# Q: Poisson-bootstrap CI for the per-type mean value
# ---------------------------------------------------------------------------


def q_bootstrap_value_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Poisson-bootstrap 95% CI for the mean event value
    per type (B = 40 resamples, md5-hash multiplicities, exact staged
    integer resample means, order-statistic interval) — the uncertainty
    companion to the robust location family."""
    from .operators.sampling import bootstrap_mean_ci

    ev = _t(spark, sf_dir, "events")
    return bootstrap_mean_ci(
        ev, key="event_type", value_col="value", id_col="event_id", b=40
    )


BOOTSTRAP_VALUE_CI_SQL = """
WITH rows_t AS (
  SELECT event_type,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v,
         CAST(event_id AS VARCHAR) AS id
  FROM events
),
fan AS (
  SELECT r.event_type, r.v, r.id, b.b
  FROM rows_t r CROSS JOIN (SELECT unnest(range(40)) AS b) b
),
wt AS (
  SELECT event_type, b, v,
         (CASE WHEN u >= 367879 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 735759 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 919699 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 981012 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 996340 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 999406 THEN 1 ELSE 0 END)
       + (CASE WHEN u >= 999917 THEN 1 ELSE 0 END) AS w
  FROM (
    SELECT event_type, b, v,
           CAST(concat('0x', substr(
             md5('7:' || CAST(b AS VARCHAR) || ':' || id), 1, 8)) AS BIGINT)
             % 1000000 AS u
    FROM fan
  )
),
per_b AS (
  SELECT event_type, b,
         CAST(sum(w) AS BIGINT) AS n_eff,
         CAST(sum(w * v) AS BIGINT) AS s
  FROM wt GROUP BY 1, 2 HAVING sum(w) > 0
),
means AS (
  SELECT event_type, b,
         CAST(s // n_eff * CAST(1000000 AS BIGINT)
              + s % n_eff * CAST(1000000 AS BIGINT) // n_eff AS BIGINT) AS m
  FROM per_b
),
ranked AS (
  SELECT event_type, b, m,
         row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS r,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM means
),
ci AS (
  SELECT event_type,
         max(CASE WHEN r = least(2, cnt) THEN m END) AS lo_x1e6,
         max(CASE WHEN r = least(39, cnt) THEN m END) AS hi_x1e6
  FROM ranked GROUP BY event_type
),
full_t AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(CAST(sum(v) AS BIGINT) // count(*) * CAST(1000000 AS BIGINT)
              + CAST(sum(v) AS BIGINT) % count(*) * CAST(1000000 AS BIGINT)
                // count(*) AS BIGINT) AS mean_x1e6
  FROM rows_t GROUP BY event_type
)
SELECT f.event_type, n_rows, mean_x1e6, lo_x1e6, hi_x1e6
FROM full_t f JOIN ci USING (event_type)
"""


# ---------------------------------------------------------------------------
# Q: Spearman rank correlation (value vs time) per type
# ---------------------------------------------------------------------------


def q_spearman_value_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone association between event time and value per type, with
    opposite-sign injections: 'click' values get +epoch (rank-perfectly
    increasing, r2 -> +1e6), 'view' gets -epoch (decreasing, -1e6), the
    untouched types read near zero — sign handling, tie midranks, and
    the quantized-grid spec all exercised in one readout."""
    from .operators.temporal import spearman_corr

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    rows = ev.select(
        "event_type",
        sec.alias("x"),
        (
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast("long")
            + F.when(F.col("event_type") == "click", sec)
            .when(F.col("event_type") == "view", -sec)
            .otherwise(F.lit(0))
        ).alias("y"),
    )
    return spearman_corr(rows, key="event_type", x_col="x", y_col="y")


SPEARMAN_VALUE_TS_SQL = """
WITH rows_t AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS x,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
         + CASE WHEN event_type = 'click' THEN CAST(floor(epoch(ts)) AS BIGINT)
                WHEN event_type = 'view' THEN -CAST(floor(epoch(ts)) AS BIGINT)
                ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT event_type,
         rank() OVER (PARTITION BY event_type ORDER BY x)
         + count(*) OVER (PARTITION BY event_type ORDER BY x
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dx,
         rank() OVER (PARTITION BY event_type ORDER BY y)
         + count(*) OVER (PARTITION BY event_type ORDER BY y
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dy,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM rows_t
),
grid AS (
  SELECT event_type, n,
         (dx - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gx,
         (dy - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gy
  FROM ranked
),
m AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gx * gy) AS BIGINT) AS num,
         CAST(sum(gx * gx) AS BIGINT) AS sxx,
         CAST(sum(gy * gy) AS BIGINT) AS syy
  FROM grid GROUP BY event_type
)
SELECT event_type, n, num,
       CAST(CASE WHEN sxx = 0 OR syy = 0 THEN 0 ELSE
            (CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * (abs(num) // greatest(sxx // 1000, 1))
            * (abs(num) // greatest(syy // 1000, 1)) END AS BIGINT)
         AS spearman_r2_x1e6
FROM m
"""


# ---------------------------------------------------------------------------
# Q: Adamic-Adar link prediction on the user<->type bipartite graph
# ---------------------------------------------------------------------------


def q_aa_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized Adamic-Adar over the same bipartite user<->event-type
    graph as `ra_linkpred` — the log-damped middle setting between the
    raw common-neighbor count and RA's 1/deg, with the 1/log2 factor
    made exact-integer via bin()-length msb."""
    from .operators.graph_algos import adamic_adar

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
        F.concat(F.lit("t"), F.col("event_type")).alias("dst"),
    )
    return adamic_adar(edges, min_common=4)


AA_LINKPRED_SQL = """
WITH e0 AS (
  SELECT DISTINCT src, dst FROM (
    SELECT 'u' || CAST(user_id AS VARCHAR) AS src, 't' || event_type AS dst
    FROM events
    UNION ALL
    SELECT 't' || event_type, 'u' || CAST(user_id AS VARCHAR) FROM events
  )
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e0 GROUP BY src)
SELECT a.src AS node_a, b.src AS node_b,
       CAST(count(*) AS BIGINT) AS n_common,
       CAST(sum(CAST(1000000 AS BIGINT) // (length(bin(d.deg)) - 1))
            AS BIGINT) AS aa_x1e6
FROM e0 a
JOIN e0 b ON a.dst = b.dst AND a.src < b.src
JOIN deg d ON d.src = a.dst
GROUP BY 1, 2
HAVING count(*) >= 4
"""


# ---------------------------------------------------------------------------
# Q: KMV bottom-k distinct-user sketch per type
# ---------------------------------------------------------------------------


def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k, k=64) distinct-user estimate per event type beside
    the exact count — at 150 distinct users per type the sketch is in
    estimation territory (n_kept = k) and the order-statistic estimator
    is an exact integer quotient both engines replay."""
    from .operators.sketches import kmv_bottomk, kmv_estimate

    ev = _t(spark, sf_dir, "events")
    est = kmv_estimate(
        kmv_bottomk(ev, "event_type", "user_id", k=64), "event_type", k=64
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_exact", "n_kept", "kth_min", "kmv_est"
    )


KMV_DISTINCT_USERS_SQL = """
WITH hashed AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM events
),
bk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM hashed
),
est AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_kept,
         CAST(max(h) AS BIGINT) AS kth_min
  FROM bk WHERE r <= 64 GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT e.event_type, n_exact, n_kept, kth_min,
       CAST(CASE WHEN n_kept < 64 THEN n_kept
                 ELSE 63 * CAST(4294967296 AS BIGINT) // kth_min
            END AS BIGINT) AS kmv_est
FROM est e JOIN exact USING (event_type)
"""


# ---------------------------------------------------------------------------
# Q: HHI concentration of user mass per type
# ---------------------------------------------------------------------------


def q_hhi_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl concentration of per-user event mass within each type,
    with a hub injection: 'error' events on user 0 are tripled, so the
    error key reads a higher HHI / lower effective-user count than the
    untouched near-uniform keys — the mergeable (no-sort) companion to
    gini_users on the identical fixture family."""
    from .operators.text import hhi_concentration

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    hub = ev.filter(
        (F.col("event_type") == "error") & (F.col("user_id") == 0)
    )
    return hhi_concentration(
        ev.unionAll(hub).unionAll(hub), key="event_type", unit_col="user_id"
    )


HHI_USERS_SQL = """
WITH ev AS (
  SELECT event_type, user_id FROM events
  UNION ALL
  SELECT event_type, user_id FROM events
  WHERE event_type = 'error' AND user_id = 0
  UNION ALL
  SELECT event_type, user_id FROM events
  WHERE event_type = 'error' AND user_id = 0
),
cnt AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
  FROM ev GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_units,
         CAST(sum(x) AS BIGINT) AS total,
         CAST(sum(x * x) AS BIGINT) AS s2
  FROM cnt GROUP BY event_type
)
SELECT event_type, n_units, total, s2,
       CAST((s2 // total * CAST(1000000 AS BIGINT)
             + s2 % total * CAST(1000000 AS BIGINT) // total)
            // total AS BIGINT) AS hhi_x1e6,
       CAST(total * total * 1000 // s2 AS BIGINT) AS eff_x1e3
FROM m
"""



# ---------------------------------------------------------------------------
# Q: grid-bucketed DBSCAN over a deterministic blob fixture
# ---------------------------------------------------------------------------


def q_dbscan_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six hash-jittered blobs (radius <= ~70, centers 1000 apart) plus a
    hash-scattered outlier sprinkle at (5000+, *) — DBSCAN(eps=200,
    min_pts=4) recovers each blob as one cluster labeled by its min id
    and reads the sprinkle as noise/micro-clusters, all pinned by the
    deterministic border rule."""
    from .operators.clustering import dbscan_grid

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    h = lambda tag: F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(tag), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(101),
    )
    out = F.col("event_id") % 91 == 0
    ox = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ox:"), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(20),
    )
    oy = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("oy:"), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long"),
        F.lit(3000),
    )
    pts = ev.select(
        F.col("event_id").alias("id"),
        F.when(out, F.lit(5000) + ox * 500)
        .otherwise((F.col("event_id") % 3) * 1000 + h("dx:") - 50)
        .cast("long")
        .alias("x"),
        F.when(out, F.lit(5000) + oy)
        .otherwise(
            F.expr("event_id DIV 3 % 2 * 1000") + h("dy:") - 50
        )
        .cast("long")
        .alias("y"),
    )
    return dbscan_grid(pts, id_col="id", x_col="x", y_col="y",
                       eps=200, min_pts=4)


DBSCAN_BLOBS_SQL = """
WITH RECURSIVE pts AS (
  SELECT event_id AS pid,
    CAST(CASE WHEN event_id % 91 = 0
      THEN 5000 + CAST(concat('0x', substr(md5('ox:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 20 * 500
      ELSE event_id % 3 * 1000
           + CAST(concat('0x', substr(md5('dx:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 101 - 50
      END AS BIGINT) AS px,
    CAST(CASE WHEN event_id % 91 = 0
      THEN 5000 + CAST(concat('0x', substr(md5('oy:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 3000
      ELSE event_id // 3 % 2 * 1000
           + CAST(concat('0x', substr(md5('dy:' || CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 101 - 50
      END AS BIGINT) AS py
  FROM events WHERE event_id % 7 = 0
),
cand AS (
  SELECT a.pid AS id_a, b.pid AS id_b
  FROM (
    SELECT pid, px, py,
           CAST(floor(CAST(px AS DOUBLE) / 200) AS BIGINT) + ox.o AS cx,
           CAST(floor(CAST(py AS DOUBLE) / 200) AS BIGINT) + oy.o AS cy
    FROM pts, (SELECT unnest([-1, 0, 1]) AS o) ox,
         (SELECT unnest([-1, 0, 1]) AS o) oy
  ) a
  JOIN (
    SELECT pid, px, py,
           CAST(floor(CAST(px AS DOUBLE) / 200) AS BIGINT) AS cx,
           CAST(floor(CAST(py AS DOUBLE) / 200) AS BIGINT) AS cy
    FROM pts
  ) b USING (cx, cy)
  WHERE a.pid != b.pid
    AND (a.px - b.px) * (a.px - b.px) + (a.py - b.py) * (a.py - b.py) <= 40000
),
ncnt AS (SELECT id_a AS pid, count(*) + 1 AS n FROM cand GROUP BY 1),
flags AS (
  SELECT p.pid, coalesce(n.n, 1) >= 4 AS is_core
  FROM pts p LEFT JOIN ncnt n USING (pid)
),
core_edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  WHERE id_a IN (SELECT pid FROM flags WHERE is_core)
    AND id_b IN (SELECT pid FROM flags WHERE is_core)
),
reach(node, lbl) AS (
  SELECT pid, pid FROM flags WHERE is_core
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN core_edges e ON e.src = r.node
),
cc AS (SELECT node, min(lbl) AS component FROM reach GROUP BY node),
border AS (
  SELECT c.id_a AS pid, min(cc.component) AS b_cluster
  FROM cand c JOIN cc ON cc.node = c.id_b GROUP BY 1
)
SELECT f.pid AS id, f.is_core,
       CAST(CASE WHEN f.is_core THEN cc.component
                 ELSE coalesce(b.b_cluster, -1) END AS BIGINT) AS cluster
FROM flags f
LEFT JOIN cc ON cc.node = f.pid
LEFT JOIN border b ON b.pid = f.pid
"""



# ---------------------------------------------------------------------------
# Q: KMV-sketch Jaccard between per-type user sets
# ---------------------------------------------------------------------------


def q_kmv_jaccard_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-set Jaccard between event types estimated purely
    from their bottom-k sketches — each type keeps the ~2/3 of users
    with (user_id + len(type)) % 3 != 0, so sets overlap heavily but
    differ by type-name length, and the estimates spread accordingly."""
    from .operators.sketches import kmv_bottomk, kmv_jaccard

    ev = _t(spark, sf_dir, "events").filter(
        (F.col("user_id") + F.length("event_type")) % 3 != 0
    )
    bk = kmv_bottomk(ev, "event_type", "user_id", k=64)
    return kmv_jaccard(bk, "event_type", k=64)


KMV_JACCARD_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, user_id FROM events
  WHERE (user_id + length(event_type)) % 3 != 0
),
hashed AS (
  SELECT DISTINCT event_type,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) AS h
  FROM ev
),
bk AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
    FROM hashed
  ) WHERE r <= 64
),
g AS (SELECT DISTINCT event_type FROM bk),
pairs AS (
  SELECT a.event_type AS ga, b.event_type AS gb
  FROM g a JOIN g b ON a.event_type < b.event_type
),
u AS (
  SELECT p.ga, p.gb, k.h, 1 AS in_a FROM pairs p JOIN bk k ON k.event_type = p.ga
  UNION ALL
  SELECT p.ga, p.gb, k.h, 0 AS in_a FROM pairs p JOIN bk k ON k.event_type = p.gb
),
m AS (
  SELECT ga, gb, h, max(in_a) AS has_a, 1 - min(in_a) AS has_b
  FROM u GROUP BY ga, gb, h
),
topk AS (
  SELECT * FROM (
    SELECT ga, gb, has_a, has_b,
           row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
    FROM m
  ) WHERE r <= 64
)
SELECT ga AS group_a, gb AS group_b,
       CAST(count(*) AS BIGINT) AS denom,
       CAST(sum(has_a * has_b) AS BIGINT) AS n_match,
       CAST(sum(has_a * has_b) * CAST(1000000 AS BIGINT) // count(*)
            AS BIGINT) AS jacc_x1e6
FROM topk GROUP BY ga, gb
"""


# ---------------------------------------------------------------------------
# Q: exact-integer OLS slope of daily counts per type
# ---------------------------------------------------------------------------


def q_ols_slope_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS slope on the IDENTICAL ramp fixture as theilsen_types (click
    doubled from Jan 21): the least-squares readout to hold against
    Theil-Sen's median-of-slopes — click reads strongly positive, the
    untouched keys hover near zero."""
    from .operators.temporal import ols_slope

    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    ramp = ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit("2024-01-21").cast("timestamp"))
    )
    return ols_slope(ev.unionAll(ramp), "event_type", "ts", "day")


OLS_SLOPE_TYPES_SQL = """
WITH ev AS (
  SELECT event_type, ts FROM events
  UNION ALL
  SELECT event_type, ts FROM events
  WHERE event_type = 'click' AND ts >= TIMESTAMP '2024-01-21'
),
cnt AS (
  SELECT event_type,
         CAST(floor(epoch(date_trunc('day', ts)) / 86400) AS BIGINT) AS x,
         CAST(count(*) AS BIGINT) AS y
  FROM ev GROUP BY 1, 2
),
m AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM cnt GROUP BY event_type
)
SELECT event_type, n_buckets,
       CAST(n_buckets * sxy - sx * sy AS BIGINT) AS num,
       CAST(n_buckets * sxx - sx * sx AS BIGINT) AS den,
       CAST(CASE WHEN n_buckets * sxx - sx * sx = 0 THEN 0 ELSE
            (n_buckets * sxy - sx * sy) // (n_buckets * sxx - sx * sx)
              * CAST(1000000 AS BIGINT)
            + (n_buckets * sxy - sx * sy) % (n_buckets * sxx - sx * sx)
              * CAST(1000000 AS BIGINT)
              // (n_buckets * sxx - sx * sx) END AS BIGINT) AS slope_x1e6
FROM m
"""


# ---------------------------------------------------------------------------
# Q: joint-vs-marginals TVD independence screen (type x 4h day-part)
# ---------------------------------------------------------------------------


def q_contingency_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between event type and 4-hour day-part with a planted
    dependence: click events before 08:00 are duplicated, skewing click
    mass into the first two day-parts — the TVD reads well above the
    near-independent baseline of the untouched table."""
    from .operators.text import contingency_tvd

    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.hour("ts").cast("long") / F.lit(4)).cast("long").alias("dp"), "ts"
    )
    extra = ev.filter((F.col("event_type") == "click") & (F.col("dp") < 2))
    return contingency_tvd(
        ev.unionAll(extra).select("event_type", "dp"), "event_type", "dp"
    )


CONTINGENCY_TYPE_HOUR_SQL = """
WITH base AS (
  SELECT event_type, CAST(hour(ts) // 4 AS BIGINT) AS dp FROM events
),
ev AS (
  SELECT event_type, dp FROM base
  UNION ALL
  SELECT event_type, dp FROM base WHERE event_type = 'click' AND dp < 2
),
cells AS (
  SELECT event_type AS r, dp AS c, CAST(count(*) AS BIGINT) AS o
  FROM ev GROUP BY 1, 2
),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY r),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY c),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
fold AS (
  SELECT max(t.n) AS n,
         CAST(count(DISTINCT cells.r) AS BIGINT) AS n_row_cats,
         CAST(count(DISTINCT cells.c) AS BIGINT) AS n_col_cats,
         CAST(sum(abs(cells.o * t.n - rm.rt * cm.ct))
              + max(t.n * t.n) - sum(rm.rt * cm.ct) AS BIGINT) AS s_abs
  FROM cells
  JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN tot t
)
SELECT n, n_row_cats, n_col_cats, s_abs,
       CAST((s_abs // n * CAST(1000000 AS BIGINT)
             + s_abs % n * CAST(1000000 AS BIGINT) // n)
            // (2 * n) AS BIGINT) AS tvd_x1e6
FROM fold
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
    from .data.transcripts import transcripts_from_events
    from .operators.sequence import viterbi_decode

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
# Q: decision-stump best splits predicting the error label
# ---------------------------------------------------------------------------


def q_decision_stump_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-feature splits for label = (event_type = 'error'),
    with a planted signal: every error event is appended once more with
    value/10, concentrating positive mass at low values — the
    value-cents stump should find a low threshold with a visibly lower
    Gini than the uninformative hour and user-bucket stumps."""
    from .operators.classifier import decision_stump

    ev = _t(spark, sf_dir, "events")
    extra = ev.filter(F.col("event_type") == "error").withColumn(
        "value", F.col("value") / 10
    )
    rows = ev.unionByName(extra).select(
        (F.col("event_type") == "error").alias("label"),
        F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("vcents"),
        F.hour("ts").cast("long").alias("hour"),
        (F.col("user_id") % 16).cast("long").alias("ubucket"),
    )
    return decision_stump(rows, ["vcents", "hour", "ubucket"], "label")


DECISION_STUMP_ERROR_SQL = """
WITH ev AS (
  SELECT event_type, value, ts, user_id FROM events
  UNION ALL
  SELECT event_type, value / 10, ts, user_id FROM events
  WHERE event_type = 'error'
),
fanned AS (
  SELECT p.feat, p.v,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS y
  FROM ev, unnest([
    {'feat': 'vcents',
     'v': CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)},
    {'feat': 'hour', 'v': CAST(hour(ts) AS BIGINT)},
    {'feat': 'ubucket', 'v': CAST(user_id % 16 AS BIGINT)}
  ]) AS t(p)
),
cells AS (
  SELECT feat, v, CAST(sum(y) AS BIGINT) AS cp,
         CAST(sum(1 - y) AS BIGINT) AS cn
  FROM fanned GROUP BY 1, 2
),
splits AS (
  SELECT feat, v,
         sum(cp) OVER w AS cpl, sum(cn) OVER w AS cnl,
         sum(cp) OVER wa AS tp, sum(cn) OVER wa AS tn
  FROM cells
  WINDOW w AS (PARTITION BY feat ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY feat)
),
scored AS (
  SELECT feat, v,
         cpl + cnl AS nl, tp + tn - cpl - cnl AS nr,
         cpl, cnl, tp - cpl AS cpr, tn - cnl AS cnr, tp + tn AS n
  FROM splits
),
g AS (
  SELECT feat, v, nl, nr,
         CAST(((( nl * nl - cpl * cpl - cnl * cnl) * nr
               + (nr * nr - cpr * cpr - cnr * cnr) * nl) // (nl * nr)
               * CAST(1000000 AS BIGINT)
              + ((nl * nl - cpl * cpl - cnl * cnl) * nr
               + (nr * nr - cpr * cpr - cnr * cnr) * nl) % (nl * nr)
               * CAST(1000000 AS BIGINT) // (nl * nr)) // n AS BIGINT)
           AS gini_x1e6
  FROM scored WHERE nr > 0
),
pick AS (
  SELECT feat, v, nl, nr, gini_x1e6,
         row_number() OVER (PARTITION BY feat ORDER BY gini_x1e6, v) AS r
  FROM g
)
SELECT feat AS feature, v AS threshold,
       CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
       gini_x1e6
FROM pick WHERE r = 1
"""




# ---------------------------------------------------------------------------
# Q: chi-squared / Cramer's V association between event type and weekday
# ---------------------------------------------------------------------------


def q_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared + Cramér's V² between event type and engine-neutral
    weekday, with the same planted-dependence style as the TVD screen:
    error events on dow 0-1 are duplicated, so the association reads
    well above the near-independent baseline."""
    from .operators.text import contingency_chi2

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "(CAST(unix_timestamp(ts) AS BIGINT) DIV 86400 + 4) % 7"
        ).alias("dow"),
    )
    extra = ev.filter((F.col("event_type") == "error") & (F.col("dow") < 2))
    return contingency_chi2(ev.unionAll(extra), "event_type", "dow")


CHI2_TYPE_DOW_SQL = """
WITH base AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow
  FROM events
),
ev AS (
  SELECT event_type, dow FROM base
  UNION ALL
  SELECT event_type, dow FROM base WHERE event_type = 'error' AND dow < 2
),
cells AS (
  SELECT event_type AS r, dow AS c, CAST(count(*) AS BIGINT) AS o
  FROM ev GROUP BY 1, 2
),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY r),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY c),
fold AS (
  SELECT CAST(sum(cells.o) AS BIGINT) AS n,
         CAST(count(DISTINCT cells.r) AS BIGINT) AS n_row_cats,
         CAST(count(DISTINCT cells.c) AS BIGINT) AS n_col_cats,
         CAST(sum(cells.o * cells.o // (rm.rt * cm.ct)
                  * CAST(1000000 AS BIGINT)
                + cells.o * cells.o % (rm.rt * cm.ct)
                  * CAST(1000000 AS BIGINT) // (rm.rt * cm.ct))
              AS BIGINT) AS sum_t_x1e6
  FROM cells JOIN rm USING (r) JOIN cm USING (c)
)
SELECT n, n_row_cats, n_col_cats, sum_t_x1e6,
       greatest(CAST(0 AS BIGINT),
                n * (sum_t_x1e6 - CAST(1000000 AS BIGINT))) AS chi2_x1e6,
       greatest(CAST(0 AS BIGINT),
                (sum_t_x1e6 - CAST(1000000 AS BIGINT))
                // greatest(least(n_row_cats, n_col_cats) - 1,
                            CAST(1 AS BIGINT))) AS cramers_v2_x1e6
FROM fold
"""



# ---------------------------------------------------------------------------
# Q: Kleinberg-style burst labeling of per-user activity gaps
# ---------------------------------------------------------------------------

BURST_STATES = ("calm", "burst")
BURST_START = {"calm": 0, "burst": -4}
BURST_TRANS = {
    "calm": {"calm": 0, "burst": -3},
    "burst": {"calm": -1, "burst": 0},
}
BURST_EMIT = {
    "calm": {"fast": -3, "mid": -1, "slow": 0},
    "burst": {"fast": 0, "mid": -2, "slow": -5},
}


def q_burst_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg-style burst segmentation per user: the 2-state
    (calm/burst) integer HMM decoded over the inter-arrival gap stream
    (gaps banded fast <60s / mid <3600s / slow), a state-machine reuse
    of `viterbi_decode` with a different score matrix — Kleinberg's
    burst automaton IS this decode (enter cost = trans[calm][burst]).
    Unlike viterbi_sessions this gate checks the FULL decoded path:
    n_burst counts burst-labeled gaps, and the oracle replays both the
    forward DP and the backtrace as recursive CTEs."""
    from pyspark.sql.window import Window

    from .operators.sequence import viterbi_decode

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("sec", "event_id")
    gaps = (
        ev.select(
            "user_id",
            "event_id",
            F.unix_timestamp("ts").cast("long").alias("sec"),
        )
        .select(
            "user_id",
            (F.col("sec") - F.lag("sec").over(w)).alias("gap"),
            (F.row_number().over(w) - 2).cast("long").alias("gidx"),
        )
        .filter(F.col("gap").isNotNull())
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            F.col("gidx").alias("turn_idx"),
            F.when(F.col("gap") < 60, F.lit("fast"))
            .when(F.col("gap") < 3600, F.lit("mid"))
            .otherwise(F.lit("slow"))
            .alias("obs"),
        )
    )
    out = viterbi_decode(
        gaps,
        states=BURST_STATES,
        start=BURST_START,
        trans=BURST_TRANS,
        emit=BURST_EMIT,
    )
    return out.select(
        F.col("conv_id").alias("user_id"),
        F.col("n_turns").alias("n_gaps"),
        F.size(
            F.filter(F.split("path", ">"), lambda x: x == F.lit("burst"))
        )
        .cast("long")
        .alias("n_burst"),
        "best_score",
    )


BURST_SESSIONS_SQL = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                     event_id) AS rn
  FROM events
),
obs AS (
  SELECT a.user_id, CAST(a.rn - 2 AS BIGINT) AS i,
         CASE WHEN a.sec - b.sec < 60 THEN 'fast'
              WHEN a.sec - b.sec < 3600 THEN 'mid'
              ELSE 'slow' END AS o
  FROM seq a JOIN seq b
    ON b.user_id = a.user_id AND b.rn = a.rn - 1
),
lastt AS (SELECT user_id, max(i) AS last FROM obs GROUP BY 1),
ec AS (SELECT 'fast' AS o, -3 AS e UNION ALL SELECT 'mid', -1
       UNION ALL SELECT 'slow', 0),
eb AS (SELECT 'fast' AS o, 0 AS e UNION ALL SELECT 'mid', -2
       UNION ALL SELECT 'slow', -5),
v(user_id, i, vc, vb, bkc, bkb) AS (
  SELECT obs.user_id, obs.i, 0 + ec.e, -4 + eb.e,
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
  FROM obs JOIN ec USING (o) JOIN eb USING (o)
  WHERE obs.i = 0
  UNION ALL
  SELECT o.user_id, o.i,
         greatest(v.vc + 0, v.vb + (-1)) + ec.e,
         greatest(v.vc + (-3), v.vb + 0) + eb.e,
         CASE WHEN v.vc + 0 >= v.vb + (-1) THEN 'calm' ELSE 'burst' END,
         CASE WHEN v.vc + (-3) >= v.vb + 0 THEN 'calm' ELSE 'burst' END
  FROM v
  JOIN obs o ON o.user_id = v.user_id AND o.i = v.i + 1
  JOIN ec USING (o) JOIN eb USING (o)
),
bt(user_id, i, st) AS (
  SELECT v.user_id, v.i,
         CASE WHEN vc >= vb THEN 'calm' ELSE 'burst' END
  FROM v JOIN lastt l ON l.user_id = v.user_id AND v.i = l.last
  UNION ALL
  SELECT bt.user_id, bt.i - 1,
         CASE bt.st WHEN 'calm' THEN v.bkc ELSE v.bkb END
  FROM bt JOIN v ON v.user_id = bt.user_id AND v.i = bt.i
  WHERE bt.i >= 1
),
score AS (
  SELECT v.user_id, CAST(l.last + 1 AS BIGINT) AS n_gaps,
         CAST(greatest(vc, vb) AS BIGINT) AS best_score
  FROM v JOIN lastt l ON l.user_id = v.user_id AND v.i = l.last
)
SELECT CAST(s.user_id AS VARCHAR) AS user_id, s.n_gaps,
       CAST(count(*) FILTER (WHERE bt.st = 'burst') AS BIGINT) AS n_burst,
       s.best_score
FROM score s JOIN bt ON bt.user_id = s.user_id
GROUP BY 1, 2, 4
"""



# ---------------------------------------------------------------------------
# Q: max-weight non-overlapping session windows per user (weighted
#    interval scheduling)
# ---------------------------------------------------------------------------


def q_wis_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted interval scheduling over per-user 1-hour windows: each
    event opens [sec, sec+3600) weighted by its value in cents; the DP
    picks the max-total non-overlapping subset — the "most valuable
    non-overlapping hours" curation readout. The oracle replays the
    exact DP by carrying the whole dp table as a LIST inside a
    recursive CTE (dp[p(i)] needs random access, so a scalar column
    can't carry it)."""
    from .operators.sequence import weighted_interval_schedule

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
        (F.unix_timestamp("ts").cast("long") + 3600).alias("e"),
        F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("w"),
    )
    return weighted_interval_schedule(
        ev, key="user_id", start_col="s", end_col="e",
        weight_col="w", id_col="event_id",
    )


WIS_SESSIONS_SQL = """
WITH RECURSIVE iv AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS w,
         event_id,
         row_number() OVER (
           PARTITION BY user_id
           ORDER BY CAST(floor(epoch(ts)) AS BIGINT) + 3600,
                    CAST(floor(epoch(ts)) AS BIGINT), event_id
         ) AS rn
  FROM events
),
pidx AS (
  SELECT a.user_id, a.rn, a.w,
         CAST((SELECT count(*) FROM iv b
               WHERE b.user_id = a.user_id AND b.e <= a.s) AS BIGINT) AS p
  FROM iv a
),
nper AS (SELECT user_id, max(rn) AS n FROM iv GROUP BY 1),
dp(user_id, i, hist) AS (
  SELECT user_id, 0, [CAST(0 AS BIGINT)] FROM nper
  UNION ALL
  SELECT d.user_id, d.i + 1,
         list_append(
           d.hist,
           greatest(d.hist[d.i + 1], x.w + d.hist[CAST(x.p AS INTEGER) + 1])
         )
  FROM dp d JOIN pidx x ON x.user_id = d.user_id AND x.rn = d.i + 1
)
SELECT d.user_id, CAST(n.n AS BIGINT) AS n_intervals,
       CAST(d.hist[CAST(n.n AS INTEGER) + 1] AS BIGINT) AS best_total
FROM dp d JOIN nper n ON n.user_id = d.user_id AND d.i = n.n
"""



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
    from .data.transcripts import transcripts_from_events
    from .operators.dialogue import rephrase_spans

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



# ---------------------------------------------------------------------------
# Q: RFM segmentation of users
# ---------------------------------------------------------------------------


def q_rfm_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation over events: recency anchored to the
    corpus max timestamp, monetary in exact cents, band scores by
    pinned rank position — the whole segmentation hash-gates."""
    from .operators.temporal import rfm_segments

    ev = _t(spark, sf_dir, "events")
    return rfm_segments(
        ev, key="user_id", ts_col="ts", value_col="value",
        scale=100, n_bands=5,
    )


RFM_USERS_SQL = """
WITH per AS (
  SELECT user_id,
         max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS monetary_cents
  FROM events GROUP BY 1
),
gmax AS (SELECT max(last_sec) AS g FROM per),
base AS (
  SELECT p.user_id,
         (g.g - p.last_sec) // 86400 AS recency_days,
         p.frequency, p.monetary_cents
  FROM per p CROSS JOIN gmax g
),
ranked AS (
  SELECT *,
         CAST(count(*) OVER () AS BIGINT) AS n,
         row_number() OVER (ORDER BY recency_days DESC, user_id) AS rr,
         row_number() OVER (ORDER BY frequency ASC, user_id) AS fr,
         row_number() OVER (ORDER BY monetary_cents ASC, user_id) AS mr
  FROM base
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       CAST(5 * (rr - 1) // n + 1 AS BIGINT) AS r_score,
       CAST(5 * (fr - 1) // n + 1 AS BIGINT) AS f_score,
       CAST(5 * (mr - 1) // n + 1 AS BIGINT) AS m_score,
       CAST((5 * (rr - 1) // n + 1) * 100 + (5 * (fr - 1) // n + 1) * 10
            + (5 * (mr - 1) // n + 1) AS BIGINT) AS rfm_code
FROM ranked
"""



# ---------------------------------------------------------------------------
# Q: pairwise Spearman correlation matrix over event features
# ---------------------------------------------------------------------------


def q_corr_matrix_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric-association profile: every feature PAIR becomes one key
    of `spearman_corr` via a single explode fan (the fd-profile
    pattern), so the whole C(4,2)-pair matrix costs one scan + the two
    rank windows per pair key — completing the association trio beside
    decision_stump (label) and chi2/TVD (categorical). `boosted` is the
    planted signal: hour dominates its rank order, so (boosted~hour)
    reads near +1e6 while the organic pairs calibrate the null."""
    from .operators.temporal import spearman_corr

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    vc = F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast("long")
    hr = F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 3600")
    dow = F.expr("(CAST(unix_timestamp(ts) AS BIGINT) DIV 86400 + 4) % 7")
    boosted = vc + hr * 100000
    feats = [("vcents", vc), ("hour", hr), ("dow", dow), ("boosted", boosted)]
    pairs = [
        (f"{na}~{nb}", ca, cb)
        for i, (na, ca) in enumerate(feats)
        for (nb, cb) in [f for f in feats[i + 1 :]]
    ]
    fan = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(nm).alias("pair"),
                    ca.alias("x"),
                    cb.alias("y"),
                )
                for nm, ca, cb in pairs
            ]
        )
    )
    rows = ev.select(fan.alias("p")).select("p.pair", "p.x", "p.y")
    return spearman_corr(rows, key="pair", x_col="x", y_col="y")


CORR_MATRIX_EVENTS_SQL = """
WITH rows_t AS (
  SELECT p.pair AS pair, p.x AS x, p.y AS y
  FROM (
    SELECT CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS vc,
           CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hr,
           (CAST(floor(epoch(ts)) AS BIGINT) // 86400 + 4) % 7 AS dow
    FROM events
  ), unnest([
    {'pair': 'vcents~hour', 'x': vc, 'y': hr},
    {'pair': 'vcents~dow', 'x': vc, 'y': dow},
    {'pair': 'vcents~boosted', 'x': vc, 'y': vc + hr * 100000},
    {'pair': 'hour~dow', 'x': hr, 'y': dow},
    {'pair': 'hour~boosted', 'x': hr, 'y': vc + hr * 100000},
    {'pair': 'dow~boosted', 'x': dow, 'y': vc + hr * 100000}
  ]) AS t(p)
),
ranked AS (
  SELECT pair,
         rank() OVER (PARTITION BY pair ORDER BY x)
         + count(*) OVER (PARTITION BY pair ORDER BY x
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dx,
         rank() OVER (PARTITION BY pair ORDER BY y)
         + count(*) OVER (PARTITION BY pair ORDER BY y
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dy,
         count(*) OVER (PARTITION BY pair) AS n
  FROM rows_t
),
grid AS (
  SELECT pair, n,
         (dx - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gx,
         (dy - (n + 1)) * CAST(1000000 AS BIGINT) // n AS gy
  FROM ranked
),
m AS (
  SELECT pair,
         CAST(max(n) AS BIGINT) AS n,
         CAST(sum(gx * gy) AS BIGINT) AS num,
         CAST(sum(gx * gx) AS BIGINT) AS sxx,
         CAST(sum(gy * gy) AS BIGINT) AS syy
  FROM grid GROUP BY pair
)
SELECT pair, n, num,
       CAST(CASE WHEN sxx = 0 OR syy = 0 THEN 0 ELSE
            (CASE WHEN num < 0 THEN -1 ELSE 1 END)
            * (abs(num) // greatest(sxx // 1000, 1))
            * (abs(num) // greatest(syy // 1000, 1)) END AS BIGINT)
         AS spearman_r2_x1e6
FROM m
"""



# ---------------------------------------------------------------------------
# Q: permutation test for the error-vs-click value gap
# ---------------------------------------------------------------------------


def q_perm_test_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample permutation test between error and click event
    values with a planted +1000-cent shift on errors (values are
    exponential-ish, sd ~5000 cents, so se(diff) ~158; the natural gap
    is ~-119 cents of noise): the planted ~+881 ~ 5.6 se beats every
    label shuffle (n_extreme = 0, p = 1/(K+1))
    while the machinery — exact-size reassignment by portable md5
    rank — hash-gates bit-for-bit."""
    from .operators.classifier import permutation_test

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("error", "click")
    )
    rows = ev.select(
        F.col("event_id").alias("id"),
        (
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long")
            + F.when(F.col("event_type") == "error", F.lit(1000)).otherwise(
                F.lit(0)
            )
        ).alias("v"),
        (F.col("event_type") == "error").alias("label"),
    )
    return permutation_test(
        rows, label_col="label", value_col="v", id_col="id", n_perms=64
    )


PERM_TEST_VALUE_SQL = """
WITH base AS (
  SELECT CAST(event_id AS VARCHAR) AS id,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
           + CASE WHEN event_type = 'error' THEN 1000 ELSE 0 END AS v,
         event_type = 'error' AS a
  FROM events WHERE event_type IN ('error', 'click')
),
obs AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(count(*) - sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
         CAST(sum(CASE WHEN a THEN v ELSE 0 END) AS BIGINT) AS sum_a,
         CAST(sum(CASE WHEN NOT a THEN v ELSE 0 END) AS BIGINT) AS sum_b
  FROM base
),
obsd AS (
  SELECT n, n_a, n_b,
         (sum_a // n_a * CAST(1000000 AS BIGINT)
          + sum_a % n_a * CAST(1000000 AS BIGINT) // n_a)
         - (sum_b // n_b * CAST(1000000 AS BIGINT)
            + sum_b % n_b * CAST(1000000 AS BIGINT) // n_b)
           AS obs_diff_x1e6
  FROM obs
),
fan AS (
  SELECT p.perm AS perm, b.id, b.v,
         CAST(concat('0x',
              substr(md5('pt:' || CAST(p.perm AS VARCHAR) || ':' || b.id),
                     1, 8)) AS BIGINT) AS h
  FROM base b, unnest([
    {'perm': r} FOR r IN range(64)
  ]) AS t(p)
),
ranked AS (
  SELECT perm, v,
         row_number() OVER (PARTITION BY perm ORDER BY h, id) AS rn
  FROM fan
),
perms AS (
  SELECT r.perm, o.n, o.n_a, o.n_b, d.obs_diff_x1e6,
         CAST(sum(CASE WHEN r.rn <= o.n_a THEN r.v ELSE 0 END)
              AS BIGINT) AS sum_a,
         CAST(sum(CASE WHEN r.rn > o.n_a THEN r.v ELSE 0 END)
              AS BIGINT) AS sum_b
  FROM ranked r CROSS JOIN obs o CROSS JOIN obsd d
  GROUP BY 1, 2, 3, 4, 5
),
diffs AS (
  SELECT n, n_a, obs_diff_x1e6,
         (sum_a // n_a * CAST(1000000 AS BIGINT)
          + sum_a % n_a * CAST(1000000 AS BIGINT) // n_a)
         - (sum_b // n_b * CAST(1000000 AS BIGINT)
            + sum_b % n_b * CAST(1000000 AS BIGINT) // n_b) AS diff_x1e6
  FROM perms
)
SELECT n, n_a, obs_diff_x1e6,
       CAST(sum(CASE WHEN abs(diff_x1e6) >= abs(obs_diff_x1e6)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST(64 AS BIGINT) AS n_perms,
       CAST((sum(CASE WHEN abs(diff_x1e6) >= abs(obs_diff_x1e6)
                 THEN 1 ELSE 0 END) + 1)
            * CAST(1000000 AS BIGINT) // 65 AS BIGINT) AS p_x1e6
FROM diffs
GROUP BY 1, 2, 3
"""



# ---------------------------------------------------------------------------
# Q: longest increasing value run per user
# ---------------------------------------------------------------------------


def q_lis_value_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing subsequence of value cents per user
    over event order — the monotone-engagement readout; random-ish
    values give the ~2·sqrt(n) Ulam-Hammersley baseline, so the lengths
    are a real distribution, not a constant."""
    from pyspark.sql.window import Window

    from .operators.sequence import lis_length

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    rows = ev.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("i"),
        F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    return lis_length(rows, key="user_id", idx="i", val="v")


LIS_VALUE_RUNS_SQL = """
WITH RECURSIVE rows_t AS (
  SELECT CAST(user_id AS VARCHAR) AS user_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS i,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
nper AS (SELECT user_id, max(i) AS n FROM rows_t GROUP BY 1),
pat(user_id, i, tails) AS (
  SELECT user_id, CAST(0 AS BIGINT), CAST([] AS BIGINT[]) FROM nper
  UNION ALL
  SELECT p.user_id, p.i + 1,
         CASE WHEN len(list_filter(p.tails, t -> t < r.v)) = len(p.tails)
              THEN list_append(p.tails, r.v)
              ELSE list_slice(p.tails, 1,
                              len(list_filter(p.tails, t -> t < r.v)))
                   || [r.v]
                   || list_slice(p.tails,
                                 len(list_filter(p.tails, t -> t < r.v)) + 2,
                                 len(p.tails))
         END
  FROM pat p JOIN rows_t r ON r.user_id = p.user_id AND r.i = p.i + 1
)
SELECT p.user_id, CAST(n.n AS BIGINT) AS n_turns,
       CAST(len(p.tails) AS BIGINT) AS lis_len
FROM pat p JOIN nper n ON n.user_id = p.user_id AND p.i = n.n
"""



# ---------------------------------------------------------------------------
# Q: Brier decomposition of a synthetic forecaster with one bad bin
# ---------------------------------------------------------------------------


def q_brier_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition on a deterministic calibration fixture:
    forecast f in {100,300,500,700,900} by user bucket, outcome drawn
    by portable md5 bit at the TRUE rate calib(f) = f except the 900
    bin is overconfident (true rate 400) — reliability concentrates in
    that bin while resolution reads the genuine spread of the other
    four, the textbook decomposition readout."""
    from .operators.classifier import brier_decomposition

    ev = _t(spark, sf_dir, "events")
    f = (F.col("user_id") % 5).cast("long") * 200 + 100
    calib = F.when(f == 900, F.lit(400)).otherwise(f)
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bd:"), F.col("event_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    rows = ev.select(
        f.alias("f"), (draw < calib).cast("long").alias("y")
    )
    return brier_decomposition(rows, forecast_col="f", label_col="y")


BRIER_FORECAST_SQL = """
WITH rows_t AS (
  SELECT (user_id % 5) * 200 + 100 AS f,
         CASE WHEN CAST(concat('0x',
                    substr(md5('bd:' || CAST(event_id AS VARCHAR)), 1, 8))
                    AS BIGINT) % 1000
                   < CASE WHEN (user_id % 5) * 200 + 100 = 900
                          THEN 400 ELSE (user_id % 5) * 200 + 100 END
              THEN 1 ELSE 0 END AS y
  FROM events
),
bins AS (
  SELECT f, CAST(count(*) AS BIGINT) AS nk,
         CAST(sum(y) AS BIGINT) AS ok,
         CAST(sum((f - 1000 * y) * (f - 1000 * y)) AS BIGINT) AS bsum
  FROM rows_t GROUP BY f
),
tot AS (SELECT CAST(sum(nk) AS BIGINT) AS n, CAST(sum(ok) AS BIGINT) AS o
        FROM bins),
agg AS (
  SELECT max(t.n) AS n,
         CAST(count(DISTINCT b.f) AS BIGINT) AS n_bins,
         CAST(sum(b.bsum) AS BIGINT) AS bsum,
         CAST(sum((b.f * b.nk - 1000 * b.ok) * (b.f * b.nk - 1000 * b.ok)
                  // b.nk) AS BIGINT) AS rel,
         CAST(sum((b.ok * t.n - t.o * b.nk) * (b.ok * t.n - t.o * b.nk)
                  // b.nk) AS BIGINT) AS res,
         max(t.o) AS otot
  FROM bins b CROSS JOIN tot t
)
SELECT n, n_bins,
       CAST(bsum // n AS BIGINT) AS brier_x1e6,
       CAST(rel // n AS BIGINT) AS reliability_x1e6,
       CAST(res * CAST(1000000 AS BIGINT) // n // n // n AS BIGINT)
         AS resolution_x1e6,
       CAST(otot * (n - otot) * CAST(1000000 AS BIGINT) // n // n AS BIGINT)
         AS uncertainty_x1e6
FROM agg
"""



# ---------------------------------------------------------------------------
# Q: multi-touch attribution of purchases to click/view touches
# ---------------------------------------------------------------------------


def q_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution of purchases to the click/view
    touches in the preceding 7 days, remainder pinned to the last
    touch so total credit is exactly 1e6 per attributed conversion."""
    from .operators.temporal import touch_attribution

    ev = _t(spark, sf_dir, "events")
    return touch_attribution(
        ev, key="user_id", type_col="event_type", ts_col="ts",
        id_col="event_id", conversion="purchase",
        touch_types=("click", "view"), window_seconds=7 * 86400,
    )


ATTRIBUTION_TOUCH_SQL = """
WITH base AS (
  SELECT user_id AS k, event_type AS t,
         CAST(floor(epoch(ts)) AS BIGINT) AS s, event_id AS id
  FROM events
),
conv AS (SELECT k, s AS cs, id AS cid FROM base WHERE t = 'purchase'),
touch AS (SELECT k, t AS touch_type, s AS ts2, id AS tid FROM base
          WHERE t IN ('click', 'view')),
pairs AS (
  SELECT c.k, c.cid, t.touch_type, t.ts2, t.tid
  FROM conv c JOIN touch t ON t.k = c.k
  WHERE t.ts2 <= c.cs AND c.cs - t.ts2 <= 7 * 86400 AND t.tid <> c.cid
),
credited AS (
  SELECT touch_type, cid,
         CAST(1000000 AS BIGINT)
           // count(*) OVER (PARTITION BY k, cid)
         + CASE WHEN row_number() OVER (PARTITION BY k, cid
                                        ORDER BY ts2 DESC, tid DESC) = 1
                THEN CAST(1000000 AS BIGINT)
                     % count(*) OVER (PARTITION BY k, cid)
                ELSE 0 END AS credit,
         CASE WHEN row_number() OVER (PARTITION BY k, cid
                                      ORDER BY ts2 ASC, tid ASC) = 1
              THEN 1 ELSE 0 END AS is_first,
         CASE WHEN row_number() OVER (PARTITION BY k, cid
                                      ORDER BY ts2 DESC, tid DESC) = 1
              THEN 1 ELSE 0 END AS is_last
  FROM pairs
),
per_type AS (
  SELECT touch_type,
         CAST(count(*) AS BIGINT) AS n_touches,
         CAST(count(DISTINCT cid) AS BIGINT) AS n_conversions_touched,
         CAST(sum(credit) AS BIGINT) AS credit_x1e6,
         CAST(sum(is_first) AS BIGINT) AS first_touch,
         CAST(sum(is_last) AS BIGINT) AS last_touch
  FROM credited GROUP BY 1
),
unattr AS (
  SELECT '__unattributed__' AS touch_type,
         CAST(0 AS BIGINT) AS n_touches,
         CAST(count(*) AS BIGINT) AS n_conversions_touched,
         CAST(0 AS BIGINT) AS credit_x1e6,
         CAST(0 AS BIGINT) AS first_touch,
         CAST(0 AS BIGINT) AS last_touch
  FROM conv WHERE cid NOT IN (SELECT DISTINCT cid FROM credited)
)
SELECT * FROM per_type UNION ALL SELECT * FROM unattr
"""



# ---------------------------------------------------------------------------
# Q: peak concurrent 1-hour windows per event type
# ---------------------------------------------------------------------------


def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneously-open 1-hour windows per event type and the
    earliest second it is hit — the capacity readout over the same
    interval fixture as wis_sessions."""
    from .operators.temporal import peak_concurrency

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"),
        (F.unix_timestamp("ts").cast("long") + 3600).alias("e"),
    )
    return peak_concurrency(
        ev, key="event_type", start_col="s", end_col="e", id_col="event_id"
    )


PEAK_CONCURRENCY_SQL = """
WITH base AS (
  SELECT event_type AS k,
         CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(floor(epoch(ts)) AS BIGINT) + 3600 AS e,
         event_id AS id
  FROM events
),
tagged AS (
  SELECT k, s AS at, 1 AS d, id FROM base
  UNION ALL
  SELECT k, e AS at, -1 AS d, id FROM base
),
run AS (
  SELECT k, at, d,
         sum(d) OVER (PARTITION BY k ORDER BY at, d, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS c
  FROM tagged
),
mx AS (
  SELECT *, max(c) OVER (PARTITION BY k) AS m FROM run
)
SELECT k AS event_type,
       CAST(count(*) / 2 AS BIGINT) AS n_intervals,
       CAST(max(c) AS BIGINT) AS peak,
       CAST(min(CASE WHEN c = m THEN at END) AS BIGINT) AS peak_at
FROM mx
GROUP BY k
"""



# ---------------------------------------------------------------------------
# Q: Zipf slope of the documents token distribution
# ---------------------------------------------------------------------------


def q_zipf_slope_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """msb-quantized Zipf slope over the documents corpus."""
    from .operators.text import zipf_msb_slope

    return zipf_msb_slope(_t(spark, sf_dir, "documents"), text_col="text")


ZIPF_SLOPE_DOCS_SQL = """
WITH vocab AS (
  SELECT t AS tok, CAST(count(*) AS BIGINT) AS f
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> ''
  GROUP BY 1
),
ranked AS (
  SELECT CAST(length(bin(row_number()
           OVER (ORDER BY f DESC, tok))) - 1 AS BIGINT) AS x,
         CAST(length(bin(f)) - 1 AS BIGINT) AS y,
         f
  FROM vocab
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vocab,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx
  FROM ranked
)
SELECT n_vocab, n_tokens,
       CAST(n_vocab * sxy - sx * sy AS BIGINT) AS num,
       CAST(n_vocab * sxx - sx * sx AS BIGINT) AS den,
       CASE WHEN n_vocab * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT) ELSE
       CAST((CASE WHEN n_vocab * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
            * (abs(n_vocab * sxy - sx * sy) // (n_vocab * sxx - sx * sx)
               * CAST(1000000 AS BIGINT)
             + abs(n_vocab * sxy - sx * sy) % (n_vocab * sxx - sx * sx)
               * CAST(1000000 AS BIGINT) // (n_vocab * sxx - sx * sx))
            AS BIGINT) END AS slope_x1e6
FROM m
"""



# ---------------------------------------------------------------------------
# Q: uplift by day-part segment with a planted treated-only effect
# ---------------------------------------------------------------------------


def q_uplift_dayparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic A/B over events: treatment = portable md5 bit of the
    user (unit of randomization — all of a user's events share an arm),
    outcome drawn at base rate 300/1000 with a planted +200 uplift ONLY
    for treated rows in the night segment (dp = 0) — the report should
    read ~+200k x1e6 uplift there and ~0 elsewhere."""
    from .operators.classifier import uplift_by_segment

    ev = _t(spark, sf_dir, "events")
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 2
        == 1
    )
    dp = F.expr("CAST(unix_timestamp(ts) AS BIGINT) % 86400 DIV 21600")
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("out:"), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 1000
    )
    thresh = F.lit(300) + F.when(treated & (dp == 0), F.lit(200)).otherwise(
        F.lit(0)
    )
    rows = ev.select(
        dp.alias("segment"),
        treated.alias("treated"),
        (draw < thresh).cast("long").alias("y"),
    )
    return uplift_by_segment(rows)


UPLIFT_DAYPARTS_SQL = """
WITH rows_t AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 21600 AS segment,
         CAST(concat('0x', substr(md5('arm:' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 2 = 1 AS t,
         CASE WHEN CAST(concat('0x',
                   substr(md5('out:' || CAST(event_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 1000
                  < 300 + CASE WHEN CAST(concat('0x',
                            substr(md5('arm:' || CAST(user_id AS VARCHAR)),
                                   1, 8)) AS BIGINT) % 2 = 1
                           AND CAST(floor(epoch(ts)) AS BIGINT)
                               % 86400 // 21600 = 0
                          THEN 200 ELSE 0 END
              THEN 1 ELSE 0 END AS y
  FROM events
),
arms AS (
  SELECT segment, t, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS c
  FROM rows_t GROUP BY 1, 2
),
piv AS (
  SELECT segment,
         CAST(sum(CASE WHEN t THEN n ELSE 0 END) AS BIGINT) AS n_treated,
         CAST(sum(CASE WHEN NOT t THEN n ELSE 0 END) AS BIGINT) AS n_control,
         CAST(sum(CASE WHEN t THEN c ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN NOT t THEN c ELSE 0 END) AS BIGINT) AS cc
  FROM arms GROUP BY 1
)
SELECT segment, n_treated, n_control,
       CAST(ct // greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
            + ct % greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_treated, 1) AS BIGINT) AS rate_t_x1e6,
       CAST(cc // greatest(n_control, 1) * CAST(1000000 AS BIGINT)
            + cc % greatest(n_control, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_control, 1) AS BIGINT) AS rate_c_x1e6,
       CAST((ct // greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
            + ct % greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_treated, 1))
          - (cc // greatest(n_control, 1) * CAST(1000000 AS BIGINT)
            + cc % greatest(n_control, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_control, 1)) AS BIGINT) AS uplift_x1e6,
       CAST(ct * n_control - cc * n_treated AS BIGINT) AS inc_cross
FROM piv
"""



# ---------------------------------------------------------------------------
# Q: edge embeddedness / local bridges of the nation trade graph
# ---------------------------------------------------------------------------


def q_trade_embeddedness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddedness of every trade lane and the local bridges (lanes
    whose endpoints share no common trading partner) — the weak-tie
    screen over the same shared trade-graph fixture as mst/matching."""
    from .operators.graph_algos import edge_embeddedness

    e = _trade_edges(spark, sf_dir)
    return edge_embeddedness(e, src="u", dst="v")


TRADE_EMBEDDEDNESS_SQL = f"""
WITH {TRADE_EDGES_FRAGMENT},
ue AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM ed
       WHERE u <> v),
sym AS (SELECT u, v FROM ue UNION ALL SELECT v, u FROM ue),
wedges AS (
  SELECT a.u AS ua, b.u AS ub, CAST(count(*) AS BIGINT) AS cn
  FROM sym a JOIN sym b ON a.v = b.v AND a.u < b.u
  GROUP BY 1, 2
)
SELECT ue.u, ue.v,
       CAST(coalesce(w.cn, 0) AS BIGINT) AS embeddedness,
       CAST(CASE WHEN coalesce(w.cn, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS is_local_bridge
FROM ue LEFT JOIN wedges w ON w.ua = ue.u AND w.ub = ue.v
"""



# ---------------------------------------------------------------------------
# Q: deterministic class rebalancing of event types
# ---------------------------------------------------------------------------


def q_rebalance_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class distribution after deterministic oversampling of event
    types to the majority class: the Spark side MATERIALIZES the
    replicas through rebalance_classes and counts them, the oracle
    computes the same counts in closed form (n·⌊w/1e6⌋ + |{hash frac
    draws under w%1e6}|) — so the gate checks the operator's actual
    explode output, not just its arithmetic."""
    from .operators.sampling import rebalance_classes

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_type").alias("label"), F.col("event_id").alias("id")
    )
    out = rebalance_classes(ev, class_col="label", id_col="id")
    return (
        out.groupBy("label")
        .agg(
            F.sum((F.col("replica_idx") == 0).cast("long"))
            .cast("long")
            .alias("n_before"),
            F.count(F.lit(1)).cast("long").alias("n_after"),
        )
    )


REBALANCE_TYPES_SQL = """
WITH counts AS (
  SELECT event_type AS label, CAST(count(*) AS BIGINT) AS n FROM events
  GROUP BY 1
),
w AS (
  SELECT label, n,
         (SELECT max(n) FROM counts) * CAST(1000000 AS BIGINT) // n AS w
  FROM counts
),
fracs AS (
  SELECT e.event_type AS label,
         CASE WHEN CAST(concat('0x',
                   substr(md5('rb:' || CAST(e.event_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 1000000
                  < w.w % 1000000
              THEN 1 ELSE 0 END AS extra
  FROM events e JOIN w ON w.label = e.event_type
)
SELECT w.label, w.n AS n_before,
       CAST(w.n * (w.w // 1000000) + sum(f.extra) AS BIGINT) AS n_after
FROM w JOIN fracs f ON f.label = w.label
GROUP BY 1, 2, w.w
"""



# ---------------------------------------------------------------------------
# Q: difference-in-differences with a planted treated-post effect
# ---------------------------------------------------------------------------


def q_did_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DiD over events: arms by user-level md5 (same device as
    uplift_dayparts), periods split at the fixed calendar midpoint of
    the corpus (engine-neutral: epoch-day >= the constant both engines
    compute from the data via one broadcast agg), with a planted
    +2000-cent boost on treated-post rows (se(did) ~ 200 cents on the
    heavy-tailed values) — did reads ~+1.8e9 micro-cents while pre_gap
    calibrates within one se of 0."""
    from .operators.classifier import diff_in_diff

    ev = _t(spark, sf_dir, "events")
    treated = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("arm:"), F.col("user_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 2
        == 1
    )
    sec = F.unix_timestamp("ts").cast("long")
    mid = ev.agg(
        ((F.min(sec) + F.max(sec)) / 2).cast("long").alias("__mid")
    )
    rows = ev.join(F.broadcast(mid)).select(
        treated.alias("treated"),
        (sec >= F.col("__mid")).alias("post"),
        (
            F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
            .cast("long")
            + F.when(treated & (sec >= F.col("__mid")), F.lit(2000)).otherwise(
                F.lit(0)
            )
        ).alias("v"),
    )
    return diff_in_diff(rows)


DID_VALUE_SQL = """
WITH mid AS (
  SELECT CAST((min(CAST(floor(epoch(ts)) AS BIGINT))
             + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS BIGINT) AS m
  FROM events
),
rows_t AS (
  SELECT CAST(concat('0x', substr(md5('arm:' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 2 = 1 AS t,
         CAST(floor(epoch(ts)) AS BIGINT) >= mid.m AS p,
         CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
         + CASE WHEN CAST(concat('0x',
                     substr(md5('arm:' || CAST(user_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 2 = 1
                 AND CAST(floor(epoch(ts)) AS BIGINT) >= mid.m
                THEN 2000 ELSE 0 END AS v
  FROM events CROSS JOIN mid
),
cells AS (
  SELECT t, p, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS s
  FROM rows_t GROUP BY 1, 2
),
piv AS (
  SELECT CAST(sum(CASE WHEN t AND NOT p THEN n ELSE 0 END) AS BIGINT)
           AS n_t_pre,
         CAST(sum(CASE WHEN t AND p THEN n ELSE 0 END) AS BIGINT)
           AS n_t_post,
         CAST(sum(CASE WHEN NOT t AND NOT p THEN n ELSE 0 END) AS BIGINT)
           AS n_c_pre,
         CAST(sum(CASE WHEN NOT t AND p THEN n ELSE 0 END) AS BIGINT)
           AS n_c_post,
         CAST(sum(CASE WHEN t AND NOT p THEN s ELSE 0 END) AS BIGINT)
           AS s_t_pre,
         CAST(sum(CASE WHEN t AND p THEN s ELSE 0 END) AS BIGINT)
           AS s_t_post,
         CAST(sum(CASE WHEN NOT t AND NOT p THEN s ELSE 0 END) AS BIGINT)
           AS s_c_pre,
         CAST(sum(CASE WHEN NOT t AND p THEN s ELSE 0 END) AS BIGINT)
           AS s_c_post
  FROM cells
)
SELECT n_t_pre, n_t_post, n_c_pre, n_c_post,
       CAST(s_t_pre // greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
            + s_t_pre % greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_t_pre, 1) AS BIGINT) AS mean_t_pre_x1e6,
       CAST(s_t_post // greatest(n_t_post, 1) * CAST(1000000 AS BIGINT)
            + s_t_post % greatest(n_t_post, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_t_post, 1) AS BIGINT) AS mean_t_post_x1e6,
       CAST(s_c_pre // greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
            + s_c_pre % greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_c_pre, 1) AS BIGINT) AS mean_c_pre_x1e6,
       CAST(s_c_post // greatest(n_c_post, 1) * CAST(1000000 AS BIGINT)
            + s_c_post % greatest(n_c_post, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_c_post, 1) AS BIGINT) AS mean_c_post_x1e6,
       CAST((s_t_pre // greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
            + s_t_pre % greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_t_pre, 1))
          - (s_c_pre // greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
            + s_c_pre % greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_c_pre, 1)) AS BIGINT) AS pre_gap_x1e6,
       CAST(((s_t_post // greatest(n_t_post, 1) * CAST(1000000 AS BIGINT)
            + s_t_post % greatest(n_t_post, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_t_post, 1))
          - (s_t_pre // greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
            + s_t_pre % greatest(n_t_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_t_pre, 1)))
          - ((s_c_post // greatest(n_c_post, 1) * CAST(1000000 AS BIGINT)
            + s_c_post % greatest(n_c_post, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_c_post, 1))
          - (s_c_pre // greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
            + s_c_pre % greatest(n_c_pre, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_c_pre, 1))) AS BIGINT) AS did_x1e6
FROM piv
"""



# ---------------------------------------------------------------------------
# Q: CUPED variance reduction from the pre-period covariate
# ---------------------------------------------------------------------------


def q_cuped_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED over per-user pre/post mean values (cents, truncated —
    replayed): the post outcome is planted to carry half the pre-period
    signal (y' = y + x DIV 2), so θ reads ~+0.55 (0.5 planted + the
    small organic covariance) and the variance reduction is a visibly
    nonzero r² ~ 0.20 while the un-planted post noise keeps it well
    below 1."""
    from .operators.classifier import cuped_adjustment

    ev = _t(spark, sf_dir, "events")
    sec = F.unix_timestamp("ts").cast("long")
    vc = F.floor(F.col("value").cast("double") * 100 + F.lit(0.5)).cast("long")
    mid = ev.agg(((F.min(sec) + F.max(sec)) / 2).cast("long").alias("__mid"))
    per = (
        ev.join(F.broadcast(mid))
        .select(
            "user_id",
            F.when(sec < F.col("__mid"), vc).alias("pre_v"),
            F.when(sec >= F.col("__mid"), vc).alias("post_v"),
        )
        .groupBy("user_id")
        .agg(
            F.count("pre_v").cast("long").alias("n_pre"),
            F.sum("pre_v").cast("long").alias("s_pre"),
            F.count("post_v").cast("long").alias("n_post"),
            F.sum("post_v").cast("long").alias("s_post"),
        )
        .filter((F.col("n_pre") > 0) & (F.col("n_post") > 0))
    )
    rows = per.select(
        F.expr("s_pre DIV n_pre").alias("x"),
        F.expr("s_post DIV n_post + (s_pre DIV n_pre) DIV 2").alias("y"),
    )
    return cuped_adjustment(rows)


CUPED_VALUE_SQL = """
WITH mid AS (
  SELECT CAST((min(CAST(floor(epoch(ts)) AS BIGINT))
             + max(CAST(floor(epoch(ts)) AS BIGINT))) // 2 AS BIGINT) AS m
  FROM events
),
per AS (
  SELECT user_id,
         CAST(count(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < mid.m
                         THEN 1 END) AS BIGINT) AS n_pre,
         CAST(coalesce(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < mid.m
                  THEN CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                            AS BIGINT) END), 0) AS BIGINT) AS s_pre,
         CAST(count(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid.m
                         THEN 1 END) AS BIGINT) AS n_post,
         CAST(coalesce(sum(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid.m
                  THEN CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5)
                            AS BIGINT) END), 0) AS BIGINT) AS s_post
  FROM events CROSS JOIN mid
  GROUP BY user_id
),
rows_t AS (
  SELECT s_pre // n_pre AS x,
         s_post // n_post + (s_pre // n_pre) // 2 AS y
  FROM per WHERE n_pre > 0 AND n_post > 0
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy0,
         CAST(sum(x * x) AS BIGINT) AS sxx0,
         CAST(sum(y * y) AS BIGINT) AS syy0
  FROM rows_t
),
c AS (
  SELECT n,
         CAST(n * sxy0 - sx * sy AS BIGINT) AS sxy,
         CAST(n * sxx0 - sx * sx AS BIGINT) AS sxx,
         CAST(n * syy0 - sy * sy AS BIGINT) AS syy
  FROM m
)
SELECT n, sxy, sxx, syy,
       CASE WHEN sxx = 0 THEN CAST(0 AS BIGINT) ELSE
       CAST((CASE WHEN sxy < 0 THEN -1 ELSE 1 END)
            * (CASE WHEN sxx >= 1000000
               THEN abs(sxy) // (sxx // 1000000)
               ELSE abs(sxy) * CAST(1000000 AS BIGINT) // sxx END)
            AS BIGINT) END AS theta_x1e6,
       CASE WHEN sxx = 0 OR syy = 0 THEN CAST(0 AS BIGINT) ELSE
       CAST((CASE WHEN sxy < 0 THEN -1 ELSE 1 END)
            * (CASE WHEN sxx >= 1000000
               THEN abs(sxy) // (sxx // 1000)
               ELSE abs(sxy) * CAST(1000 AS BIGINT) // sxx END)
            * (CASE WHEN syy >= 1000000
               THEN abs(sxy) // (syy // 1000)
               ELSE abs(sxy) * CAST(1000 AS BIGINT) // syy END)
            AS BIGINT) END AS r2_x1e6,
       abs(CASE WHEN sxx = 0 OR syy = 0 THEN CAST(0 AS BIGINT) ELSE
       CAST((CASE WHEN sxy < 0 THEN -1 ELSE 1 END)
            * (CASE WHEN sxx >= 1000000
               THEN abs(sxy) // (sxx // 1000)
               ELSE abs(sxy) * CAST(1000 AS BIGINT) // sxx END)
            * (CASE WHEN syy >= 1000000
               THEN abs(sxy) // (syy // 1000)
               ELSE abs(sxy) * CAST(1000 AS BIGINT) // syy END)
            AS BIGINT) END) AS var_reduction_x1e6
FROM c
"""



# ---------------------------------------------------------------------------
# Q: growth accounting of active users per 30-day period
# ---------------------------------------------------------------------------


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAU bridge over events: per 30-epoch-day period, active users
    split into new / retained / resurrected, churn attributed into the
    first inactive period — the bridge identities reconcile exactly."""
    from .operators.temporal import growth_accounting

    ev = _t(spark, sf_dir, "events")
    return growth_accounting(ev, key="user_id", ts_col="ts", period="month")


GROWTH_ACCOUNTING_SQL = """
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 // 30 AS p
  FROM events
),
lagged AS (
  SELECT k, p,
         lag(p) OVER (PARTITION BY k ORDER BY p) AS prev,
         lead(p) OVER (PARTITION BY k ORDER BY p) AS nxt
  FROM act
),
classed AS (
  SELECT p,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new,
         CAST(sum(CASE WHEN p - prev = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_retained,
         CAST(sum(CASE WHEN p - prev > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_resurrected
  FROM lagged GROUP BY p
),
gmax AS (SELECT max(p) AS g FROM act),
churned AS (
  SELECT p + 1 AS p, CAST(count(*) AS BIGINT) AS n_churned
  FROM lagged CROSS JOIN gmax
  WHERE (nxt IS NULL OR nxt - p > 1) AND p + 1 <= gmax.g
  GROUP BY p + 1
)
SELECT coalesce(c.p, ch.p) AS period,
       CAST(coalesce(c.n_active, 0) AS BIGINT) AS n_active,
       CAST(coalesce(c.n_new, 0) AS BIGINT) AS n_new,
       CAST(coalesce(c.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(coalesce(c.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(coalesce(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM classed c FULL OUTER JOIN churned ch ON ch.p = c.p
"""



# ---------------------------------------------------------------------------
# Q: running-maximum record counts per user
# ---------------------------------------------------------------------------


def q_record_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict record counts of value cents per user in event order —
    exchangeable values read ~H(n) ≈ ln n records, the zero-parameter
    trend null."""
    from .operators.temporal import record_counts

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
        F.col("event_id").alias("id"),
    )
    return record_counts(ev, key="user_id", ts_col="ts", val_col="v",
                         id_col="id")


RECORD_COUNTS_SQL = """
WITH rows_t AS (
  SELECT user_id AS k,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                     event_id) AS pos,
         CASE WHEN CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)
                   > coalesce(max(CAST(floor(CAST(value AS DOUBLE) * 100
                                              + 0.5) AS BIGINT))
                        OVER (PARTITION BY user_id
                              ORDER BY CAST(floor(epoch(ts)) AS BIGINT),
                                       event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING),
                        CAST(-4611686018427387904 AS BIGINT))
              THEN 1 ELSE 0 END AS rec
  FROM events
)
SELECT k AS user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(rec) AS BIGINT) AS n_records,
       CAST(max(CASE WHEN rec = 1 THEN pos END) AS BIGINT)
         AS last_record_pos
FROM rows_t GROUP BY k
"""



# ---------------------------------------------------------------------------
# Q: vocabulary richness of the documents corpus
# ---------------------------------------------------------------------------


def q_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-token ratio, hapax/dis legomena counts, and msb-quantized
    Herdan C (log vocab / log tokens) — the vocabulary-health card
    beside zipf_slope_docs: shrinking TTR or a hapax share collapsing
    toward 0 flags template/boilerplate corpora before any model sees
    them. All ratios staged integer quotients; Herdan C uses the
    bin()-length msb logs so it replays exactly."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != F.lit(""))
    vocab = (
        docs.select(F.explode(toks).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    return vocab.agg(
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        F.sum("f").cast("long").alias("n_tokens"),
        F.sum((F.col("f") == 1).cast("long")).cast("long").alias("n_hapax"),
        F.sum((F.col("f") == 2).cast("long")).cast("long").alias("n_dis"),
    ).select(
        "n_vocab",
        "n_tokens",
        "n_hapax",
        "n_dis",
        F.expr(
            "n_vocab DIV n_tokens * CAST(1000000 AS BIGINT)"
            " + n_vocab % n_tokens * CAST(1000000 AS BIGINT) DIV n_tokens"
        ).alias("ttr_x1e6"),
        F.expr(
            "n_hapax * CAST(1000000 AS BIGINT) DIV greatest(n_vocab, 1)"
        ).alias("hapax_share_x1e6"),
        F.expr(
            "CAST((length(bin(n_vocab)) - 1) AS BIGINT)"
            " * CAST(1000000 AS BIGINT)"
            " DIV greatest(CAST(length(bin(n_tokens)) - 1 AS BIGINT), 1)"
        ).alias("herdan_c_msb_x1e6"),
    )


VOCAB_RICHNESS_SQL = """
WITH vocab AS (
  SELECT t, CAST(count(*) AS BIGINT) AS f
  FROM documents, unnest(string_split(text, ' ')) AS u(t)
  WHERE t <> ''
  GROUP BY 1
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vocab,
         CAST(sum(f) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
         CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dis
  FROM vocab
)
SELECT n_vocab, n_tokens, n_hapax, n_dis,
       CAST(n_vocab // n_tokens * CAST(1000000 AS BIGINT)
            + n_vocab % n_tokens * CAST(1000000 AS BIGINT) // n_tokens
            AS BIGINT) AS ttr_x1e6,
       CAST(n_hapax * CAST(1000000 AS BIGINT) // greatest(n_vocab, 1)
            AS BIGINT) AS hapax_share_x1e6,
       CAST(CAST(length(bin(n_vocab)) - 1 AS BIGINT)
            * CAST(1000000 AS BIGINT)
            // greatest(CAST(length(bin(n_tokens)) - 1 AS BIGINT), 1)
            AS BIGINT) AS herdan_c_msb_x1e6
FROM m
"""



# ---------------------------------------------------------------------------
# Q: Simpson's paradox trap — segment uplifts positive, pooled negative
# ---------------------------------------------------------------------------


def q_simpsons_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confounding demonstration every experimentation stack needs
    on file: treatment assignment is deliberately CORRELATED with a
    difficulty segment (easy base rate 700/1000 vs hard 200/1000;
    treatment lands on the hard segment 80% of the time), while the
    true per-segment effect is +50/1000. Both per-segment uplifts read
    ~+50k x1e6; the pooled row reads strongly NEGATIVE — Simpson's
    reversal, exactly why uplift must be read per segment when arms
    aren't randomized. Same integer machinery as uplift_dayparts,
    applied at two granularities and unioned."""
    from .operators.classifier import uplift_by_segment

    ev = _t(spark, sf_dir, "events")
    seg = (F.col("user_id") % 2).cast("long")

    def h(tag):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(tag), F.col("user_id").cast("string"))
                    ),
                    1, 8,
                ),
                16, 10,
            ).cast("long")
            % 1000
        )

    ho = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("so:"), F.col("event_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % 1000
    )
    treated = h("sarm:") < F.when(seg == 0, F.lit(200)).otherwise(F.lit(800))
    base = F.when(seg == 0, F.lit(700)).otherwise(F.lit(200))
    y = (ho < base + F.when(treated, F.lit(50)).otherwise(F.lit(0))).cast(
        "long"
    )
    rows = ev.select(
        seg.cast("string").alias("segment"),
        treated.alias("treated"),
        y.alias("y"),
    )
    per = uplift_by_segment(rows)
    pooled = uplift_by_segment(
        rows.withColumn("segment", F.lit("__pooled__"))
    )
    return per.unionByName(pooled)


SIMPSONS_TRAP_SQL = """
WITH rows_t AS (
  SELECT CAST(user_id % 2 AS VARCHAR) AS segment,
         CAST(concat('0x', substr(md5('sarm:' || CAST(user_id AS VARCHAR)),
                                  1, 8)) AS BIGINT) % 1000
           < CASE WHEN user_id % 2 = 0 THEN 200 ELSE 800 END AS t,
         CASE WHEN CAST(concat('0x',
                   substr(md5('so:' || CAST(event_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 1000
                  < CASE WHEN user_id % 2 = 0 THEN 700 ELSE 200 END
                    + CASE WHEN CAST(concat('0x',
                            substr(md5('sarm:' || CAST(user_id AS VARCHAR)),
                                   1, 8)) AS BIGINT) % 1000
                           < CASE WHEN user_id % 2 = 0 THEN 200 ELSE 800 END
                      THEN 50 ELSE 0 END
              THEN 1 ELSE 0 END AS y
  FROM events
),
both_g AS (
  SELECT segment, t, y FROM rows_t
  UNION ALL
  SELECT '__pooled__', t, y FROM rows_t
),
arms AS (
  SELECT segment, t, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS c
  FROM both_g GROUP BY 1, 2
),
piv AS (
  SELECT segment,
         CAST(sum(CASE WHEN t THEN n ELSE 0 END) AS BIGINT) AS n_treated,
         CAST(sum(CASE WHEN NOT t THEN n ELSE 0 END) AS BIGINT) AS n_control,
         CAST(sum(CASE WHEN t THEN c ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN NOT t THEN c ELSE 0 END) AS BIGINT) AS cc
  FROM arms GROUP BY 1
)
SELECT segment, n_treated, n_control,
       CAST(ct // greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
            + ct % greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_treated, 1) AS BIGINT) AS rate_t_x1e6,
       CAST(cc // greatest(n_control, 1) * CAST(1000000 AS BIGINT)
            + cc % greatest(n_control, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_control, 1) AS BIGINT) AS rate_c_x1e6,
       CAST((ct // greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
            + ct % greatest(n_treated, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_treated, 1))
          - (cc // greatest(n_control, 1) * CAST(1000000 AS BIGINT)
            + cc % greatest(n_control, 1) * CAST(1000000 AS BIGINT)
              // greatest(n_control, 1)) AS BIGINT) AS uplift_x1e6,
       CAST(ct * n_control - cc * n_treated AS BIGINT) AS inc_cross
FROM piv
"""



# ---------------------------------------------------------------------------
# Q: Bloom filter false-positive calibration on held-out probes
# ---------------------------------------------------------------------------


def q_bloom_fp_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured false-positive rate of the decontamination Bloom filter
    against TRUE non-members: build on even event ids, probe the odd
    half (disjoint by construction), report load and fp_x1e6 — the
    calibration a pipeline must check before trusting maybe=0 pruning
    at a new m/k/n operating point. At m=8192, k=3, n≈5000 the load
    kn/m ≈ 1.8 puts the theoretical fp near 0.5 — deliberately
    overloaded so the measurement is visibly nonzero and the
    m-sizing lesson is on the record."""
    from .operators.sketches import bloom_build, bloom_maybe_contains

    ev = _t(spark, sf_dir, "events").select(
        F.col("event_id").cast("string").alias("eid"),
        (F.col("event_id") % 2).alias("par"),
    ).distinct()
    members = ev.filter(F.col("par") == 0).select("eid")
    probes = ev.filter(F.col("par") == 1).select("eid")
    bloom = bloom_build(members, "eid", m_bits=8192, k_hashes=3)
    res = bloom_maybe_contains(bloom, probes, "eid", m_bits=8192, k_hashes=3)
    stats = members.agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    return (
        res.agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum("maybe").cast("long").alias("n_false_pos"),
        )
        .join(F.broadcast(stats))
        .select(
            "n_members",
            "n_probes",
            "n_false_pos",
            F.expr(
                "n_false_pos * CAST(1000000 AS BIGINT)"
                " DIV greatest(n_probes, 1)"
            ).alias("fp_x1e6"),
        )
    )


BLOOM_FP_CALIBRATION_SQL = """
WITH ids AS (SELECT DISTINCT CAST(event_id AS VARCHAR) AS eid,
                    event_id % 2 AS par FROM events),
members AS (SELECT eid FROM ids WHERE par = 0),
probes AS (SELECT eid FROM ids WHERE par = 1),
bits AS (
  SELECT DISTINCT
    CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || eid), 1, 8))
         AS BIGINT) % 8192 AS bit
  FROM (SELECT eid, unnest(range(0, 3)) AS j FROM members)
),
pr AS (
  SELECT eid, j,
    CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || ':' || eid), 1, 8))
         AS BIGINT) % 8192 AS bit
  FROM (SELECT eid, unnest(range(0, 3)) AS j FROM probes)
),
maybe AS (
  SELECT p.eid, CASE WHEN count(b.bit) = 3 THEN 1 ELSE 0 END AS maybe
  FROM pr p LEFT JOIN bits b USING (bit)
  GROUP BY p.eid
),
agg AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
         CAST(count(*) AS BIGINT) AS n_probes,
         CAST(sum(maybe) AS BIGINT) AS n_false_pos
  FROM maybe
)
SELECT n_members, n_probes, n_false_pos,
       CAST(n_false_pos * CAST(1000000 AS BIGINT)
            // greatest(n_probes, 1) AS BIGINT) AS fp_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Q: characteristic sets (Neumann & Moerkotte) — structure synopsis +
# star-join cardinality estimation (operators/cardinality.py)
# ---------------------------------------------------------------------------


def _user_type_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """high-value events as a (subject=user, predicate=event_type) triple
    view — the entity-shape table characteristic sets summarize. The
    value >= 90 restriction makes shapes DIFFER across users (15 distinct
    sets at sf0.01; unfiltered, every user carries all 5 types and the
    synopsis degenerates to one row)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value") >= 90)
        .select(
            F.col("user_id").cast("string").alias("subject"),
            F.col("event_type").alias("predicate"),
        )
    )


def q_char_sets_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic sets of the user/event-type shape table: one row per
    distinct predicate SET with subject and triple counts — the exact
    structure synopsis an RDF optimizer prices star joins from, and a
    schema-discovery readout (which entity shapes exist) the reference
    cannot produce. Two combinable aggs, no joins."""
    from .operators.cardinality import characteristic_sets

    return characteristic_sets(_user_type_triples(spark, sf_dir))


CHAR_SETS_USERS_SQL = """
WITH per AS (
  SELECT CAST(user_id AS VARCHAR) AS s, event_type AS p, count(*) AS n
  FROM events WHERE value >= 90 GROUP BY 1, 2
),
cs AS (
  SELECT s, array_to_string(list_sort(list(p)), '|') AS cs_key,
         CAST(sum(n) AS BIGINT) AS nt
  FROM per GROUP BY s
)
SELECT cs_key, CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(nt) AS BIGINT) AS n_triples
FROM cs GROUP BY 1
"""


def q_char_sets_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic sets over the FLAGSHIP EVENT GRAPH itself: event
    nodes split into shapes by which optional predicates they carry
    (usedTool on tool turns, timestamps on date-mentioning turns,
    nextEvent absent on last turns), conversation nodes into their own
    set — the per-shape census of the KG this engine emits. Oracle
    recomputes the graph via FLAGSHIP_SQL and collapses it identically."""
    from .data.transcripts import conv_string_expr, transcripts_from_events_longkey
    from .graph.materialize import build_event_graph
    from .operators.cardinality import characteristic_sets

    g = build_event_graph(
        transcripts_from_events_longkey(spark, sf_dir),
        conv_expr=conv_string_expr(),
    )
    return characteristic_sets(g)


CHAR_SETS_GRAPH_SQL = f"""
WITH per AS (
  SELECT subject AS s, predicate AS p, count(*) AS n
  FROM ({FLAGSHIP_SQL}) g GROUP BY 1, 2
),
cs AS (
  SELECT s, array_to_string(list_sort(list(p)), '|') AS cs_key,
         CAST(sum(n) AS BIGINT) AS nt
  FROM per GROUP BY s
)
SELECT cs_key, CAST(count(*) AS BIGINT) AS n_subjects,
       CAST(sum(nt) AS BIGINT) AS n_triples
FROM cs GROUP BY 1
"""


def q_star_card_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join pricing from characteristic sets: estimate
    |?s click ?o1 . ?s view ?o2| via the per-set multiplicity formula
    (exact integer quotients: Σ_S t1·t2 DIV n_subjects) next to the true
    cardinality (Σ_s n1·n2) — the estimator-accuracy readout; the gap is
    exactly the within-set non-uniformity the paper's assumption names."""
    from .operators.cardinality import star_cardinality_estimate

    return star_cardinality_estimate(
        _user_type_triples(spark, sf_dir), ["click", "view"]
    )


STAR_CARD_ESTIMATE_SQL = """
WITH per AS (
  SELECT CAST(user_id AS VARCHAR) AS s, event_type AS p, count(*) AS n
  FROM events WHERE value >= 90 GROUP BY 1, 2
),
wide AS (
  SELECT s,
         CAST(sum(CASE WHEN p = 'click' THEN n ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN p = 'view' THEN n ELSE 0 END) AS BIGINT) AS n2,
         array_to_string(list_sort(list(p)), '|') AS cs_key
  FROM per GROUP BY s
),
both_t AS (SELECT * FROM wide WHERE n1 > 0 AND n2 > 0),
sets AS (
  SELECT cs_key, CAST(count(*) AS BIGINT) AS ns,
         CAST(sum(n1) AS BIGINT) AS t1, CAST(sum(n2) AS BIGINT) AS t2
  FROM both_t GROUP BY 1
)
SELECT (SELECT CAST(sum(t1 * t2 // ns) AS BIGINT) FROM sets) AS est_rows,
       (SELECT CAST(sum(n1 * n2) AS BIGINT) FROM both_t) AS true_rows
"""


# ---------------------------------------------------------------------------
# Q: operator-variant equivalences proven THROUGH the gate (r4): the same
# oracle SQL validates two independent distributed implementations, so the
# gate itself certifies strategy/contract equivalence at sf0.01 — the
# in-repo analog of the soak_skew.py findings.
# ---------------------------------------------------------------------------


def q_cc_canonical_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cc_canonical's chain fixture under the OTHER strategy (agg + AQE,
    no precontraction) — the hub-safe default for unknown degree
    distributions (soak_skew.py: agg holds to 1e5-degree hubs). Same
    oracle as cc_canonical: the gate certifies both strategies emit
    identical components."""
    from .linking.canonicalize import connected_components

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    edges = (
        cust.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("c_custkey").alias("src"), F.col("nxt").alias("dst"))
    )
    singletons = cust.select(F.col("c_custkey").alias("node"))
    cc = connected_components(
        edges, all_nodes=singletons, strategy="agg", precontract=False
    )
    return cc.select("node", "component").withColumnRenamed(
        "component", "canonical"
    )


def q_scc_nations_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scc_nations WITHOUT mutual-1-cycle precontraction (the raw
    FW-BW-Trim loop) — same oracle: the gate certifies the r4
    precontraction preserves SCC labels exactly."""
    from .operators.graph_algos import strongly_connected_components

    flows = _nation_flows(spark, sf_dir)
    mx = flows.agg(F.max("n_flows").alias("m"))
    edges = (
        flows.crossJoin(F.broadcast(mx))
        .filter(F.col("n_flows") * 2 >= F.col("m"))
        .select("src", "dst")
    )
    return strongly_connected_components(edges, precontract=False).select(
        "node", "scc"
    )


def q_salted_count_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key counting through the explicit two-level salted aggregation
    (operators/skew.py salted_count) — the extreme-hub fallback when
    map-side combine is defeated by pre-partitioning. The oracle is the
    PLAIN count: salting must never change results (soak_skew.py measured
    it cost-neutral; this row certifies it value-neutral)."""
    from .operators.skew import salted_count

    ev = _t(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"], salt_buckets=16).select(
        "event_type", F.col("count").cast("long").alias("n_events")
    )


SALTED_COUNT_TYPES_SQL = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY 1
"""


def q_salted_join_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonicalization-style fact-to-dim join through skew.py
    salted_join (small side replicated S ways, big side scattered across
    salt buckets): per-nation order count + exact integer-cents revenue.
    Oracle = the plain equi-join — salting is a pure physical rewrite."""
    from .operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    return (
        salted_join(orders, cust, "custkey", salt_buckets=8)
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


SALTED_JOIN_NATION_SQL = """
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""



# ---------------------------------------------------------------------------
# DSIR importance resampling (hashed-unigram LLR, msb16-quantized) and
# exact DAG path statistics (layered Kahn DP vs recursive path enumeration)
# ---------------------------------------------------------------------------


def _duck_msb16(e: str) -> str:
    """DuckDB replay of operators/sampling._msb16_sql: 16*floor(log2 q) +
    (q*16 >> floor(log2 q)) - 16 with the same >=1 / <=2^52 clamps."""
    g = f"least(greatest({e}, CAST(1 AS BIGINT)), CAST(4503599627370496 AS BIGINT))"
    lg = f"(length(bin({g})) - 1)"
    return f"(16 * {lg} + ({g}) * 16 // (CAST(1 AS BIGINT) << {lg}) - 16)"


def q_dsir_bucket_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al. 2023) hashed-unigram importance scores: per md5
    bucket, add-1 smoothed target/raw count ratio, log2-quantized with the
    exact-integer msb16 device (16 sub-octave steps) — the bucket model a
    data-selection pass broadcasts. No float log anywhere; the oracle
    replays bin()/shift/DIV bit-for-bit."""
    from .operators.sampling import dsir_bucket_scores

    docs = _t(spark, sf_dir, "documents")
    return dsir_bucket_scores(docs, F.col("lang") == "en", n_buckets=256)


def q_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: score every NON-target (lang != en) document by the
    sum of its tokens' bucket LLRs and keep the deterministic top-100 by
    (weight desc, doc_id) — the top-k variant of DSIR's importance
    resampling. Bucket table broadcast (<=256 rows), one map-side-combined
    groupBy(doc), TakeOrderedAndProject: no corpus-wide sort or window."""
    from .operators.sampling import dsir_select

    docs = _t(spark, sf_dir, "documents")
    return dsir_select(docs, F.col("lang") == "en", k=100, n_buckets=256)


_DSIR_COMMON_SQL = """
toks AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
tok2 AS (
  SELECT doc_id, is_t,
         CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % 256 AS bucket
  FROM toks WHERE tok <> ''
),
bkt AS (
  SELECT bucket,
         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         CAST(sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS BIGINT) AS cr
  FROM tok2 GROUP BY bucket
),
tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS t_tot, CAST(sum(cr) AS BIGINT) AS r_tot
  FROM bkt
),
sc AS (
  SELECT bucket, ct, cr,
         CAST({qn_m16} - {qd_m16} AS BIGINT) AS s16
  FROM bkt, tot
)
""".format(
    qn_m16=_duck_msb16("(ct + 1) * CAST(1048576 AS BIGINT) // (cr + 1)"),
    qd_m16=_duck_msb16(
        "(t_tot + 256) * CAST(1048576 AS BIGINT) // (r_tot + 256)"
    ),
)

DSIR_BUCKET_SQL = "WITH " + _DSIR_COMMON_SQL + """
SELECT bucket, ct, cr, s16 FROM sc
"""

DSIR_TOPK_SQL = "WITH " + _DSIR_COMMON_SQL + """,
wgt AS (
  SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         CAST(sum(s.s16) AS BIGINT) AS w_s16
  FROM (SELECT doc_id, bucket FROM tok2 WHERE NOT is_t) r
  JOIN sc s USING (bucket)
  GROUP BY r.doc_id
)
SELECT doc_id, n_toks, w_s16,
       CAST(row_number() OVER (ORDER BY w_s16 DESC, doc_id ASC) AS BIGINT)
         AS rnk
FROM wgt
QUALIFY rnk <= 100
"""


def _divide_dag_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic divide-lattice DAG on custkeys: k -> k DIV 2 and
    k -> k DIV 3 (when distinct and >= 1). Every path terminates at 1;
    depth is log-bounded, path multiplicity grows polynomially — the
    multiple-inheritance fixture for the DAG DP."""
    nodes = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= 1)
        .select(F.col("c_custkey").cast("long").alias("k"))
    )
    e2 = nodes.filter(F.col("k") >= 2).select(
        F.col("k").alias("src"), F.expr("k DIV 2").alias("dst")
    )
    e3 = nodes.filter(
        (F.col("k") >= 3) & (F.expr("k DIV 3") != F.expr("k DIV 2"))
    ).select(F.col("k").alias("src"), F.expr("k DIV 3").alias("dst"))
    return e2.unionByName(e3)


def q_dag_path_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAG path statistics (longest/shortest root distance + EXACT
    distinct-path count) by layered Kahn DP — a node finalizes only when
    all its out-neighbors are final, so n_paths is a true sum, never a
    relaxation. The oracle enumerates every path with a recursive CTE and
    aggregates — two entirely different algorithms, identical answers."""
    from .operators.graph_algos import dag_path_stats

    return dag_path_stats(_divide_dag_edges(spark, sf_dir), root=1)


def q_dag_depth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological layer census of the divide DAG: nodes and total path
    multiplicity per longest-path layer (the layering a taxonomy uses to
    order superclass-annotation rounds)."""
    from .operators.graph_algos import dag_path_stats

    st = dag_path_stats(_divide_dag_edges(spark, sf_dir), root=1)
    return st.groupBy("d_long").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum("n_paths").cast("long").alias("sum_paths"),
    )


_DAG_WALK_SQL = """
nodes AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey >= 1
),
edges AS (
  SELECT k AS src, k // 2 AS dst FROM nodes WHERE k >= 2
  UNION ALL
  SELECT k AS src, k // 3 AS dst FROM nodes WHERE k >= 3 AND k // 3 <> k // 2
),
walk AS (
  SELECT k AS start, k AS cur, 0 AS steps FROM nodes
  UNION ALL
  SELECT w.start, e.dst, w.steps + 1
  FROM walk w JOIN edges e ON e.src = w.cur
),
fin AS (
  SELECT start AS node,
         CAST(max(steps) AS BIGINT) AS d_long,
         CAST(min(steps) AS BIGINT) AS d_short,
         CAST(count(*) AS BIGINT) AS n_paths
  FROM walk WHERE cur = 1 GROUP BY start
)
"""

DAG_PATH_STATS_SQL = (
    "WITH RECURSIVE " + _DAG_WALK_SQL + """
SELECT node, d_long, d_short, n_paths FROM fin
"""
)

DAG_DEPTH_HIST_SQL = (
    "WITH RECURSIVE " + _DAG_WALK_SQL + """
SELECT d_long, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(n_paths) AS BIGINT) AS sum_paths
FROM fin GROUP BY d_long
"""
)



def q_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental canonicalization: the nation chains arrive in two waves
    (history = chain edges between custkeys not divisible by 3; batch = the
    remaining edges, each incident to a "new" custkey), the history labeling
    is folded forward with incremental_components — CC runs only on the
    contracted delta graph, never the history edges — and the result must be
    bit-identical to batch CC over the full graph (the oracle's per-nation
    min). Exercises old-old merges through new bridge nodes, new-node
    labeling, and changed-representative relabeling in one fixture."""
    from .linking.canonicalize import connected_components, incremental_components

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    full = (
        cust.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("c_custkey").cast("long").alias("src"),
            F.col("nxt").cast("long").alias("dst"),
        )
    )
    hist = full.filter((F.col("src") % 3 != 0) & (F.col("dst") % 3 != 0))
    batch = full.filter((F.col("src") % 3 == 0) | (F.col("dst") % 3 == 0))
    old_nodes = (
        cust.filter(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_custkey").cast("long").alias("node"))
    )
    prior = connected_components(hist, all_nodes=old_nodes).localCheckpoint(
        eager=True
    )
    out = incremental_components(prior, batch)
    return out.select("node", F.col("component").alias("canonical"))


INCREMENTAL_CC_SQL = """
SELECT CAST(c_custkey AS BIGINT) AS node,
       CAST(min(c_custkey) OVER (PARTITION BY c_nationkey) AS BIGINT)
         AS canonical
FROM customer
"""



def q_incremental_cc_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MERGE INTO surface of incremental canonicalization: only the
    rows the daily append must upsert — prior nodes whose canonical moved
    when the batch bridged their chain segments, plus the new nodes. The
    oracle reconstructs the prior labeling with gaps-and-islands SQL (a
    history segment = a maximal run of consecutive non-%3 custkeys inside
    a nation chain; its label = the run's min) and diffs it against the
    full per-nation labeling."""
    from .linking.canonicalize import connected_components, incremental_components

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_custkey")
    full = (
        cust.withColumn("nxt", F.lead("c_custkey").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col("c_custkey").cast("long").alias("src"),
            F.col("nxt").cast("long").alias("dst"),
        )
    )
    hist = full.filter((F.col("src") % 3 != 0) & (F.col("dst") % 3 != 0))
    batch = full.filter((F.col("src") % 3 == 0) | (F.col("dst") % 3 == 0))
    old_nodes = (
        cust.filter(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_custkey").cast("long").alias("node"))
    )
    prior = connected_components(hist, all_nodes=old_nodes).localCheckpoint(
        eager=True
    )
    out = incremental_components(prior, batch, emit="delta")
    return out.select("node", F.col("component").alias("canonical"))


INCREMENTAL_CC_DELTA_SQL = """
WITH chain AS (
  SELECT CAST(c_custkey AS BIGINT) AS node, c_nationkey AS g,
         CAST(min(c_custkey) OVER (PARTITION BY c_nationkey) AS BIGINT)
           AS full_canon
  FROM customer
),
islands AS (
  -- history segments: runs of consecutive non-%3 nodes within the nation
  -- chain; the island id counts %3==0 markers seen so far in chain order
  SELECT node, g, full_canon,
         CAST(sum(CASE WHEN node % 3 = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY g ORDER BY node
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS isl
  FROM chain
),
prior AS (
  SELECT node, full_canon,
         CAST(min(node) OVER (PARTITION BY g, isl) AS BIGINT) AS prior_canon
  FROM islands WHERE node % 3 <> 0
)
SELECT node, full_canon AS canonical FROM prior
WHERE prior_canon <> full_canon
UNION ALL
SELECT node, full_canon AS canonical FROM chain WHERE node % 3 = 0
"""



def q_node2vec_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step node2vec biased walks over the (triangle-rich) nation trade
    graph: second-order p/q bias as integer weights (return 1, triangle 4,
    far 2), deterministic rejection sampling (3 attempts, fallback pinned
    to attempt 1). The oracle unrolls every step: candidate index-pick,
    triangle membership, acceptance test, and arg_min first-accept — the
    full sampler replayed bit-for-bit."""
    from .operators.graph_algos import node2vec_walks

    flows = _nation_flows(spark, sf_dir)
    edges = flows.select("src", "dst")
    starts = edges.select(F.col("src").alias("node")).distinct()
    return node2vec_walks(
        edges, n_steps=3, starts=starts, seed="n2v",
        w_return=1, w_common=4, w_far=2, attempts=3,
    )


def _n2v_step_sql(i: int, attempts: int = 3, w_max: int = 4,
                  w_ret: int = 1, w_com: int = 4, w_far: int = 2) -> str:
    """One unrolled second-order step: candidates, index-pick, membership,
    acceptance, first-accept arg_min (fallback = attempt 1)."""
    return f"""
s{i}c AS (
  SELECT f.walk_id, f.prev, f.cur, j.j,
         CAST(concat('0x', substr(md5(
           'n2v|' || f.walk_id || '|{i}|' || CAST(j.j AS VARCHAR)
            || '|' || f.prev || '|' || f.cur), 1, 8)) AS BIGINT) AS r,
         d.deg
  FROM s{i - 1} f
  JOIN dg d ON f.cur = d.src
  CROSS JOIN (SELECT unnest(range(1, {attempts + 1})) AS j) j
),
s{i}x AS (
  SELECT c.walk_id, c.prev, c.cur, c.j, x.dst AS x,
         (c.r // c.deg) % {w_max} AS u
  FROM s{i}c c JOIN idx x ON x.src = c.cur AND x.i = c.r % c.deg
),
s{i}w AS (
  SELECT s.walk_id, s.prev, s.cur, s.j, s.x, s.u,
         CASE WHEN s.x = s.prev THEN {w_ret}
              WHEN m.src IS NOT NULL THEN {w_com}
              ELSE {w_far} END AS wc
  FROM s{i}x s LEFT JOIN nb m ON m.src = s.prev AND m.dst = s.x
),
s{i} AS (
  SELECT walk_id, cur AS prev,
         arg_min(x, CASE WHEN u < wc THEN j ELSE {attempts} + j END) AS cur
  FROM s{i}w GROUP BY walk_id, cur
)"""


NODE2VEC_WALKS_SQL = f"""
WITH {FLOWS_FRAGMENT.strip()},
nb AS (SELECT DISTINCT src, dst FROM flows),
idx AS (
  SELECT src, dst,
         row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS i
  FROM nb
),
dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM nb GROUP BY src),
s0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM nb),
s1 AS (
  SELECT f.walk_id, f.cur AS prev, x.dst AS cur
  FROM s0 f JOIN dg d ON f.cur = d.src
  JOIN idx x ON x.src = f.cur
   AND x.i = CAST(concat('0x', substr(md5(
         'n2v|' || f.walk_id || '|1|' || f.cur), 1, 8)) AS BIGINT) % d.deg
),{_n2v_step_sql(2)},{_n2v_step_sql(3)}
SELECT walk_id, CAST(0 AS INT) AS step, cur AS node FROM s0
UNION ALL SELECT walk_id, CAST(1 AS INT) AS step, cur AS node FROM s1
UNION ALL SELECT walk_id, CAST(2 AS INT) AS step, cur AS node FROM s2
UNION ALL SELECT walk_id, CAST(3 AS INT) AS step, cur AS node FROM s3
"""



def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO/RLHF preference pairs over the transcript view: best-vs-worst
    assistant turn per conversation under the deterministic length proxy,
    pinned ties both directions, margin emitted. The oracle replays both
    rank windows and the >=2-turn admission."""
    from .operators.dialogue import preference_pairs

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



def q_bigram_nll_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style quality filter: per-document NLL under an add-1 bigram
    LM trained on the English subset, -log2 p per bigram quantized with
    the exact-integer msb16 device (no float log; constant +320 offset
    from the 2^20 fraction scale, identical in both engines). The score a
    CCNet-shaped pipeline buckets documents by."""
    from .operators.text import bigram_nll

    docs = _t(spark, sf_dir, "documents")
    return bigram_nll(docs, F.col("lang") == "en")


BIGRAM_NLL_SQL = """
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS is_t,
         list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           x -> x <> '') AS t
  FROM documents
),
pairs AS (
  SELECT doc_id, is_t, (u).a AS a, (u).b AS b
  FROM (
    SELECT doc_id, is_t,
           unnest(list_transform(range(1, len(t)),
             i -> struct_pack(a := t[i], b := t[i + 1]))) AS u
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c2 FROM pairs
       WHERE is_t GROUP BY a, b),
c1 AS (SELECT a, CAST(count(*) AS BIGINT) AS c1 FROM pairs
       WHERE is_t GROUP BY a),
vt AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM (
    SELECT a AS tok FROM pairs WHERE is_t
    UNION ALL SELECT b AS tok FROM pairs WHERE is_t
  )
),
sc AS (
  SELECT p.doc_id,
         {m16} AS s
  FROM pairs p
  LEFT JOIN c2 ON p.a = c2.a AND p.b = c2.b
  LEFT JOIN c1 ON p.a = c1.a
  CROSS JOIN vt
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(s) AS BIGINT) AS nll_s16,
       CAST(CAST(sum(s) AS BIGINT) * 1000 // count(*) AS BIGINT)
         AS avg_nll_permille
FROM sc GROUP BY doc_id
""".format(
    m16=_duck_msb16(
        "(coalesce(c1.c1, CAST(0 AS BIGINT)) + vt.v)"
        " * CAST(1048576 AS BIGINT)"
        " // (coalesce(c2.c2, CAST(0 AS BIGINT)) + 1)"
    )
)



def q_pagerank_warm_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-start PageRank for the incremental-append regime: a 2-iteration
    prior is computed on the history subgraph (edges whose underlying keys
    are not divisible by 3), then ONE resumed iteration runs on the full
    graph initialized from the prior (new nodes start cold at 1.0). The
    oracle unrolls all three rounds — two on history, one resumed on the
    full edge set with the coalesced init."""
    from .operators.graph_algos import pagerank

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")

    def _edges(o, c):
        e1 = o.select(
            F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        e2 = c.select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
            F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
        )
        return e1.unionByName(e2)

    full = _edges(orders, cust)
    hist = _edges(
        orders.filter(
            (F.col("o_orderkey") % 3 != 0) & (F.col("o_custkey") % 3 != 0)
        ),
        cust.filter(
            (F.col("c_custkey") % 3 != 0) & (F.col("c_nationkey") % 3 != 0)
        ),
    )
    prior = pagerank(hist, damping=0.85, iterations=2).localCheckpoint(
        eager=True
    )
    out = pagerank(full, damping=0.85, iterations=1, init_ranks=prior)
    return out.select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5)).cast("long").alias(
            "rank_x1e6"
        ),
    )


PAGERANK_WARM_SQL = """
WITH ef AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer
),
eh AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders WHERE o_orderkey % 3 <> 0 AND o_custkey % 3 <> 0
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer WHERE c_custkey % 3 <> 0 AND c_nationkey % 3 <> 0
),
nh AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM eh UNION ALL SELECT dst FROM eh)
),
nf AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM ef UNION ALL SELECT dst FROM ef)
),
oh AS (SELECT src, count(*) AS d FROM eh GROUP BY src),
odf AS (SELECT src, count(*) AS d FROM ef GROUP BY src),
h0 AS (SELECT node, CAST(1 AS DOUBLE) AS r FROM nh),
h1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nh n LEFT JOIN (
    SELECT e.dst AS node, sum(h0.r / o.d) AS m
    FROM eh e JOIN h0 ON h0.node = e.src JOIN oh o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
h2 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nh n LEFT JOIN (
    SELECT e.dst AS node, sum(h1.r / o.d) AS m
    FROM eh e JOIN h1 ON h1.node = e.src JOIN oh o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
init AS (
  SELECT n.node, coalesce(h2.r, CAST(1 AS DOUBLE)) AS r
  FROM nf n LEFT JOIN h2 ON h2.node = n.node
),
w1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nf n LEFT JOIN (
    SELECT e.dst AS node, sum(i.r / o.d) AS m
    FROM ef e JOIN init i ON i.node = e.src JOIN odf o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
)
SELECT node, CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS rank_x1e6 FROM w1
"""



def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom semi-join reduction — the classic distributed-join pre-filter:
    the selective dimension (orders with o_totalprice > 490000, ~2%) sets a
    broadcast Bloom filter; the fact table (lineitem) is pre-filtered to
    maybe=1 rows BEFORE the exact join, so the shuffle carries only
    candidates (true matches + the filter's bounded false positives)
    instead of the whole fact table. The final exact semi-join removes the
    false positives, so the RESULT is provably independent of the Bloom
    layer — which is precisely what the oracle checks by running the plain
    semi-join with no bloom at all. Sums are integer cents, scaled per row
    before summing."""
    from .operators.sketches import bloom_build, bloom_maybe_contains

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dim = orders.filter(F.col("o_totalprice") > 490000).select(
        F.col("o_orderkey").cast("long").alias("okey")
    )
    bloom = bloom_build(dim, "okey", m_bits=8192, k_hashes=3)
    cand_keys = bloom_maybe_contains(
        bloom,
        li.select(F.col("l_orderkey").cast("long").alias("okey")).distinct(),
        "okey",
        m_bits=8192,
        k_hashes=3,
    ).filter(F.col("maybe") == 1)
    cand = li.join(
        F.broadcast(cand_keys.select(F.col("okey").alias("l_orderkey"))),
        "l_orderkey",
    )
    exact = cand.join(
        F.broadcast(dim.select(F.col("okey").alias("l_orderkey"))),
        "l_orderkey",
    )
    return exact.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(
            F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
        ).cast("long").alias("qty_cents"),
    )


BLOOM_SEMIJOIN_SQL = """
SELECT CAST(l.l_orderkey AS BIGINT) AS okey,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS qty_cents
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_totalprice > 490000
GROUP BY l.l_orderkey
"""



def q_graph_coarsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One METIS-style coarsening level over the trade graph: contract the
    locally-dominant matching's pairs (strongest lanes pair first), remap
    endpoints, drop intra-pair loops, merge parallel edges with exact
    weight sums. The oracle replays the full 13-round matching and the
    contraction algebra."""
    from .operators.graph_algos import coarsen_graph, greedy_matching

    e = _trade_edges(spark, sf_dir)
    inv = e.select("u", "v", (F.lit(2_000_000_000) - F.col("w")).alias("w"))
    m = greedy_matching(inv, max_rounds=13).select("u", "v")
    return coarsen_graph(e, m)


GRAPH_COARSEN_SQL = f"""
WITH {TRADE_EDGES_FRAGMENT}{_matching_rounds_sql(13)},
mp AS (
  SELECT u AS node, least(u, v) AS s FROM m13
  UNION ALL
  SELECT v AS node, least(u, v) AS s FROM m13
),
re AS (
  SELECT coalesce(mu.s, e.u) AS su, coalesce(mv.s, e.v) AS sv, e.w
  FROM ed e
  LEFT JOIN mp mu ON mu.node = e.u
  LEFT JOIN mp mv ON mv.node = e.v
)
SELECT least(su, sv) AS cu, greatest(su, sv) AS cv,
       CAST(sum(w) AS BIGINT) AS w_sum,
       CAST(count(*) AS BIGINT) AS n_merged
FROM re WHERE su <> sv GROUP BY 1, 2
"""



def q_multilevel_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multilevel partitioning loop end-to-end (METIS shape): contract
    the locally-dominant matching of the trade graph, run 2-round
    deterministic label propagation on the COARSE graph (nationkey ids —
    LP's numeric tie-break), then project the coarse labels back through
    the matching to every original node. Matched pairs inherit one label
    by construction — the invariant multilevel partitioning exists for.
    The oracle replays matching, contraction, both LP rounds, and the
    projection."""
    from .operators.graph_algos import (
        coarsen_graph,
        greedy_matching,
        label_propagation,
    )

    ed = _trade_edges(spark, sf_dir)
    nk = _t(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"),
        F.col("n_nationkey").cast("long").alias("k"),
    ).localCheckpoint(eager=True)
    inv = ed.select("u", "v", (F.lit(2_000_000_000) - F.col("w")).alias("w"))
    m = greedy_matching(inv, max_rounds=13).select("u", "v")
    coarse = coarsen_graph(ed, m)
    cek = (
        coarse.join(
            F.broadcast(nk.select(F.col("name").alias("cu"), F.col("k").alias("src"))),
            "cu",
        )
        .join(
            F.broadcast(nk.select(F.col("name").alias("cv"), F.col("k").alias("dst"))),
            "cv",
        )
        .select("src", "dst")
    )
    lp = label_propagation(cek, iterations=2)
    mp = (
        m.select(F.col("u").alias("node"), F.least("u", "v").alias("s"))
        .unionByName(
            m.select(F.col("v").alias("node"), F.least("u", "v").alias("s"))
        )
    )
    nodes = (
        ed.select(F.col("u").alias("node"))
        .unionByName(ed.select(F.col("v").alias("node")))
        .distinct()
    )
    assigned = (
        nodes.join(F.broadcast(mp), "node", "left")
        .select("node", F.coalesce("s", F.col("node")).alias("super"))
        .join(
            F.broadcast(nk.select(F.col("name").alias("super"), F.col("k").alias("sk"))),
            "super",
        )
        .join(
            F.broadcast(lp.select(F.col("node").alias("sk"), F.col("label").alias("lbl"))),
            "sk",
            "left",
        )
        .select(
            "node", F.coalesce("lbl", F.col("sk")).cast("long").alias("part")
        )
    )
    return assigned


MULTILEVEL_PARTITION_SQL = f"""
WITH {TRADE_EDGES_FRAGMENT}{_matching_rounds_sql(13)},
mp AS (
  SELECT u AS node, least(u, v) AS s FROM m13
  UNION ALL
  SELECT v AS node, least(u, v) AS s FROM m13
),
re AS (
  SELECT coalesce(mu.s, e.u) AS su, coalesce(mv.s, e.v) AS sv
  FROM ed e
  LEFT JOIN mp mu ON mu.node = e.u
  LEFT JOIN mp mv ON mv.node = e.v
),
ce AS (
  SELECT DISTINCT least(su, sv) AS cu, greatest(su, sv) AS cv
  FROM re WHERE su <> sv
),
nk AS (SELECT n_name AS name, CAST(n_nationkey AS BIGINT) AS k FROM nation),
cek AS (
  SELECT a.k AS src, b.k AS dst
  FROM ce JOIN nk a ON ce.cu = a.name JOIN nk b ON ce.cv = b.name
),
sym AS (SELECT src, dst FROM cek UNION ALL SELECT dst AS src, src AS dst FROM cek),
cn AS (SELECT DISTINCT src AS node FROM sym),
l0 AS (SELECT node, node AS label FROM cn),
v1 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l0 l ON s.src = l.node GROUP BY 1, 2
),
p1 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v1) WHERE rn = 1
),
l1 AS (
  SELECT n.node, coalesce(p.label, n.node) AS label
  FROM cn n LEFT JOIN p1 p USING (node)
),
v2 AS (
  SELECT s.dst AS node, l.label, count(*) AS c
  FROM sym s JOIN l1 l ON s.src = l.node GROUP BY 1, 2
),
p2 AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, label ASC)
             AS rn
    FROM v2) WHERE rn = 1
),
lp AS (
  SELECT n.node, coalesce(p.label, n.node) AS label
  FROM cn n LEFT JOIN p2 p USING (node)
),
orig AS (
  SELECT DISTINCT node FROM (
    SELECT u AS node FROM ed UNION ALL SELECT v AS node FROM ed
  )
)
SELECT o.node,
       CAST(coalesce(lp.label, snk.k) AS BIGINT) AS part
FROM orig o
LEFT JOIN mp ON mp.node = o.node
JOIN nk snk ON snk.name = coalesce(mp.s, o.node)
LEFT JOIN lp ON lp.node = snk.k
"""



def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic calibration (PAVA) per event_type over a thinned
    deterministic fixture (event_id % 8 == 0; label = (event_id DIV 8 +
    score_cents) % 2): every row gets its block mean as an exact rational.
    The oracle carries the PAVA block stack as two LISTs in a recursive
    CTE; each insertion's merge cascade is replayed as a one-shot
    maximal-violating-suffix collapse (cross-multiplied means, no float),
    then rows are mapped to blocks by prefix-sum boundaries."""
    from .operators.classifier import isotonic_calibrate

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") % 8 == 0)
    fx = ev.select(
        F.col("event_type").alias("grp"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("score"),
        F.col("event_id").cast("long").alias("event_id"),
    ).withColumn(
        "label", ((F.expr("event_id DIV 8") + F.col("score")) % 2).cast("long")
    )
    return isotonic_calibrate(fx)


ISOTONIC_SQL = """
WITH RECURSIVE pts AS (
  SELECT event_type AS grp,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT),
                                     event_id) AS i,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS score,
         (event_id // 8 + CAST(floor(value * 100 + 0.5) AS BIGINT)) % 2
           AS label
  FROM events WHERE event_id % 8 = 0
),
nper AS (SELECT grp, max(i) AS n FROM pts GROUP BY 1),
pav(grp, i, ss, nn) AS (
  SELECT grp, CAST(0 AS BIGINT), CAST([] AS BIGINT[]), CAST([] AS BIGINT[])
  FROM nper
  UNION ALL
  SELECT p.grp, p.i + 1,
         list_slice(p.ss, 1, len(p.ss) - (CASE WHEN len(p.ss) = 0 THEN 0 ELSE coalesce(nullif(list_position(list_reverse(list_transform(range(1, len(p.ss) + 1), k -> p.ss[k] * (CAST(1 AS BIGINT) + coalesce(list_sum(list_slice(p.nn, k + 1, len(p.nn))), 0)) >= (CAST(r.label AS BIGINT) + coalesce(list_sum(list_slice(p.ss, k + 1, len(p.ss))), 0)) * p.nn[k])), false), 0) - 1, len(p.ss)) END)) ||
           [CAST(r.label AS BIGINT) + coalesce(list_sum(
              list_slice(p.ss, len(p.ss) - (CASE WHEN len(p.ss) = 0 THEN 0 ELSE coalesce(nullif(list_position(list_reverse(list_transform(range(1, len(p.ss) + 1), k -> p.ss[k] * (CAST(1 AS BIGINT) + coalesce(list_sum(list_slice(p.nn, k + 1, len(p.nn))), 0)) >= (CAST(r.label AS BIGINT) + coalesce(list_sum(list_slice(p.ss, k + 1, len(p.ss))), 0)) * p.nn[k])), false), 0) - 1, len(p.ss)) END) + 1, len(p.ss))), 0)],
         list_slice(p.nn, 1, len(p.nn) - (CASE WHEN len(p.ss) = 0 THEN 0 ELSE coalesce(nullif(list_position(list_reverse(list_transform(range(1, len(p.ss) + 1), k -> p.ss[k] * (CAST(1 AS BIGINT) + coalesce(list_sum(list_slice(p.nn, k + 1, len(p.nn))), 0)) >= (CAST(r.label AS BIGINT) + coalesce(list_sum(list_slice(p.ss, k + 1, len(p.ss))), 0)) * p.nn[k])), false), 0) - 1, len(p.ss)) END)) ||
           [CAST(1 AS BIGINT) + coalesce(list_sum(
              list_slice(p.nn, len(p.nn) - (CASE WHEN len(p.ss) = 0 THEN 0 ELSE coalesce(nullif(list_position(list_reverse(list_transform(range(1, len(p.ss) + 1), k -> p.ss[k] * (CAST(1 AS BIGINT) + coalesce(list_sum(list_slice(p.nn, k + 1, len(p.nn))), 0)) >= (CAST(r.label AS BIGINT) + coalesce(list_sum(list_slice(p.ss, k + 1, len(p.ss))), 0)) * p.nn[k])), false), 0) - 1, len(p.ss)) END) + 1, len(p.nn))), 0)]
  FROM pav p JOIN pts r ON r.grp = p.grp AND r.i = p.i + 1
),
fin AS (
  SELECT p.grp, p.ss, p.nn
  FROM pav p JOIN nper n ON n.grp = p.grp AND p.i = n.n
),
blocks AS (
  SELECT grp, (x).b AS b, (x).s AS s, (x).n AS n
  FROM (
    SELECT grp, unnest(list_transform(range(1, len(ss) + 1),
             j -> struct_pack(b := j, s := ss[j], n := nn[j]))) AS x
    FROM fin)
),
bounds AS (
  SELECT grp, s, n,
         sum(n) OVER (PARTITION BY grp ORDER BY b) - n + 1 AS lo,
         sum(n) OVER (PARTITION BY grp ORDER BY b) AS hi
  FROM blocks
)
SELECT r.grp, CAST(r.i AS BIGINT) AS i, r.score, CAST(r.label AS BIGINT)
         AS label,
       CAST(bo.s * 1000000 // bo.n AS BIGINT) AS cal_x1e6
FROM pts r JOIN bounds bo
  ON bo.grp = r.grp AND r.i BETWEEN bo.lo AND bo.hi
"""



def q_incremental_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-append near-dup candidates: new docs (doc_id % 5 == 0) probe
    the stored LSH bucket index; old-old pairs are never enumerated. Must
    equal the FULL banded-LSH candidate set restricted to pairs touching a
    new doc — which is exactly what the oracle computes."""
    from .operators.dedup import incremental_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return incremental_lsh_pairs(
        docs, F.col("doc_id") % 5 == 0,
        num_hashes=8, bands=2, shingle_n=1,
    )


INCREMENTAL_LSH_SQL = (
    "WITH pairs AS (" + MINHASH_LSH_SQL + ")\n"
    "SELECT id_a, id_b FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0"
)


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations over the documents corpus with a planted
    phrase: every doc_id % 7 == 0 document gets ' qq zz' appended, so the
    (qq, zz) bigram — whose slot marginals contain nothing else — reads
    the maximal PMI ~ log2(n2 / c2) while organic word-soup pairs
    calibrate the noise floor near 0. min_count=5 prunes the hapax tail
    before any marginal join (the corpus is word soup: without the
    threshold the top-k would be all count-1 accidents)."""
    from .operators.text import pmi_collocations

    docs = _t(spark, sf_dir, "documents").select(
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" qq zz"))
        )
        .otherwise(F.col("text"))
        .alias("text")
    )
    return pmi_collocations(docs, min_count=5, k=20)


PMI_COLLOCATIONS_SQL = """
WITH docs AS (
  SELECT CASE WHEN doc_id % 7 = 0 THEN text || ' qq zz' ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM docs
),
pairs AS (
  SELECT (u).a AS a, (u).b AS b
  FROM (
    SELECT unnest(list_transform(range(1, len(t)),
             i -> struct_pack(a := t[i], b := t[i + 1]))) AS u
    FROM toks WHERE len(t) >= 2
  )
),
c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c2 FROM pairs GROUP BY a, b),
ca AS (SELECT a, CAST(sum(c2) AS BIGINT) AS ca FROM c2 GROUP BY a),
cb AS (SELECT b, CAST(sum(c2) AS BIGINT) AS cb FROM c2 GROUP BY b),
n2 AS (SELECT CAST(sum(c2) AS BIGINT) AS n2 FROM c2),
sc AS (
  SELECT c2.a, c2.b, c2.c2, ca.ca, cb.cb,
         CAST({m16} - 320 AS BIGINT) AS pmi_s16
  FROM c2 JOIN ca ON c2.a = ca.a JOIN cb ON c2.b = cb.b CROSS JOIN n2
  WHERE c2.c2 >= 5
)
SELECT a, b, c2, ca, cb, pmi_s16,
       CAST(row_number() OVER (
         ORDER BY pmi_s16 DESC, c2 DESC, a ASC, b ASC) AS BIGINT) AS rnk
FROM sc
QUALIFY rnk <= 20
""".format(
    m16=_duck_msb16(
        "(c2.c2 * CAST(1048576 AS BIGINT) // ca.ca) * n2.n2 // cb.cb"
    )
)



def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and UTC hour with planted
    dependence: night-time (hour < 6) error events are tripled, coupling
    the type marginal to the hour marginal — MI reads clearly positive
    where the untouched corpus would calibrate near 0. Hour is the
    engine-neutral epoch % 86400 DIV 3600 (the seasonal_profile
    convention), never the builtins."""
    from .operators.text import mutual_information

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(CAST(unix_timestamp(ts) AS BIGINT) % 86400"
            " DIV 3600 AS BIGINT)"
        ).alias("hour"),
    )
    hub = ev.filter((F.col("event_type") == "error") & (F.col("hour") < 6))
    return mutual_information(
        ev.unionAll(hub).unionAll(hub), row_col="event_type", col_col="hour"
    )


MUTUAL_INFORMATION_SQL = """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hour
  FROM events
),
ev AS (
  SELECT * FROM base
  UNION ALL SELECT * FROM base WHERE event_type = 'error' AND hour < 6
  UNION ALL SELECT * FROM base WHERE event_type = 'error' AND hour < 6
),
cells AS (
  SELECT event_type AS r, hour AS c, CAST(count(*) AS BIGINT) AS o
  FROM ev GROUP BY 1, 2
),
rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY r),
cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS ct FROM cells GROUP BY c),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
agg AS (
  SELECT max(nn.n) AS n,
         CAST(count(DISTINCT cells.r) AS BIGINT) AS n_row_cats,
         CAST(count(DISTINCT cells.c) AS BIGINT) AS n_col_cats,
         CAST(sum(o * ({m16} - 320)) AS BIGINT) AS mi_x16n
  FROM cells JOIN rm USING (r) JOIN cm USING (c) CROSS JOIN nn
)
SELECT n, n_row_cats, n_col_cats, mi_x16n,
       CASE WHEN mi_x16n >= 0
            THEN mi_x16n * CAST(62500 AS BIGINT) // n
            ELSE -((-mi_x16n) * CAST(62500 AS BIGINT) // n) END
         AS mi_bits_x1e6
FROM agg
""".format(
    m16=_duck_msb16("(o * CAST(1048576 AS BIGINT) // rt) * nn.n // ct")
)



def q_changepoint_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM maximum-deviation changepoint per event type with a planted
    level shift: 'click' values gain +500.00 from 2024-01-15 on, so the
    click key's gmax spikes at the boundary while untouched types
    calibrate the no-shift null. The split is found on exact integer
    cents — no per-key float mean ever exists."""
    from .operators.temporal import changepoint_scan

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        (
            F.col("value")
            + F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.lit("2024-01-15").cast("timestamp")),
                500.0,
            ).otherwise(0.0)
        ).alias("value"),
    )
    return changepoint_scan(ev)


CHANGEPOINT_SCAN_SQL = """
WITH ev AS (
  SELECT event_type AS key, event_id, ts,
         CAST(floor((value + CASE WHEN event_type = 'click'
                                   AND ts >= TIMESTAMP '2024-01-15'
                              THEN 500.0 ELSE 0.0 END) * 100 + 0.5)
              AS BIGINT) AS v
  FROM events
),
pref AS (
  SELECT key, event_id AS split_id,
         CAST(row_number() OVER w AS BIGINT) AS split_i,
         CAST(sum(v) OVER w AS BIGINT) AS si,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n,
         CAST(sum(v) OVER (PARTITION BY key) AS BIGINT) AS sn
  FROM ev
  WINDOW w AS (PARTITION BY key ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
stat AS (
  SELECT key, n, split_i, split_id,
         CAST(abs(n * si - split_i * sn) AS BIGINT) AS gmax
  FROM pref WHERE split_i < n
)
SELECT key, n, split_i, split_id, gmax
FROM stat
QUALIFY row_number() OVER (
  PARTITION BY key ORDER BY gmax DESC, split_i ASC) = 1
"""



def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keywords over the documents corpus with a planted collocation:
    doc_id % 11 == 0 documents gain ' the deep learning the' — the
    stopword fence isolates (deep, learning) as a clean 2-word candidate
    whose exclusive words score degree/freq = 2 each. Word-soup runs are
    capped at max_len=3 and thresholded at n_occ >= 3, so the readout is
    the recurring-phrase vocabulary, not count-1 accidents."""
    from .operators.text import rake_keywords

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.col("text"), F.lit(" the deep learning the")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return rake_keywords(docs, max_len=3, min_count=3, k=25)


RAKE_KEYWORDS_SQL = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' the deep learning the'
              ELSE text END AS text
  FROM documents
),
toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM docs
),
pos AS (
  SELECT doc_id, (u).p AS p, (u).w AS w,
         list_contains(['the','a','an','of','and','or','to','in','on',
                        'for','is','are','was','at','by','with','as','it',
                        'this','that'], (u).w) AS stop
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
             i -> struct_pack(p := i, w := t[i]))) AS u
    FROM toks
  )
),
runs AS (
  SELECT doc_id, p, w,
         sum(CASE WHEN stop THEN 1 ELSE 0 END) OVER (
           PARTITION BY doc_id ORDER BY p
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
         stop
  FROM pos
),
phrases AS (
  SELECT doc_id, run,
         string_agg(w, ' ' ORDER BY p) AS phrase,
         CAST(count(*) AS BIGINT) AS len
  FROM runs WHERE NOT stop
  GROUP BY doc_id, run
  HAVING count(*) <= 3
),
words AS (
  SELECT len, unnest(string_split(phrase, ' ')) AS w FROM phrases
),
ws AS (
  SELECT w,
         CAST(sum(len) AS BIGINT) * CAST(1000000 AS BIGINT)
           // CAST(count(*) AS BIGINT) AS wsc
  FROM words GROUP BY w
),
dphrase AS (
  SELECT phrase, CAST(max(len) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_occ
  FROM phrases GROUP BY phrase
  HAVING count(*) >= 3
),
scored AS (
  SELECT d.phrase, d.n_words, d.n_occ,
         CAST(sum(ws.wsc) AS BIGINT) AS score_x1e6
  FROM (SELECT phrase, n_words, n_occ,
               unnest(string_split(phrase, ' ')) AS w
        FROM dphrase) d
  JOIN ws USING (w)
  GROUP BY d.phrase, d.n_words, d.n_occ
)
SELECT phrase, n_words, n_occ, score_x1e6,
       CAST(row_number() OVER (
         ORDER BY score_x1e6 DESC, n_occ DESC, phrase ASC) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 25
"""



def q_newman_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the REGION partition over the nation trade
    graph — scores a metadata labeling against the graph's actual cut
    structure with the exact-integer Q = Σ(4m·e_c − d_c²)/(4m²)
    evaluator. The trade graph is near-complete at this scale, so the
    5-way region partition reads Q ≈ −(1/5 − small): a faithful
    "this labeling does not match the topology" readout the
    label-propagation composition is compared against in tests."""
    from .operators.graph_algos import modularity_score

    e = _trade_edges(spark, sf_dir)
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    lab = n.join(
        F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
    ).select(F.col("n_name").alias("node"), F.col("r_name").alias("label"))
    return modularity_score(e, lab, src="u", dst="v")


NEWMAN_MODULARITY_SQL = f"""
WITH {TRADE_EDGES_FRAGMENT},
ue AS (
  SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v FROM ed WHERE u <> v
),
lab AS (
  SELECT n_name AS node, r_name AS label
  FROM nation JOIN region ON n_regionkey = r_regionkey
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM ue UNION ALL SELECT v AS n FROM ue
  ) GROUP BY n
),
dc AS (
  SELECT coalesce(lab.label, '__unlabeled__') AS l,
         CAST(sum(deg.d) AS BIGINT) AS dc
  FROM deg LEFT JOIN lab ON deg.n = lab.node
  GROUP BY 1
),
ec AS (
  SELECT coalesce(lu.label, '__unlabeled__') AS l,
         CAST(count(*) AS BIGINT) AS ec
  FROM ue
  LEFT JOIN lab lu ON ue.u = lu.node
  LEFT JOIN lab lv ON ue.v = lv.node
  WHERE coalesce(lu.label, '__unlabeled__')
          = coalesce(lv.label, '__unlabeled__')
  GROUP BY 1
),
m1 AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ue),
per AS (
  SELECT m1.m,
         4 * m1.m * coalesce(ec.ec, 0) - dc.dc * dc.dc AS num,
         coalesce(ec.ec, 0) AS ec
  FROM dc LEFT JOIN ec ON dc.l = ec.l CROSS JOIN m1
),
agg AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n_comms,
         CAST(sum(ec) AS BIGINT) AS intra_edges,
         CAST(sum(num) AS BIGINT) AS num
  FROM per GROUP BY m
)
SELECT m, n_comms, intra_edges, num,
       CAST(num // (4 * m * m) * CAST(1000000 AS BIGINT)
            + num % (4 * m * m) * CAST(1000000 AS BIGINT)
              // (4 * m * m) AS BIGINT) AS q_x1e6
FROM agg
"""



def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty in ingestion (doc_id) order: the
    corpus's exact-duplicate docs read 0 (every shingle first occurred
    in the earlier twin), template re-serves read low, fresh word-soup
    reads high — the self-referential redundancy screen beside dedup."""
    from .operators.text import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), n=3)


NGRAM_NOVELTY_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(u, ' ') AS s
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
             i -> t[i:i+2])) AS u
    FROM toks WHERE len(t) >= 3
  )
),
own AS (SELECT s, min(doc_id) AS own FROM sh GROUP BY s)
SELECT sh.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN own.own = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN own.own = sh.doc_id THEN 1 ELSE 0 END)
            * CAST(1000000 AS BIGINT) // count(*) AS BIGINT)
         AS novelty_x1e6
FROM sh JOIN own USING (s)
GROUP BY sh.doc_id
"""



def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the divide-lattice DAG viewed as an
    undirected graph — a tree-like hub-and-spoke topology (every k feeds
    k DIV 2 / k DIV 3, so low ids are hubs fed by leaves) that reads
    clearly NEGATIVE: the disassortativity monitor a KG runs on its
    alias graph to detect hub growth before the skewed joins hurt."""
    from .operators.graph_algos import assortativity_coefficient

    return assortativity_coefficient(_divide_dag_edges(spark, sf_dir))


DEGREE_ASSORTATIVITY_SQL = """
WITH nodes AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey >= 1
),
edges AS (
  SELECT k AS src, k // 2 AS dst FROM nodes WHERE k >= 2
  UNION ALL
  SELECT k AS src, k // 3 AS dst FROM nodes WHERE k >= 3 AND k // 3 <> k // 2
),
ue AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM edges WHERE src <> dst
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT u AS n FROM ue UNION ALL SELECT v AS n FROM ue
  ) GROUP BY n
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
sym AS (SELECT u, v FROM ue UNION ALL SELECT v, u FROM ue),
rolled AS (
  SELECT CAST(count(*) // 2 AS BIGINT) AS m,
         CAST(count(*) AS BIGINT) AS mm,
         CAST(sum(du.d) AS BIGINT) AS s,
         CAST(sum(du.d * dv.d) AS BIGINT) AS sxy,
         CAST(sum(du.d * du.d) AS BIGINT) AS sxx
  FROM sym JOIN deg du ON sym.u = du.n JOIN deg dv ON sym.v = dv.n
),
fin AS (
  SELECT m, nn.n_nodes,
         CAST(mm * sxy - s * s AS BIGINT) AS num,
         CAST(mm * sxx - s * s AS BIGINT) AS den
  FROM rolled CROSS JOIN nn
)
SELECT m, n_nodes, num, den,
       CASE WHEN den = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                 * (abs(num) // den * CAST(1000000 AS BIGINT)
                    + abs(num) % den * CAST(1000000 AS BIGINT) // den)
                 AS BIGINT) END AS r_x1e6
FROM fin
"""



def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness per event type over hourly buckets with a
    planted burst: error timestamps are floored to 8-hour boundaries, so
    every error bucket carries ~8 hours of mass and 7 of 8 are empty —
    IoD reads >> 1 while organic near-uniform types calibrate ~1."""
    from .operators.temporal import fano_burstiness

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.when(
            F.col("event_type") == "error",
            F.expr(
                "timestamp_seconds(CAST(unix_timestamp(ts) AS BIGINT)"
                " DIV 28800 * 28800)"
            ),
        )
        .otherwise(F.col("ts"))
        .alias("ts"),
    )
    return fano_burstiness(ev, bucket_seconds=3600)


FANO_BURSTINESS_SQL = """
WITH ev AS (
  SELECT event_type AS key,
         CASE WHEN event_type = 'error'
              THEN CAST(floor(epoch(ts)) AS BIGINT) // 28800 * 28800
              ELSE CAST(floor(epoch(ts)) AS BIGINT) END // 3600 AS b
  FROM events
),
counts AS (
  SELECT key, b, CAST(count(*) AS BIGINT) AS c FROM ev GROUP BY key, b
),
rolled AS (
  SELECT key,
         CAST(max(b) - min(b) + 1 AS BIGINT) AS n_buckets_span,
         CAST(count(*) AS BIGINT) AS n_active_buckets,
         CAST(sum(c) AS BIGINT) AS n_events,
         CAST(sum(c * c) AS BIGINT) AS sum_sq
  FROM counts GROUP BY key
)
SELECT key, n_buckets_span, n_active_buckets, n_events, sum_sq,
       CAST((n_buckets_span * sum_sq - n_events * n_events)
              // (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)
            + (n_buckets_span * sum_sq - n_events * n_events)
              % (n_buckets_span * n_events) * CAST(1000000 AS BIGINT)
              // (n_buckets_span * n_events) AS BIGINT) AS iod_x1e6
FROM rolled
"""



def q_soundex_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable simplified-Soundex key per part (first p_name token) —
    the phonetic ER blocker rebuilt from codepoint arithmetic in BOTH
    engines (no builtin on either side), so the gate certifies the
    collapse/zero-drop/pad pipeline bit-for-bit on real word data."""
    from .linking.blocking import soundex_key

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", F.split(F.col("p_name"), " ")[0].alias("tok")
    )
    return soundex_key(p, col="tok", id_col="p_partkey")


SOUNDEX_PORTABLE_SQL = """
WITH toks AS (
  SELECT p_partkey, string_split(p_name, ' ')[1] AS tok FROM part
),
cs AS (
  SELECT p_partkey, tok,
         list_filter(string_split(upper(tok), ''),
                     ch -> ascii(ch) >= 65 AND ascii(ch) <= 90) AS ltr
  FROM toks
),
chars AS (
  SELECT p_partkey, (u).p AS p, (u).c AS c
  FROM (
    SELECT p_partkey,
           unnest(list_transform(range(1, len(ltr) + 1),
             i -> struct_pack(p := i, c := ltr[i]))) AS u
    FROM cs
  )
),
coded AS (
  SELECT p_partkey, p, c,
         CASE WHEN ascii(c) IN (66,70,80,86) THEN 1
              WHEN ascii(c) IN (67,71,74,75,81,83,88,90) THEN 2
              WHEN ascii(c) IN (68,84) THEN 3
              WHEN ascii(c) = 76 THEN 4
              WHEN ascii(c) IN (77,78) THEN 5
              WHEN ascii(c) = 82 THEN 6
              ELSE 0 END AS code
  FROM chars
),
runs AS (
  SELECT p_partkey, p, c, code,
         lag(code) OVER (PARTITION BY p_partkey ORDER BY p) AS prev
  FROM coded
),
collapsed AS (
  SELECT p_partkey, p, c, code,
         row_number() OVER (PARTITION BY p_partkey ORDER BY p) AS r
  FROM runs WHERE prev IS NULL OR code <> prev
),
fl AS (SELECT p_partkey, c AS lead FROM collapsed WHERE r = 1),
ds AS (
  SELECT p_partkey, string_agg(CAST(code AS VARCHAR), '' ORDER BY p) AS d
  FROM collapsed WHERE r > 1 AND code <> 0 GROUP BY p_partkey
)
SELECT t.p_partkey, t.tok,
       CASE WHEN fl.lead IS NULL THEN NULL
            ELSE fl.lead || substr(coalesce(ds.d, '') || '000', 1, 3) END
         AS sdx
FROM toks t
LEFT JOIN fl USING (p_partkey)
LEFT JOIN ds USING (p_partkey)
"""


# ---------------------------------------------------------------------------
# Q: Fellegi-Sunter probabilistic record linkage (weights + pair scoring)
# over customer vs a deterministically perturbed twin
# ---------------------------------------------------------------------------


def _fs_customer_sides(spark: SparkSession, sf_dir: str):
    """Customer vs its deterministic perturbed twin: nationkey rotated on
    custkey%7==0, mktsegment clobbered on %3==0, balance +1 cent on %5==0 —
    known m-rates (6/7, 2/3, 4/5) the FS estimator must recover."""
    c = _t(spark, sf_dir, "customer")
    bal = F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)")
    a = c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        bal.alias("bal_cents"),
    )
    b = c.select(
        F.col("c_custkey").alias("id"),
        F.expr(
            "CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25"
            " ELSE c_nationkey END"
        ).alias("nat"),
        F.expr(
            "CASE WHEN c_custkey % 3 = 0 THEN 'PERTURBED'"
            " ELSE c_mktsegment END"
        ).alias("seg"),
        (bal + F.expr("CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END")).alias(
            "bal_cents"
        ),
    )
    seed = c.select(
        F.col("c_custkey").alias("a_id"), F.col("c_custkey").alias("b_id")
    )
    return a, b, seed


def q_fs_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter per-field weight estimation (the Splink recipe):
    u from the exact value-frequency random-pairing closed form, m counted
    on the labeled seed in one pass, weights as exact 16*log2 integers via
    the msb16 staged quotient. The twin's planted perturbation rates give
    known ground-truth m (6/7, 2/3, 4/5) and the low-cardinality fields
    give high u — seg/nat earn small agree weights, the near-unique
    balance earns a large one."""
    from .linking.fs import fs_field_weights

    a, b, seed = _fs_customer_sides(spark, sf_dir)
    return fs_field_weights(a, b, "id", ["nat", "seg", "bal_cents"], seed)


def _fs_sides_sql() -> str:
    return """
a AS (
  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer
),
b AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS nat,
         CASE WHEN c_custkey % 3 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS bal_cents
  FROM customer
),
nn AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS na,
              (SELECT CAST(count(*) AS BIGINT) FROM b) AS nb),
u_nat AS (
  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS u
  FROM (SELECT nat, CAST(count(*) AS BIGINT) AS ca FROM a
        WHERE nat IS NOT NULL GROUP BY nat) x
  JOIN (SELECT nat, CAST(count(*) AS BIGINT) AS cb FROM b
        WHERE nat IS NOT NULL GROUP BY nat) y USING (nat)
),
u_seg AS (
  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS u
  FROM (SELECT seg, CAST(count(*) AS BIGINT) AS ca FROM a
        WHERE seg IS NOT NULL GROUP BY seg) x
  JOIN (SELECT seg, CAST(count(*) AS BIGINT) AS cb FROM b
        WHERE seg IS NOT NULL GROUP BY seg) y USING (seg)
),
u_bal AS (
  SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS u
  FROM (SELECT bal_cents, CAST(count(*) AS BIGINT) AS ca FROM a
        WHERE bal_cents IS NOT NULL GROUP BY bal_cents) x
  JOIN (SELECT bal_cents, CAST(count(*) AS BIGINT) AS cb FROM b
        WHERE bal_cents IS NOT NULL GROUP BY bal_cents) y USING (bal_cents)
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS m_den,
         CAST(sum(CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END) AS BIGINT)
           AS m_nat,
         CAST(sum(CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END) AS BIGINT)
           AS m_seg,
         CAST(sum(CASE WHEN a.bal_cents = b.bal_cents THEN 1 ELSE 0 END)
              AS BIGINT) AS m_bal
  FROM a JOIN b USING (id)
),
scal AS MATERIALIZED (
  SELECT nn.na, nn.nb, un.u AS u_nat, us.u AS u_seg, ub.u AS u_bal,
         m.m_den, m.m_nat, m.m_seg, m.m_bal
  FROM nn, u_nat un, u_seg us, u_bal ub, m
)
""".strip()


def _duck_fs_w(m_num: str, m_den: str, u_num: str) -> str:
    """DuckDB replay of linking/fs._w_expr: msb16((m_num*2^20 //
    m_den) * na*nb // u_num) - 320, with >=1 clamps."""
    q = (
        f"(({m_num}) * 1048576 // greatest({m_den}, CAST(1 AS BIGINT)))"
        f" * (na * nb) // greatest({u_num}, CAST(1 AS BIGINT))"
    )
    return f"CAST({_duck_msb16(q)} - 320 AS BIGINT)"


FS_WEIGHTS_SQL = f"""
WITH {_fs_sides_sql()}
SELECT 'nat' AS field, m_nat AS m_num, m_den, u_nat AS u_num,
       CAST(na * nb AS BIGINT) AS u_den,
       {_duck_fs_w('m_nat', 'm_den', 'u_nat')} AS w_agree_x16,
       {_duck_fs_w('(m_den - m_nat)', 'm_den', '(na * nb - u_nat)')}
         AS w_disagree_x16
FROM scal
UNION ALL
SELECT 'seg', m_seg, m_den, u_seg, CAST(na * nb AS BIGINT),
       {_duck_fs_w('m_seg', 'm_den', 'u_seg')},
       {_duck_fs_w('(m_den - m_seg)', 'm_den', '(na * nb - u_seg)')}
FROM scal
UNION ALL
SELECT 'bal_cents', m_bal, m_den, u_bal, CAST(na * nb AS BIGINT),
       {_duck_fs_w('m_bal', 'm_den', 'u_bal')},
       {_duck_fs_w('(m_den - m_bal)', 'm_den', '(na * nb - u_bal)')}
FROM scal
"""


def q_fs_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FS pair scoring over nationkey-blocked customer x twin candidates:
    per-pair score = sum of agree/disagree weights (16*log2 units), the
    one-row weight scalars broadcast so scoring is map-side. Top-20 by
    (score desc, a_id, b_id) — unperturbed true twins fill the head."""
    from pyspark.sql import Window

    from .linking.fs import fs_score_pairs

    a, b, seed = _fs_customer_sides(spark, sf_dir)
    scores = fs_score_pairs(
        a, b, "id", ["nat", "seg", "bal_cents"], seed, block_cols=["nat"]
    )
    w = Window.orderBy(F.desc("score_x16"), F.asc("a_id"), F.asc("b_id"))
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 20)
        .select("rnk", "a_id", "b_id", "n_agree", "score_x16")
    )


FS_MATCH_SCORES_SQL = f"""
WITH {_fs_sides_sql()},
cand AS (
  SELECT a.id AS a_id, b.id AS b_id,
         CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS ag_nat,
         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
         CASE WHEN a.bal_cents = b.bal_cents THEN 1 ELSE 0 END AS ag_bal
  FROM a JOIN b ON a.nat = b.nat
),
scored AS (
  SELECT a_id, b_id,
         CAST(ag_nat + ag_seg + ag_bal AS BIGINT) AS n_agree,
         CAST(
           CASE WHEN ag_nat = 1
                THEN {_duck_fs_w('m_nat', 'm_den', 'u_nat')}
                ELSE {_duck_fs_w('(m_den - m_nat)', 'm_den',
                                 '(na * nb - u_nat)')} END
         + CASE WHEN ag_seg = 1
                THEN {_duck_fs_w('m_seg', 'm_den', 'u_seg')}
                ELSE {_duck_fs_w('(m_den - m_seg)', 'm_den',
                                 '(na * nb - u_seg)')} END
         + CASE WHEN ag_bal = 1
                THEN {_duck_fs_w('m_bal', 'm_den', 'u_bal')}
                ELSE {_duck_fs_w('(m_den - m_bal)', 'm_den',
                                 '(na * nb - u_bal)')} END
         AS BIGINT) AS score_x16
  FROM cand CROSS JOIN scal
)
SELECT CAST(row_number() OVER (
         ORDER BY score_x16 DESC, a_id ASC, b_id ASC) AS BIGINT) AS rnk,
       a_id, b_id, n_agree, score_x16
FROM scored
QUALIFY rnk <= 20
"""



# ---------------------------------------------------------------------------
# Q: degree-discount influence maximization seeds over the divide lattice
# ---------------------------------------------------------------------------


def q_influence_seeds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-discount influence-maximization seeds (Chen et al. KDD'09)
    on the undirected divide-lattice: 6 seeds at p = 1/10, exact-integer
    discounted-degree scores, ties pinned to the smallest node. The
    oracle replays the identical 6 driver rounds as a recursive CTE
    carrying the picked list (arg_max over a score*2^31 - node key —
    window functions inside LATERAL are chunk-local in DuckDB and were
    measured non-deterministic; the encoded-key argmax is not)."""
    from .operators.graph_algos import influence_seeds

    return influence_seeds(
        _divide_dag_edges(spark, sf_dir), k=6, p_num=1, p_den=10
    )


INFLUENCE_SEEDS_SQL = """
WITH RECURSIVE nodes AS (
  SELECT CAST(c_custkey AS BIGINT) AS k FROM customer WHERE c_custkey >= 1
),
ed AS (
  SELECT k AS src, k // 2 AS dst FROM nodes WHERE k >= 2
  UNION ALL
  SELECT k, k // 3 FROM nodes WHERE k >= 3 AND k // 3 <> k // 2
),
sym AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT src AS u, dst AS v FROM ed WHERE src <> dst
    UNION ALL
    SELECT dst, src FROM ed WHERE src <> dst
  )
),
deg AS MATERIALIZED (
  SELECT u AS node, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY u
),
sel AS (
  SELECT 0 AS r, CAST([] AS BIGINT[]) AS picked, CAST([] AS BIGINT[]) AS scores
  UNION ALL
  SELECT sel.r + 1,
         list_append(sel.picked, cand.bn),
         list_append(sel.scores, (cand.mk + cand.bn) // 2147483648)
  FROM sel, LATERAL (
    SELECT arg_max(node, key) AS bn, max(key) AS mk FROM (
      SELECT d.node,
             (d.d * 10 - 2 * tt.t * 10 - (d.d - tt.t) * tt.t * 1)
               * 2147483648 - d.node AS key
      FROM deg d,
      LATERAL (SELECT CAST(coalesce((
          SELECT count(*) FROM sym
          WHERE sym.u = d.node AND list_contains(sel.picked, sym.v)), 0)
        AS BIGINT) AS t) tt
      WHERE NOT list_contains(sel.picked, d.node)
    )
  ) cand
  WHERE sel.r < 6
)
SELECT CAST(unnest(range(1, 7)) AS BIGINT) AS rnk,
       unnest(picked) AS node, unnest(scores) AS score
FROM sel WHERE r = 6
"""



# ---------------------------------------------------------------------------
# Q: incremental inverted-index maintenance -> BM25 over the merged index
# ---------------------------------------------------------------------------


def q_incremental_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental index maintenance proven through scoring: a stored
    index (90% of docs current + 5% STALE truncated versions) takes a
    10%-batch upsert (merge_inverted_index: broadcast anti-join delete
    leg + batch-only rebuild), and BM25 top-10 over the merged index
    must equal the oracle's clean full-corpus build — df, doc-length
    and N statistics all derive from the index, so any stale or
    duplicated posting would shift a score."""
    from .operators.retrieval import (
        bm25_search,
        build_inverted_index,
        merge_inverted_index,
    )

    docs = _t(spark, sf_dir, "documents")
    current = docs.filter(F.expr("doc_id % 10 != 0"))
    stale = docs.filter(F.expr("doc_id % 20 = 0")).withColumn(
        "text", F.substring("text", 1, 40)
    )
    stored = build_inverted_index(current.unionByName(stale))
    batch = docs.filter(F.expr("doc_id % 10 = 0"))
    merged = merge_inverted_index(stored, batch)
    return bm25_search(merged, docs, "scan merge order", k=10)


INCREMENTAL_BM25_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> '' GROUP BY doc_id, term),
doc_len AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(DISTINCT doc_id) FROM documents) AS n,
         floor((SELECT avg(dl) FROM doc_len) * 1000000 + 0.5) / 1000000 AS avglen
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf WHERE term IN ('scan', 'merge', 'order') GROUP BY term
),
hits AS (
  SELECT t.doc_id, t.term, t.tf, d.df, l.dl
  FROM tf t JOIN dfreq d USING (term) JOIN doc_len l USING (doc_id)
  WHERE t.term IN ('scan', 'merge', 'order')
),
scored AS (
  SELECT doc_id,
         sum(
           ln((CAST((SELECT n FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * (1.2 + 1.0))
           / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (SELECT avglen FROM stats)))
         ) AS score
  FROM hits GROUP BY doc_id
)
SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
       CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS score_x1e6
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""



# ---------------------------------------------------------------------------
# Q: one synchronous Louvain local-moving round over the divide lattice
# ---------------------------------------------------------------------------


def q_louvain_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One synchronous Louvain phase-1 round from the arbitrary 64-block
    id partition of the divide lattice: every node takes its best
    strictly-positive exact-integer modularity gain w.r.t. the old
    labeling (ties to the smallest community label) — the greedy
    refinement step that feeds modularity_score. The lattice's k->k/2
    edges mostly CROSS the block partition, so the readout shows heavy
    movement — an honest 'metadata partition does not match topology'
    input, same family as newman_modularity's negative Q."""
    from .operators.graph_algos import louvain_move_round

    e = _divide_dag_edges(spark, sf_dir)
    nodes = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") >= 1)
        .select(F.col("c_custkey").cast("long").alias("node"))
    )
    lab = nodes.select(
        "node", F.expr("CAST(node DIV 64 AS STRING)").alias("label")
    )
    return louvain_move_round(e, lab)


LOUVAIN_ROUND_SQL = """
WITH nodes AS (
  SELECT CAST(c_custkey AS BIGINT) AS n FROM customer WHERE c_custkey >= 1
),
ed AS (
  SELECT n AS src, n // 2 AS dst FROM nodes WHERE n >= 2
  UNION ALL
  SELECT n, n // 3 FROM nodes WHERE n >= 3 AND n // 3 <> n // 2
),
ue AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM ed WHERE src <> dst
),
sym AS (SELECT u, v FROM ue UNION ALL SELECT v AS u, u AS v FROM ue),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS k FROM sym GROUP BY u),
lab AS (SELECT u, CAST(u // 64 AS VARCHAR) AS lbl FROM deg),
mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ue),
sig AS (
  SELECT lbl, CAST(sum(k) AS BIGINT) AS sig
  FROM deg JOIN lab USING (u) GROUP BY lbl
),
kic AS (
  SELECT s.u, lb.lbl AS c, CAST(count(*) AS BIGINT) AS kic
  FROM sym s JOIN lab lb ON s.v = lb.u GROUP BY s.u, lb.lbl
),
own AS (
  SELECT deg.u, deg.k, lab.lbl AS old_label,
         coalesce(ka.kic, 0) AS kia
  FROM deg JOIN lab USING (u)
  LEFT JOIN kic ka ON ka.u = deg.u AND ka.c = lab.lbl
),
cand AS (
  SELECT own.u, own.old_label, kic.c,
         CAST(4 * mm.m * (kic.kic - own.kia)
              - 2 * own.k * (sc.sig - sa.sig + own.k) AS BIGINT) AS gain_x
  FROM own
  JOIN kic ON kic.u = own.u AND kic.c <> own.old_label
  JOIN sig sc ON sc.lbl = kic.c
  JOIN sig sa ON sa.lbl = own.old_label
  CROSS JOIN mm
),
best AS (
  SELECT u, c AS new_label, gain_x,
         row_number() OVER (
           PARTITION BY u ORDER BY gain_x DESC, c ASC) AS rn
  FROM cand
)
SELECT own.u AS node, own.old_label,
       CASE WHEN b.gain_x > 0 THEN b.new_label ELSE own.old_label END
         AS new_label,
       CAST(CASE WHEN b.gain_x > 0 THEN b.gain_x ELSE 0 END AS BIGINT)
         AS gain_x
FROM own LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.u = own.u
"""



# ---------------------------------------------------------------------------
# Q: Wald SPRT sequential decisions per event type
# ---------------------------------------------------------------------------


def q_sprt_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald SPRT per event type: H0 p=1/3 vs H1 p=1/2 at alpha=beta=5%,
    success = cents%3==0 (~1/3, the null) except the planted 'error'
    type whose success is cents%3!=2 (~2/3) — its LLR walk climbs ~+3
    per observation and pins accept_h1 within a few dozen events, while
    null types drift to accept_h0. All LLR increments and thresholds are
    pure-integer llr16 constants shared verbatim with the oracle."""
    from .operators.classifier import sprt_decisions

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    ev = ev.withColumn(
        "succ",
        F.expr(
            "CASE WHEN event_type = 'error' THEN cents % 3 <> 2"
            " ELSE cents % 3 = 0 END"
        ),
    )
    out = sprt_decisions(ev, "event_type", "event_id", "succ")
    return out.select(
        F.col("key").alias("event_type"), "decision", "n_obs", "llr_x16"
    )


def _sprt_sql() -> str:
    from .operators.classifier import llr16

    s = llr16(1 * 3, 2 * 1)
    f = llr16((2 - 1) * 3, 2 * (3 - 1))
    up = llr16((100 - 5) * 100, 100 * 5)
    lo = -up
    return f"""
WITH base AS (
  SELECT event_type AS key, event_id AS o,
         CASE WHEN (CASE WHEN event_type = 'error'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 3 <> 2
                    ELSE CAST(floor(value * 100 + 0.5) AS BIGINT) % 3 = 0 END)
              THEN {s} ELSE {f} END AS step
  FROM events
),
walked AS (
  SELECT key, o,
         row_number() OVER (PARTITION BY key ORDER BY o) AS rn,
         sum(step) OVER (PARTITION BY key ORDER BY o
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
),
fl AS (
  SELECT key, rn, cum,
         min(CASE WHEN cum >= {up} OR cum <= {lo} THEN rn END)
           OVER (PARTITION BY key) AS cross_rn,
         max(rn) OVER (PARTITION BY key) AS last_rn
  FROM walked
)
SELECT key AS event_type,
       CASE WHEN cross_rn IS NULL THEN 'continue'
            WHEN cum >= {up} THEN 'accept_h1'
            ELSE 'accept_h0' END AS decision,
       CAST(rn AS BIGINT) AS n_obs, CAST(cum AS BIGINT) AS llr_x16
FROM fl WHERE rn = coalesce(cross_rn, last_rn)
"""


SPRT_DECISIONS_SQL = _sprt_sql()



# ---------------------------------------------------------------------------
# Q: Benjamini-Hochberg FDR selection over per-nation rational p-values
# ---------------------------------------------------------------------------


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR at alpha=10% over 25 hypotheses (one per nation):
    null p-values are uniform md5 rationals (1 + h%1000)/1001, the four
    nations with nationkey%8==0 carry planted tiny p = (1 + key%3)/1001.
    The step-up rule (largest rank i with p_num*m*a_den <= i*a_num*p_den,
    fully cross-multiplied BIGINT) rejects the planted heads plus any
    lucky-small null — the multiple-testing gate run across per-metric
    tests before alerting."""
    from .operators.classifier import bh_select
    from .operators.sketches import _hash32

    n = _t(spark, sf_dir, "nation").select(
        "n_name",
        F.when(
            F.expr("n_nationkey % 8 = 0"),
            F.expr("1 + n_nationkey % 3"),
        )
        .otherwise(
            _hash32(F.concat(F.lit("bh:"), F.col("n_name"))) % 1000 + 1
        )
        .cast("long")
        .alias("p_num"),
        F.lit(1001).cast("long").alias("p_den"),
    )
    out = bh_select(n, "n_name", "p_num", "p_den", alpha=(10, 100))
    return out.select(
        F.col("key").alias("n_name"), "p_num", "p_den", "rnk", "rejected"
    )


BH_FDR_SQL = """
WITH hyp AS (
  SELECT n_name,
         CAST(CASE WHEN n_nationkey % 8 = 0 THEN 1 + n_nationkey % 3
              ELSE CAST(concat('0x', substr(md5('bh:' || n_name), 1, 8))
                   AS BIGINT) % 1000 + 1 END AS BIGINT) AS p_num,
         CAST(1001 AS BIGINT) AS p_den
  FROM nation
),
ranked AS (
  SELECT n_name, p_num, p_den,
         CAST(row_number() OVER (ORDER BY p_num ASC, n_name ASC) AS BIGINT)
           AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM hyp
),
crossed AS (
  SELECT *,
         max(CASE WHEN p_num * m * 100 <= rnk * 10 * p_den THEN rnk END)
           OVER () AS istar
  FROM ranked
)
SELECT n_name, p_num, p_den, rnk,
       rnk <= coalesce(istar, 0) AS rejected
FROM crossed
"""



# ---------------------------------------------------------------------------
# Q: Kaplan-Meier survival curves per event type (censoring-aware)
# ---------------------------------------------------------------------------


def q_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier per event type over per-user activity spans:
    t = seconds between a user's first and last event of the type,
    observed = the user logged >= 3 such events (others are censored —
    still under observation). Exact-integer curve in 16*log2 units via
    the msb16 device; exhausted risk sets (S hits exact 0) emit NULL."""
    from .operators.temporal import kaplan_meier

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    per = ev.groupBy("event_type", "user_id").agg(
        (F.max("sec") - F.min("sec")).cast("long").alias("t"),
        (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
    )
    out = kaplan_meier(per, "event_type", "t", "obs")
    return out.select(
        F.col("key").alias("event_type"), "t", "n_risk", "d", "c",
        "log2_surv_x16", "cumhaz_x1e6",
    )


KAPLAN_MEIER_SQL = f"""
WITH per AS (
  SELECT event_type AS key, user_id,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS t,
         CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS obs
  FROM events GROUP BY event_type, user_id
),
dd AS (
  SELECT key, t, CAST(sum(obs) AS BIGINT) AS d,
         CAST(sum(1 - obs) AS BIGINT) AS c
  FROM per GROUP BY key, t
),
risk AS (
  SELECT *, CAST(sum(d + c) OVER (
    PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
    AS n_risk
  FROM dd
),
st AS (
  SELECT *, CASE WHEN d = 0 THEN CAST(0 AS BIGINT)
                 WHEN n_risk > d THEN -(CAST(
                   {_duck_msb16('n_risk * 1048576 // (n_risk - d)')}
                   AS BIGINT) - 320)
                 ELSE CAST(0 AS BIGINT) END AS step
  FROM risk
),
wk AS (
  SELECT *, max(CASE WHEN d >= n_risk AND d > 0 THEN 1 ELSE 0 END) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS dead,
            sum(step) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS cum,
            sum(d * 1000000 // n_risk) OVER (
              PARTITION BY key ORDER BY t ASC ROWS UNBOUNDED PRECEDING)
              AS haz
  FROM st
)
SELECT key AS event_type, t, n_risk, d, c,
       CASE WHEN dead = 1 THEN NULL ELSE CAST(cum AS BIGINT) END
         AS log2_surv_x16,
       CAST(haz AS BIGINT) AS cumhaz_x1e6
FROM wk
"""



# ---------------------------------------------------------------------------
# Q: two-group log-rank test per event type (planted survival difference)
# ---------------------------------------------------------------------------


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test per event type between user-parity groups, with a
    PLANTED survival difference: for 'error', odd users' activity spans
    are quartered (they 'churn' 4x sooner), so its z2_log2_x16 reads far
    above the 16*log2(3.84) ~ 31 five-percent line while parity splits
    of the untouched types calibrate the null."""
    from .operators.temporal import logrank_test

    ev = _t(spark, sf_dir, "events").select(
        "event_type", "user_id", F.unix_timestamp("ts").alias("sec")
    )
    per = ev.groupBy("event_type", "user_id").agg(
        (F.max("sec") - F.min("sec")).cast("long").alias("t0"),
        (F.count(F.lit(1)) >= 3).cast("long").alias("obs"),
    )
    per = per.select(
        "event_type",
        F.expr(
            "CASE WHEN event_type = 'error' AND user_id % 2 = 1"
            " THEN t0 DIV 4 ELSE t0 END"
        ).alias("t"),
        "obs",
        F.expr("user_id % 2").cast("long").alias("g"),
    )
    out = logrank_test(per, "event_type", "t", "obs", "g")
    return out.select(
        F.col("key").alias("event_type"),
        "o1",
        "e1_x1e6",
        "v_x1e6",
        "diff_x1e6",
        "z2_log2_x16",
    )


LOGRANK_TEST_SQL = f"""
WITH per0 AS (
  SELECT event_type AS key, user_id,
         CAST(floor(epoch(max(ts))) AS BIGINT)
           - CAST(floor(epoch(min(ts))) AS BIGINT) AS t0,
         CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS obs
  FROM events GROUP BY event_type, user_id
),
per AS (
  SELECT key,
         CASE WHEN key = 'error' AND user_id % 2 = 1 THEN t0 // 4
              ELSE t0 END AS t,
         obs, CAST(user_id % 2 AS BIGINT) AS g
  FROM per0
),
dd AS (
  SELECT key, t,
         CAST(sum(CASE WHEN g = 0 THEN obs ELSE 0 END) AS BIGINT) AS d0,
         CAST(sum(CASE WHEN g = 0 THEN 1 - obs ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN g = 1 THEN obs ELSE 0 END) AS BIGINT) AS d1,
         CAST(sum(CASE WHEN g = 1 THEN 1 - obs ELSE 0 END) AS BIGINT) AS c1
  FROM per GROUP BY key, t
),
risk AS (
  SELECT *,
         CAST(sum(d0 + c0) OVER (
           PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS n0,
         CAST(sum(d1 + c1) OVER (
           PARTITION BY key ORDER BY t DESC ROWS UNBOUNDED PRECEDING)
           AS BIGINT) AS n1
  FROM dd
),
terms AS (
  SELECT key, d1,
         CASE WHEN d0 + d1 > 0
              THEN (d0 + d1) * n1 * 1000000 // (n0 + n1)
              ELSE CAST(0 AS BIGINT) END AS e1_term,
         CASE WHEN d0 + d1 > 0 AND n0 + n1 > 1 THEN
              (((d0 + d1) * n1 * 1000 // (n0 + n1)) * n0 * 1000
               // (n0 + n1)) * (n0 + n1 - d0 - d1) // (n0 + n1 - 1)
              ELSE CAST(0 AS BIGINT) END AS v_term
  FROM risk
),
agg AS (
  SELECT key, CAST(sum(d1) AS BIGINT) AS o1,
         CAST(sum(e1_term) AS BIGINT) AS e1_x1e6,
         CAST(sum(v_term) AS BIGINT) AS v_x1e6
  FROM terms GROUP BY key
)
SELECT key AS event_type, o1, e1_x1e6, v_x1e6,
       CAST(o1 * 1000000 - e1_x1e6 AS BIGINT) AS diff_x1e6,
       CAST(2 * {_duck_msb16('abs(o1 * 1000000 - e1_x1e6)')}
            - {_duck_msb16('greatest(v_x1e6, CAST(1 AS BIGINT))')}
            - 318 AS BIGINT) AS z2_log2_x16
FROM agg
"""



# ---------------------------------------------------------------------------
# Q: generation eval — ROUGE-2 and BLEU over deterministic corruption twins
# ---------------------------------------------------------------------------

_GEN_EVAL_CAND = (
    "CASE WHEN doc_id % 3 = 0 THEN text"
    " WHEN doc_id % 3 = 1 THEN concat_ws(' ',"
    "   slice(filter(split(text, ' '), t -> t != ''), 1,"
    "     greatest(size(filter(split(text, ' '), t -> t != '')) DIV 2, 1)))"
    " ELSE translate(text, 'aeiou', 'oieau') END"
)

_GEN_EVAL_CAND_DUCK = """
CASE WHEN doc_id % 3 = 0 THEN text
     WHEN doc_id % 3 = 1 THEN array_to_string(
       list_filter(string_split(text, ' '), t -> t <> '')[
         1 : greatest(len(list_filter(string_split(text, ' '),
                                      t -> t <> '')) // 2, 1)], ' ')
     ELSE translate(text, 'aeiou', 'oieau') END
""".strip()


def q_rouge2_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-2 with clipped counts per (doc, corruption-twin) pair:
    doc_id%3==0 twins are verbatim (P=R=F1=1e6), %3==1 are halved
    (recall ~ 1/2, precision ~ 1), %3==2 are vowel-rotated (near-zero
    overlap) — the three regimes a summarization eval must separate.
    F1 = 2·overlap/(ref+cand) as ONE exact rational."""
    from .operators.text import rouge_n_scores

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.expr(_GEN_EVAL_CAND).alias("cand")
    )
    return rouge_n_scores(docs, "doc_id", "text", "cand", n=2)


ROUGE2_PAIRS_SQL = f"""
WITH pairs AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tr,
         list_filter(string_split({_GEN_EVAL_CAND_DUCK}, ' '), t -> t <> '')
           AS tc
  FROM documents
),
base AS (SELECT * FROM pairs WHERE len(tr) >= 2),
rg AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cr FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(tr) - 1, 0) + 1),
      i -> array_to_string(tr[i : i + 1], ' '))) AS g
    FROM base) GROUP BY doc_id, g
),
cg AS (
  SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cc FROM (
    SELECT doc_id, unnest(list_transform(
      range(1, greatest(len(tc) - 1, 0) + 1),
      i -> array_to_string(tc[i : i + 1], ' '))) AS g
    FROM base) GROUP BY doc_id, g
),
ov AS (
  SELECT doc_id, CAST(sum(least(cr, cc)) AS BIGINT) AS overlap
  FROM rg JOIN cg USING (doc_id, g) GROUP BY doc_id
),
tot AS (
  SELECT r.doc_id, r.ref_grams, coalesce(c.cand_grams, 0) AS cand_grams
  FROM (SELECT doc_id, CAST(sum(cr) AS BIGINT) AS ref_grams
        FROM rg GROUP BY doc_id) r
  LEFT JOIN (SELECT doc_id, CAST(sum(cc) AS BIGINT) AS cand_grams
             FROM cg GROUP BY doc_id) c ON r.doc_id = c.doc_id
)
SELECT tot.doc_id, ref_grams, CAST(cand_grams AS BIGINT) AS cand_grams,
       CAST(coalesce(ov.overlap, 0) AS BIGINT) AS overlap,
       CAST(CASE WHEN cand_grams > 0
            THEN coalesce(ov.overlap, 0) * 1000000 // cand_grams
            ELSE 0 END AS BIGINT) AS p_x1e6,
       CAST(coalesce(ov.overlap, 0) * 1000000 // ref_grams AS BIGINT)
         AS r_x1e6,
       CAST(2 * coalesce(ov.overlap, 0) * 1000000
            // (ref_grams + cand_grams) AS BIGINT) AS f1_x1e6
FROM tot LEFT JOIN ov ON tot.doc_id = ov.doc_id
"""


def q_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU (1..4-gram, brevity penalty) per corruption-twin pair in
    exact 16*log2 units — verbatim twins read 0, halved twins pay the
    brevity penalty -(r-c)*23 DIV c, vowel-rotated twins floor toward
    the msb16 device's -320 per order. One explode fans all four orders
    (the minhash-band rule)."""
    from .operators.text import bleu_log2

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "text", F.expr(_GEN_EVAL_CAND).alias("cand")
    )
    return bleu_log2(docs, "doc_id", "text", "cand", max_n=4)


BLEU_PAIRS_SQL = f"""
WITH pairs AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), t -> t <> '') AS tr,
         list_filter(string_split({_GEN_EVAL_CAND_DUCK}, ' '), t -> t <> '')
           AS tc
  FROM documents
),
base AS (SELECT * FROM pairs WHERE len(tr) >= 4),
ns AS (SELECT unnest(range(1, 5)) AS n),
rg AS (
  SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS cr FROM (
    SELECT doc_id, n, unnest(list_transform(
      range(1, greatest(len(tr) - n + 1, 0) + 1),
      i -> array_to_string(tr[i : i + n - 1], ' '))) AS g
    FROM base CROSS JOIN ns) GROUP BY doc_id, n, g
),
cg AS (
  SELECT doc_id, n, g, CAST(count(*) AS BIGINT) AS cc FROM (
    SELECT doc_id, n, unnest(list_transform(
      range(1, greatest(len(tc) - n + 1, 0) + 1),
      i -> array_to_string(tc[i : i + n - 1], ' '))) AS g
    FROM base CROSS JOIN ns) GROUP BY doc_id, n, g
),
per_n AS (
  SELECT cg.doc_id, cg.n,
         CAST(sum(least(coalesce(rg.cr, 0), cg.cc)) AS BIGINT) AS clip,
         CAST(sum(cg.cc) AS BIGINT) AS tot
  FROM cg LEFT JOIN rg ON rg.doc_id = cg.doc_id AND rg.n = cg.n
                       AND rg.g = cg.g
  GROUP BY cg.doc_id, cg.n
),
agg AS (
  SELECT doc_id,
         CAST(sum(CAST({_duck_msb16('clip * 1048576 // greatest(tot, CAST(1 AS BIGINT))')}
              - 320 AS BIGINT)) AS BIGINT) AS lpsum,
         CAST(count(*) AS BIGINT) AS nn
  FROM per_n GROUP BY doc_id
),
lens AS (
  SELECT doc_id, CAST(len(tr) AS BIGINT) AS ref_len,
         CAST(len(tc) AS BIGINT) AS cand_len
  FROM base
)
SELECT lens.doc_id, ref_len, cand_len,
       CAST(coalesce(agg.lpsum, -1280) // coalesce(agg.nn, 4)
            + CASE WHEN cand_len >= ref_len OR cand_len = 0 THEN 0
              ELSE -((ref_len - cand_len) * 23 // cand_len) END
            AS BIGINT) AS bleu_log2_x16
FROM lens LEFT JOIN agg ON lens.doc_id = agg.doc_id
"""



# ---------------------------------------------------------------------------
# Q: Shewhart / Western Electric control-chart flags per event type
# ---------------------------------------------------------------------------


def q_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Control-chart monitoring per event type with two planted
    late-period shifts (last 10% of event_ids): 'click' +300.00 spikes
    past the 3-sigma line (rule1), 'view' +150.00 is a sustained small
    shift the run rule catches (rule2, 9 consecutive above-mean).
    Baselines freeze on each type's clean first half. Emits only
    flagged points (rule1 or rule2) — the alert stream."""
    from .operators.temporal import control_chart_flags

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("event_id").cast("long").alias("__mx"))
    x = (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.col("event_id").cast("long").alias("event_id"),
            F.expr(
                "CAST(floor(value * 100 + 0.5) AS BIGINT)"
                " + CASE WHEN event_type = 'click'"
                "        AND event_id > __mx * 9 DIV 10 THEN 30000"
                "   WHEN event_type = 'view'"
                "        AND event_id > __mx * 9 DIV 10 THEN 15000"
                "   ELSE 0 END"
            ).alias("cents"),
        )
    )
    out = control_chart_flags(x, "event_type", "event_id", "cents")
    return out.filter(F.col("rule1") | F.col("rule2")).select(
        F.col("key").alias("event_type"), "o", "x", "side", "rule1", "rule2"
    )


CONTROL_CHART_SQL = """
WITH mx AS (SELECT CAST(max(event_id) AS BIGINT) AS m FROM events),
pts AS (
  SELECT event_type AS key, CAST(event_id AS BIGINT) AS o,
         CAST(floor(value * 100 + 0.5) AS BIGINT)
           + CASE WHEN event_type = 'click'
                  AND event_id > (SELECT m FROM mx) * 9 // 10 THEN 30000
             WHEN event_type = 'view'
                  AND event_id > (SELECT m FROM mx) * 9 // 10 THEN 15000
             ELSE 0 END AS x
  FROM events
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY key ORDER BY o) AS BIGINT)
              AS rn,
            CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS cnt
  FROM pts
),
stats AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
         CAST(sum(x * x) AS BIGINT) AS q
  FROM ranked WHERE rn <= cnt // 2 GROUP BY key
),
dev AS (
  SELECT r.key, r.o, r.x,
         CAST(CASE WHEN st.n * r.x - st.s > 0 THEN 1
                   WHEN st.n * r.x - st.s < 0 THEN -1 ELSE 0 END AS BIGINT)
           AS side,
         (CAST(st.n AS HUGEINT) * r.x - st.s)
           * (CAST(st.n AS HUGEINT) * r.x - st.s)
           > 9 * (CAST(st.n AS HUGEINT) * st.q
                  - CAST(st.s AS HUGEINT) * st.s) AS rule1
  FROM ranked r JOIN stats st ON r.key = st.key
),
runs AS (
  SELECT *,
         (count(*) OVER w9 >= 9
          AND min(side) OVER w9 = max(side) OVER w9
          AND side <> 0) AS rule2
  FROM dev
  WINDOW w9 AS (PARTITION BY key ORDER BY o
                ROWS BETWEEN 8 PRECEDING AND CURRENT ROW)
)
SELECT key AS event_type, o, x, side, rule1, rule2
FROM runs WHERE rule1 OR rule2
"""



# ---------------------------------------------------------------------------
# Q: AMS F2 sketch vs exact repeat rate over event user_ids
# ---------------------------------------------------------------------------


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch (k=16 sign estimators, pinned lower
    median) beside the exact F2 = sum of squared user frequencies — the
    self-join-size estimate a join planner consults, with the honest
    calibration readout in one row."""
    from .operators.sketches import ams_f2

    ev = _t(spark, sf_dir, "events")
    est = ams_f2(ev, "user_id", k=16)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact))


AMS_F2_SQL = """
WITH vals AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
js AS (SELECT unnest(range(0, 16)) AS j),
z AS (
  SELECT j, CAST(sum(CASE WHEN
    CAST(concat('0x', substr(md5('ams:' || CAST(j AS VARCHAR) || ':' || v),
                1, 8)) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS z
  FROM vals CROSS JOIN js GROUP BY j
),
gm AS (
  SELECT j // 4 AS g, CAST(sum(z * z) // count(*) AS BIGINT) AS gm
  FROM z GROUP BY j // 4
),
med AS (
  SELECT g, gm, row_number() OVER (ORDER BY gm ASC, g ASC) AS rn FROM gm
),
ex AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT count(*) AS c FROM events GROUP BY user_id)
)
SELECT CAST(16 AS BIGINT) AS k, CAST(med.gm AS BIGINT) AS f2_est, ex.f2_exact
FROM med, ex WHERE rn = 2
"""



# ---------------------------------------------------------------------------
# Q: Deequ-style declarative data-quality suite over orders (+ FK checks)
# ---------------------------------------------------------------------------


def q_dq_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass declarative quality suite on orders: completeness and
    key uniqueness pass at exactly 1e6, o_custkey uniqueness honestly
    FAILS its 1e6 threshold (customers repeat — the misdeclared-key
    alarm), status values all in {O,F,P}, and a deliberately tight price
    range fails — the mixed verdict sheet an ingestion gate publishes."""
    from .operators.dq import run_checks

    o = _t(spark, sf_dir, "orders")
    checks = [
        ("completeness", "o_custkey", None, 1000000),
        ("completeness", "o_orderdate", None, 1000000),
        ("uniqueness", "o_orderkey", None, 1000000),
        ("uniqueness", "o_custkey", None, 1000000),
        ("in_set", "o_orderstatus", ["O", "F", "P"], 1000000),
        ("in_range", "o_totalprice", (0.0, 1000.0), 900000),
    ]
    return run_checks(o, checks)


DQ_SUITE_SQL = """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(o_custkey) AS BIGINT) AS m0,
         CAST(count(o_orderdate) AS BIGINT) AS m1,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS m2,
         CAST(count(DISTINCT o_custkey) AS BIGINT) AS m3,
         CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
              AS BIGINT) AS m4,
         CAST(sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 1000.0
                  THEN 1 ELSE 0 END) AS BIGINT) AS m5
  FROM orders
)
SELECT 'completeness' AS "check", 'o_custkey' AS "column",
       CAST(m0 * 1000000 // n AS BIGINT) AS metric_x1e6,
       CAST(1000000 AS BIGINT) AS min_x1e6,
       m0 * 1000000 // n >= 1000000 AS passed FROM m
UNION ALL SELECT 'completeness', 'o_orderdate',
       CAST(m1 * 1000000 // n AS BIGINT), 1000000,
       m1 * 1000000 // n >= 1000000 FROM m
UNION ALL SELECT 'uniqueness', 'o_orderkey',
       CAST(m2 * 1000000 // n AS BIGINT), 1000000,
       m2 * 1000000 // n >= 1000000 FROM m
UNION ALL SELECT 'uniqueness', 'o_custkey',
       CAST(m3 * 1000000 // n AS BIGINT), 1000000,
       m3 * 1000000 // n >= 1000000 FROM m
UNION ALL SELECT 'in_set', 'o_orderstatus',
       CAST(m4 * 1000000 // n AS BIGINT), 1000000,
       m4 * 1000000 // n >= 1000000 FROM m
UNION ALL SELECT 'in_range', 'o_totalprice',
       CAST(m5 * 1000000 // n AS BIGINT), 900000,
       m5 * 1000000 // n >= 900000 FROM m
"""


def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity rows for the two fact->dim edges of the
    order graph (lineitem->orders, orders->customer): orphan counts and
    the integrity fraction — both clean in this corpus, which is exactly
    what the check certifies before a publish."""
    from .operators.dq import referential_check

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = referential_check(li, "l_orderkey", o, "o_orderkey")
    b = referential_check(o, "o_custkey", c, "c_custkey")
    return a.unionByName(b)


DQ_REFERENTIAL_SQL = """
SELECT 'referential' AS "check", 'l_orderkey' AS "column",
       CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
       CAST((SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NULL
             OR NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
         AS n_orphans,
       CAST(((SELECT count(*) FROM lineitem)
             - (SELECT count(*) FROM lineitem l WHERE l.l_orderkey IS NULL
                OR NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)))
            * 1000000 // (SELECT count(*) FROM lineitem) AS BIGINT)
         AS metric_x1e6
UNION ALL
SELECT 'referential', 'o_custkey',
       CAST((SELECT count(*) FROM orders) AS BIGINT),
       CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NULL
             OR NOT EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       CAST(((SELECT count(*) FROM orders)
             - (SELECT count(*) FROM orders o WHERE o.o_custkey IS NULL
                OR NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)))
            * 1000000 // (SELECT count(*) FROM orders) AS BIGINT)
"""



# ---------------------------------------------------------------------------
# Q: Haar wavelet multiscale energy over hourly event-type series
# ---------------------------------------------------------------------------


def q_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar energy per event type over the hourly count
    series (absolute hour index, 6 levels = up to the 64-hour scale):
    the per-resolution breakdown that says which scale carries each
    type's variance — the multiscale companion to fano_burstiness."""
    from .operators.temporal import haar_energy

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_timestamp(ts) DIV 3600").alias("hr")
    )
    series = ev.groupBy("event_type", "hr").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return haar_energy(series, "event_type", "hr", "c", levels=6).select(
        F.col("key").alias("event_type"), "level", "n_blocks",
        "nonzero_blocks", "energy",
    )


HAAR_ENERGY_SQL = """
WITH series AS (
  SELECT event_type AS key,
         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS idx,
         CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
fan AS (
  SELECT key, l, idx // (CAST(1 AS BIGINT) << l) AS block,
         v * (CASE WHEN (idx // (CAST(1 AS BIGINT) << (l - 1))) % 2 = 0
              THEN 1 ELSE -1 END) AS sv
  FROM series, (SELECT unnest(range(1, 7)) AS l)
),
det AS (
  SELECT key, l AS level, block, CAST(sum(sv) AS BIGINT) AS d
  FROM fan GROUP BY key, l, block
)
SELECT key AS event_type, level,
       CAST(count(*) AS BIGINT) AS n_blocks,
       CAST(sum(CASE WHEN d <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS nonzero_blocks,
       CAST(sum(d * d) AS BIGINT) AS energy
FROM det GROUP BY key, level
"""



# ---------------------------------------------------------------------------
# Q: Gale-Shapley stable one-to-one assignment of customers to twins
# ---------------------------------------------------------------------------


def q_stable_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred-acceptance assignment after blocking+scoring: every 5th
    clean customer proposes to same-nation twin records under score =
    2000*(seg match) + 1000*(bal match) - (p+a)%997, preference lists
    truncated to top-5, 12 pinned synchronous rounds. The oracle runs
    the SAME rounds as a recursive CTE — and by McVitie-Wilson the
    proposer-optimal matching is unique, so any correct GS must agree."""
    from pyspark.sql import Window

    from .linking.matching import stable_matching

    a, b, _seed = _fs_customer_sides(spark, sf_dir)
    pa = a.filter(F.expr("id % 5 = 0"))
    pairs = pa.alias("x").join(
        b.alias("y"), F.col("x.nat") == F.col("y.nat")
    ).select(
        F.col("x.id").alias("p"),
        F.col("y.id").alias("a"),
        F.expr(
            "CAST(CASE WHEN x.seg = y.seg THEN 2000 ELSE 0 END"
            " + CASE WHEN x.bal_cents = y.bal_cents THEN 1000 ELSE 0 END"
            " - (x.id + y.id) % 997 AS BIGINT)"
        ).alias("score"),
    )
    w = Window.partitionBy("p").orderBy(F.desc("score"), F.asc("a"))
    top5 = (
        pairs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= 5)
        .drop("__rk")
    )
    st = stable_matching(top5, rounds=12)
    return st.filter(F.col("a").isNotNull()).select(
        "p", "ptr", F.col("a").alias("matched_id"), "s"
    )


STABLE_MATCH_SQL = """
WITH RECURSIVE ca AS (
  SELECT c_custkey AS id, c_nationkey AS nat, c_mktsegment AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
  FROM customer WHERE c_custkey % 5 = 0
),
cb AS (
  SELECT c_custkey AS id,
         CASE WHEN c_custkey % 7 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS nat,
         CASE WHEN c_custkey % 3 = 0 THEN 'PERTURBED'
              ELSE c_mktsegment END AS seg,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
           + CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS bal_cents
  FROM customer
),
pr AS MATERIALIZED (
  SELECT p, aa, s,
         CAST(row_number() OVER (
           PARTITION BY p ORDER BY s DESC, aa ASC) AS BIGINT) AS prank
  FROM (
    SELECT ca.id AS p, cb.id AS aa,
           CAST(CASE WHEN ca.seg = cb.seg THEN 2000 ELSE 0 END
                + CASE WHEN ca.bal_cents = cb.bal_cents THEN 1000 ELSE 0 END
                - (ca.id + cb.id) % 997 AS BIGINT) AS s
    FROM ca JOIN cb ON ca.nat = cb.nat
  )
  QUALIFY prank <= 5
),
st AS (
  SELECT 0 AS r, p, CAST(0 AS BIGINT) AS ptr,
         CAST(NULL AS BIGINT) AS a, CAST(NULL AS BIGINT) AS s
  FROM (SELECT DISTINCT p FROM pr)
  UNION ALL
  SELECT r + 1, p,
         CASE WHEN ca IS NULL OR rn = 1 THEN ptr ELSE ptr + 1 END,
         CASE WHEN ca IS NOT NULL AND rn = 1 THEN ca END,
         CASE WHEN ca IS NOT NULL AND rn = 1 THEN cs END
  FROM (
    SELECT st.r, st.p, st.ptr,
           coalesce(st.a, pr.aa) AS ca,
           coalesce(st.s, pr.s) AS cs,
           row_number() OVER (PARTITION BY coalesce(st.a, pr.aa)
                              ORDER BY coalesce(st.s, pr.s) DESC,
                                       st.p ASC) AS rn
    FROM st LEFT JOIN pr ON st.a IS NULL AND pr.p = st.p
                         AND pr.prank = st.ptr + 1
    WHERE st.r < 12
  )
)
SELECT p, ptr, a AS matched_id, s FROM st WHERE r = 12 AND a IS NOT NULL
"""



# ---------------------------------------------------------------------------
# Q: robust/forensic stats — trimmed means, Gini concentration, Benford
# ---------------------------------------------------------------------------


def q_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means of event cents per type beside
    the raw mean — the heavy-tail-resistant location trio."""
    from .operators.classifier import trimmed_stats

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return trimmed_stats(ev, "event_type", "cents", 1, 10).select(
        F.col("key").alias("event_type"), "n", "k_trim", "mean_x1e6",
        "trimmed_mean_x1e6", "winsor_mean_x1e6",
    )


ROBUST_MEANS_SQL = """
WITH base AS (
  SELECT event_type AS key,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
ranked AS (
  SELECT key, v,
         CAST(row_number() OVER (PARTITION BY key ORDER BY v ASC) AS BIGINT)
           AS rn,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS n
  FROM base
),
kd AS (SELECT *, n * 1 // 10 AS k FROM ranked),
agg AS (
  SELECT key, max(n) AS n, max(k) AS k_trim,
         CAST(sum(v) AS BIGINT) AS s,
         CAST(sum(CASE WHEN rn > k AND rn <= n - k THEN v ELSE 0 END)
              AS BIGINT) AS ts,
         max(CASE WHEN rn = k + 1 THEN v END) AS vlo,
         max(CASE WHEN rn = n - k THEN v END) AS vhi
  FROM kd GROUP BY key
)
SELECT key AS event_type, n, k_trim,
       CAST(s // n * 1000000 + s % n * 1000000 // n AS BIGINT) AS mean_x1e6,
       CAST(ts // greatest(n - 2 * k_trim, 1) * 1000000
            + ts % greatest(n - 2 * k_trim, 1) * 1000000
              // greatest(n - 2 * k_trim, 1) AS BIGINT) AS trimmed_mean_x1e6,
       CAST((ts + k_trim * (vlo + vhi)) // n * 1000000
            + (ts + k_trim * (vlo + vhi)) % n * 1000000 // n AS BIGINT)
         AS winsor_mean_x1e6
FROM agg
"""


def q_gini_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of per-user event counts within each type —
    the is-my-traffic-a-few-whales readout (0 = even, ->1 = one user)."""
    from .operators.classifier import gini_coefficient

    per = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return gini_coefficient(per, "event_type", "c").select(
        F.col("key").alias("event_type"), "n", "total", "gini_x1e6"
    )


GINI_USER_ACTIVITY_SQL = """
WITH per AS (
  SELECT event_type AS key, user_id, CAST(count(*) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT key, v,
         CAST(row_number() OVER (PARTITION BY key ORDER BY v ASC) AS BIGINT)
           AS rn
  FROM per
),
agg AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS total,
         CAST(sum(rn * v) AS BIGINT) AS ix
  FROM ranked GROUP BY key
)
SELECT key AS event_type, n, total,
       CAST(CASE WHEN total > 0 THEN
         (2 * ix - (n + 1) * total) // (n * total) * 1000000
         + (2 * ix - (n + 1) * total) % (n * total) * 1000000 // (n * total)
         ELSE 0 END AS BIGINT) AS gini_x1e6
FROM agg
"""


def q_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen on two populations of this SYNTHETIC
    corpus: order totals in cents ('prices', chi2_x1000=5865 at sf0.01 —
    a narrow price band concentrates leading digits) and the sequential
    'keys' population (2334). BOTH fail, which is the honest forensic
    readout: generated data screams non-natural — exactly what the
    screen exists to flag; naturally-grown multiplicative amounts would
    read near 0. chi2_x1000 repeats on each digit row."""
    from .operators.classifier import benford_profile

    o = _t(spark, sf_dir, "orders")
    both = o.select(
        F.lit("prices").alias("pop"),
        F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").alias("v"),
    ).unionByName(
        o.select(
            F.lit("keys").alias("pop"),
            (F.col("o_orderkey") + 1).cast("long").alias("v"),
        )
    )
    return benford_profile(both, "pop", "v").select(
        F.col("key").alias("pop"), "digit", "observed", "n",
        "expected_permille", "chi2_x1000",
    )


BENFORD_SCREEN_SQL = """
WITH pops AS (
  SELECT 'prices' AS key,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v FROM orders
  UNION ALL
  SELECT 'keys', CAST(o_orderkey + 1 AS BIGINT) FROM orders
),
digits AS (
  SELECT key, CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM pops WHERE v > 0
),
counts AS (
  SELECT key, digit, CAST(count(*) AS BIGINT) AS observed
  FROM digits GROUP BY key, digit
),
withp AS (
  SELECT key, digit, observed,
         CAST(sum(observed) OVER (PARTITION BY key) AS BIGINT) AS n,
         CAST(([301, 176, 125, 97, 79, 67, 58, 51, 46])[CAST(digit AS INT)]
              AS BIGINT) AS expected_permille
  FROM counts
),
terms AS (
  SELECT *,
         (1000 * observed - n * expected_permille)
           * (1000 * observed - n * expected_permille)
           // (1000 * n * expected_permille) AS term
  FROM withp
)
SELECT key AS pop, digit, observed, n, expected_permille,
       CAST(sum(term) OVER (PARTITION BY key) AS BIGINT) AS chi2_x1000
FROM terms
"""



# ---------------------------------------------------------------------------
# Q: URL canonicalization — crawl-dedup collapse readout per domain
# ---------------------------------------------------------------------------

_URL_FIXTURE = (
    "CASE c_custkey % 5"
    " WHEN 0 THEN concat('https://', upper(concat('www.',"
    "   lower(c_mktsegment), '.com')), ':443/c/',"
    "   CAST(c_custkey DIV 7 AS STRING), '/?utm_source=a&b=2&a=1#x')"
    " WHEN 1 THEN concat('https://www.', lower(c_mktsegment), '.com/c/',"
    "   CAST(c_custkey DIV 7 AS STRING), '?a=1&b=2')"
    " WHEN 2 THEN concat('HTTP://www.', lower(c_mktsegment), '.com:80/c/',"
    "   CAST(c_custkey DIV 7 AS STRING))"
    " WHEN 3 THEN concat('http://www.', lower(c_mktsegment), '.com/c/',"
    "   CAST(c_custkey DIV 7 AS STRING))"
    " ELSE concat('bare-text-', CAST(c_custkey AS STRING)) END"
)


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl canonicalization collapse: five URL disguises of the same
    pages (case, default ports, fragments, tracking params, param order,
    trailing slashes) built deterministically per customer; after
    normalize_urls, raw-distinct collapses toward norm-distinct per
    domain — the under-counted-dedup readout. Non-URL rows pass through
    flagged."""
    from .operators.text import normalize_urls

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.expr(_URL_FIXTURE).alias("url")
    )
    n = normalize_urls(c)
    return (
        n.groupBy("is_url", "domain")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.countDistinct("url").cast("long").alias("n_raw_distinct"),
            F.countDistinct("url_norm").cast("long").alias("n_norm_distinct"),
        )
    )


URL_DEDUP_SQL = """
WITH src AS (
  SELECT c_custkey,
         CASE c_custkey % 5
           WHEN 0 THEN 'https://' || upper('www.' || lower(c_mktsegment)
             || '.com') || ':443/c/' || CAST(c_custkey // 7 AS VARCHAR)
             || '/?utm_source=a&b=2&a=1#x'
           WHEN 1 THEN 'https://www.' || lower(c_mktsegment) || '.com/c/'
             || CAST(c_custkey // 7 AS VARCHAR) || '?a=1&b=2'
           WHEN 2 THEN 'HTTP://www.' || lower(c_mktsegment) || '.com:80/c/'
             || CAST(c_custkey // 7 AS VARCHAR)
           WHEN 3 THEN 'http://www.' || lower(c_mktsegment) || '.com/c/'
             || CAST(c_custkey // 7 AS VARCHAR)
           ELSE 'bare-text-' || CAST(c_custkey AS VARCHAR) END AS url
  FROM customer
),
parsed AS (
  SELECT url, instr(url, '://') > 0 AS is_url,
         lower(string_split(url, '://')[1]) AS scheme,
         string_split(url, '://')[2] AS rest0
  FROM src
),
s2 AS (
  SELECT *, string_split(rest0, '#')[1] AS defrag FROM parsed
),
s3 AS (
  SELECT *, lower(string_split(defrag, '/')[1]) AS hostport FROM s2
),
s4 AS (
  SELECT *,
         CASE WHEN scheme = 'http'
                   AND substr(hostport, len(hostport) - 2, 3) = ':80'
              THEN substr(hostport, 1, len(hostport) - 3)
              WHEN scheme = 'https'
                   AND substr(hostport, len(hostport) - 3, 4) = ':443'
              THEN substr(hostport, 1, len(hostport) - 4)
              ELSE hostport END AS host,
         substr(defrag, len(string_split(defrag, '/')[1]) + 1) AS pathq
  FROM s3
),
s5 AS (
  SELECT *, string_split(pathq, '?')[1] AS path0,
         list_sort(list_filter(
           string_split(coalesce(string_split(pathq, '?')[2], ''), '&'),
           p -> p <> '' AND NOT (substr(p, 1, 4) = 'utm_'
                OR substr(p, 1, 6) = 'fbclid' OR substr(p, 1, 5) = 'gclid'
                OR substr(p, 1, 3) = 'ref'))) AS params
  FROM s4
),
s6 AS (
  SELECT *,
         CASE WHEN path0 = '' OR path0 IS NULL THEN '/'
              WHEN len(path0) > 1 AND substr(path0, len(path0), 1) = '/'
              THEN substr(path0, 1, len(path0) - 1)
              ELSE path0 END AS path
  FROM s5
),
normed AS (
  SELECT url, is_url,
         CASE WHEN is_url THEN scheme || '://' || host || path
              || CASE WHEN len(params) > 0
                 THEN '?' || array_to_string(params, '&') ELSE '' END
              ELSE url END AS url_norm,
         CASE WHEN is_url THEN array_to_string(
           (string_split(host, '.'))[
             greatest(len(string_split(host, '.')) - 1, 1) :
             greatest(len(string_split(host, '.')) - 1, 1) + 1], '.')
         END AS domain
  FROM s6
)
SELECT is_url, domain,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_distinct,
       CAST(count(DISTINCT url_norm) AS BIGINT) AS n_norm_distinct
FROM normed GROUP BY is_url, domain
"""



# ---------------------------------------------------------------------------
# Q: Welch's t-test per event type between user-parity groups
# ---------------------------------------------------------------------------


def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample screen per event type: odd-user 'purchase'
    amounts carry a planted +20.00 shift; its t2_log2_x16 reads far
    above 31 (~16*log2(3.84)) while parity splits of untouched types
    calibrate the null — the one-pass parametric companion to the exact
    permutation test."""
    from .operators.classifier import welch_t

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr(
            "CAST(floor(value * 100 + 0.5) AS BIGINT)"
            " + CASE WHEN event_type = 'purchase' AND user_id % 2 = 1"
            " THEN 2000 ELSE 0 END"
        ).alias("cents"),
    )
    return welch_t(ev, "event_type", "g", "cents").select(
        F.col("key").alias("event_type"), "n0", "n1", "mean0_x1e6",
        "mean1_x1e6", "d_x1e6", "t2_log2_x16",
    )


def _welch_sql() -> str:
    def stage(a: str, t: str, k: str) -> str:
        return f"(({a}) // ({t}) * {k} + ({a}) % ({t}) * {k} // ({t}))"

    m0 = stage("s0", "n0", "1000000")
    m1 = stage("s1", "n1", "1000000")
    d0 = stage("(n0 * q0 - s0 * s0)", "(n0 * n0 * (n0 - 1))", "1000000")
    d1 = stage("(n1 * q1 - s1 * s1)", "(n1 * n1 * (n1 - 1))", "1000000")
    t2 = (
        f"2 * {_duck_msb16(f'abs(({m1}) - ({m0}))')}"
        f" - {_duck_msb16(f'greatest(({d0}) + ({d1}), CAST(1 AS BIGINT))')}"
        " - 320"
    )
    ok = (
        "n0 >= 2 AND n1 >= 2"
        " AND (n0 * q0 - s0 * s0) + (n1 * q1 - s1 * s1) > 0"
    )
    return f"""
WITH base AS (
  SELECT event_type AS key, CAST(user_id % 2 AS BIGINT) AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT)
           + CASE WHEN event_type = 'purchase' AND user_id % 2 = 1
             THEN 2000 ELSE 0 END AS v
  FROM events
),
agg AS (
  SELECT key,
         CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN g = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
         CAST(sum(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT) AS s1,
         CAST(sum(CASE WHEN g = 0 THEN v * v ELSE 0 END) AS BIGINT) AS q0,
         CAST(sum(CASE WHEN g = 1 THEN v * v ELSE 0 END) AS BIGINT) AS q1
  FROM base GROUP BY key
)
SELECT key AS event_type, n0, n1,
       CAST({m0} AS BIGINT) AS mean0_x1e6,
       CAST({m1} AS BIGINT) AS mean1_x1e6,
       CAST(({m1}) - ({m0}) AS BIGINT) AS d_x1e6,
       CASE WHEN {ok} THEN CAST({t2} AS BIGINT) END AS t2_log2_x16
FROM agg
"""


WELCH_T_SQL = _welch_sql()



# ---------------------------------------------------------------------------
# Q: KL / Jensen-Shannon categorical drift per user cohort
# ---------------------------------------------------------------------------


def q_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL/JS drift per user cohort (user_id % 4) between the first 75%
    of events (reference) and the last 25% (current): cohort 0's late
    events are all relabeled 'error' — its type distribution collapses
    and kl/js spike while untouched cohorts calibrate near 0. The
    information-theoretic drift pair beside ks/w1/tvd."""
    from .operators.classifier import categorical_drift_kl

    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("event_id").cast("long").alias("__mx"))
    base = ev.crossJoin(F.broadcast(mx)).select(
        F.expr("CAST(user_id % 4 AS BIGINT)").alias("cohort"),
        F.expr(
            "CASE WHEN user_id % 4 = 0 AND event_id > __mx * 3 DIV 4"
            " THEN 'error' ELSE event_type END"
        ).alias("cat"),
        F.expr(
            "CASE WHEN event_id > __mx * 3 DIV 4 THEN 1 ELSE 0 END"
        ).alias("side"),
    )
    return categorical_drift_kl(base, "cohort", "cat", "side").select(
        F.col("key").alias("cohort"), "v_support", "n_ref", "n_cur",
        "kl_pq_x16e3", "kl_qp_x16e3", "js_x16e3",
    )


def _kl_drift_sql() -> str:
    t_pq = f"({_duck_msb16('(a * 1048576 // aa) * bb // b')} - 320)"
    t_qp = f"({_duck_msb16('(b * 1048576 // bb) * aa // a')} - 320)"
    t_pm = f"({_duck_msb16('(2 * a * bb * 1048576) // (a * bb + b * aa)')} - 320)"
    t_qm = f"({_duck_msb16('(2 * b * aa * 1048576) // (a * bb + b * aa)')} - 320)"

    def stage(a: str, t: str) -> str:
        return f"(({a}) // ({t}) * 1000 + ({a}) % ({t}) * 1000 // ({t}))"

    return f"""
WITH mx AS (SELECT CAST(max(event_id) AS BIGINT) AS m FROM events),
base AS (
  SELECT CAST(user_id % 4 AS BIGINT) AS key,
         CASE WHEN user_id % 4 = 0
                   AND event_id > (SELECT m FROM mx) * 3 // 4
              THEN 'error' ELSE event_type END AS cat,
         CASE WHEN event_id > (SELECT m FROM mx) * 3 // 4
              THEN 1 ELSE 0 END AS side
  FROM events
),
counts AS (
  SELECT key, cat,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cq
  FROM base GROUP BY key, cat
),
wc AS (
  SELECT key, cp + 1 AS a, cq + 1 AS b,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS v,
         CAST(sum(cp) OVER (PARTITION BY key) AS BIGINT) AS np,
         CAST(sum(cq) OVER (PARTITION BY key) AS BIGINT) AS nq
  FROM counts
),
wc2 AS (SELECT *, np + v AS aa, nq + v AS bb FROM wc),
terms AS (
  SELECT key, v, np, nq, aa, bb,
         a * {t_pq} AS spq, b * {t_qp} AS sqp,
         a * {t_pm} AS spm, b * {t_qm} AS sqm
  FROM wc2
),
agg AS (
  SELECT key, max(v) AS v_support, max(np) AS n_ref, max(nq) AS n_cur,
         max(aa) AS aa, max(bb) AS bb,
         CAST(sum(spq) AS BIGINT) AS pq, CAST(sum(sqp) AS BIGINT) AS qp,
         CAST(sum(spm) AS BIGINT) AS pm, CAST(sum(sqm) AS BIGINT) AS qm
  FROM terms GROUP BY key
)
SELECT key AS cohort, v_support, n_ref, n_cur,
       CAST({stage('pq', 'aa')} AS BIGINT) AS kl_pq_x16e3,
       CAST({stage('qp', 'bb')} AS BIGINT) AS kl_qp_x16e3,
       CAST(({stage('pm', 'aa')} + {stage('qm', 'bb')}) // 2 AS BIGINT)
         AS js_x16e3
FROM agg
"""


KL_DRIFT_SQL = _kl_drift_sql()



# ---------------------------------------------------------------------------
# Q: Hill tail-index contrast — Pareto-by-construction vs bounded values
# ---------------------------------------------------------------------------


def q_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator (k=50) on two populations: 'pareto' =
    1e6 DIV (1 + custkey % 1000) — the inverse-uniform construction IS
    Pareto(alpha=1), so alpha_x1e3 reads ~1000 — vs the bounded
    'balances' population whose truncated tail reads a much larger
    alpha. The is-my-metric-heavy-tailed readout behind every skew
    mitigation in this repo."""
    from .operators.temporal import hill_tail_index

    c = _t(spark, sf_dir, "customer")
    pops = c.select(
        F.lit("pareto").alias("pop"),
        F.expr("CAST(1000000 DIV (1 + c_custkey % 1000) AS BIGINT)").alias(
            "v"
        ),
    ).unionByName(
        c.select(
            F.lit("balances").alias("pop"),
            F.expr("CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)").alias("v"),
        )
    )
    return hill_tail_index(pops, "pop", "v", k=50).select(
        F.col("key").alias("pop"), "k", "x_k1", "hill_log2_x16e3",
        "alpha_x1e3",
    )


HILL_TAIL_SQL = f"""
WITH pops AS (
  SELECT 'pareto' AS key,
         CAST(1000000 // (1 + c_custkey % 1000) AS BIGINT) AS v
  FROM customer
  UNION ALL
  SELECT 'balances', CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
  FROM customer
),
pos AS (SELECT key, v FROM pops WHERE v > 0),
topk AS (
  SELECT key, v,
         CAST(row_number() OVER (PARTITION BY key ORDER BY v DESC)
              AS BIGINT) AS rn
  FROM pos QUALIFY rn <= 51
),
wk AS (
  SELECT key, v, rn,
         CAST(min(v) OVER (PARTITION BY key) AS BIGINT) AS x_k1,
         CAST(count(*) OVER (PARTITION BY key) AS BIGINT) AS nk
  FROM topk
),
agg AS (
  SELECT key, max(x_k1) AS x_k1,
         CAST(sum({_duck_msb16('v * 1048576 // x_k1')} - 320) AS BIGINT) AS s
  FROM wk WHERE nk = 51 AND rn <= 50 GROUP BY key
)
SELECT key AS pop, CAST(50 AS BIGINT) AS k, x_k1,
       CAST(s // 50 * 1000 + s % 50 * 1000 // 50 AS BIGINT)
         AS hill_log2_x16e3,
       CAST(23083000 // greatest(s // 50 * 1000 + s % 50 * 1000 // 50,
                                 CAST(1 AS BIGINT)) AS BIGINT) AS alpha_x1e3
FROM agg
"""



# ---------------------------------------------------------------------------
# Q: Bradley-Terry strengths from consecutive-event duels
# ---------------------------------------------------------------------------


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arena-style BT leaderboard over event types: consecutive events
    of each user duel, the larger PLANTED-effective cents wins
    (purchase +30.00, click +15.00 — so the true dominance order is
    purchase > click > rest), exact ties skipped; strengths from 2
    pinned MM rounds, mean-normalized to 1e6."""
    from pyspark.sql import Window

    from .operators.classifier import bradley_terry

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr(
            "CAST(floor(value * 100 + 0.5) AS BIGINT)"
            " + CASE event_type WHEN 'purchase' THEN 3000"
            " WHEN 'click' THEN 1500 ELSE 0 END"
        ).alias("eff"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    duels = (
        ev.withColumn("p_type", F.lag("event_type").over(w))
        .withColumn("p_eff", F.lag("eff").over(w))
        .filter(
            F.col("p_type").isNotNull() & (F.col("eff") != F.col("p_eff"))
        )
        .select(
            F.expr(
                "CASE WHEN eff > p_eff THEN event_type ELSE p_type END"
            ).alias("a"),
            F.expr(
                "CASE WHEN eff > p_eff THEN p_type ELSE event_type END"
            ).alias("b"),
        )
    )
    wins = duels.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    return bradley_terry(wins, rounds=2)


BRADLEY_TERRY_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT)
           + CASE event_type WHEN 'purchase' THEN 3000
             WHEN 'click' THEN 1500 ELSE 0 END AS eff
  FROM events
),
lagged AS (
  SELECT *,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
           AS p_type,
         lag(eff) OVER (PARTITION BY user_id ORDER BY event_id) AS p_eff
  FROM ev
),
duels AS (
  SELECT CASE WHEN eff > p_eff THEN event_type ELSE p_type END AS a,
         CASE WHEN eff > p_eff THEN p_type ELSE event_type END AS b
  FROM lagged WHERE p_type IS NOT NULL AND eff <> p_eff
),
wd AS (SELECT a, b, CAST(count(*) AS BIGINT) AS w FROM duels GROUP BY a, b),
sym AS (
  SELECT a, b, CAST(sum(w) AS BIGINT) AS w_ab FROM (
    SELECT a, b, w FROM wd
    UNION ALL SELECT b AS a, a AS b, 0 AS w FROM wd
  ) GROUP BY a, b
),
pairs AS (
  SELECT x.a, x.b, x.w_ab, x.w_ab + y.w_ab AS n_ab
  FROM sym x JOIN sym y ON x.a = y.b AND x.b = y.a
),
items AS (
  SELECT a, CAST(sum(w_ab) AS BIGINT) AS wins,
         CAST(sum(n_ab) AS BIGINT) AS n_comp
  FROM pairs GROUP BY a
),
ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM items),
r1t AS (
  SELECT a, CAST(sum(n_ab * CAST(1000000000000 AS BIGINT)
                    // (1000000 + 1000000)) AS BIGINT) AS denom
  FROM pairs GROUP BY a
),
r1raw AS (
  SELECT items.a, CASE WHEN denom > 0 THEN
           wins * CAST(1000000000000 AS BIGINT) // denom
         ELSE CAST(0 AS BIGINT) END AS g
  FROM items JOIN r1t USING (a)
),
r1s AS (SELECT CAST(sum(g) AS BIGINT) AS gsum FROM r1raw),
g1 AS (
  SELECT a, CASE WHEN gsum > 0 THEN
           (g * CAST(1000000 AS BIGINT) // gsum) * (SELECT n_items FROM ni)
         ELSE CAST(0 AS BIGINT) END AS g
  FROM r1raw, r1s
),
r2t AS (
  SELECT p.a, CAST(sum(p.n_ab * CAST(1000000000000 AS BIGINT)
                       // (ga.g + gb.g)) AS BIGINT) AS denom
  FROM pairs p JOIN g1 ga ON p.a = ga.a JOIN g1 gb ON p.b = gb.a
  GROUP BY p.a
),
r2raw AS (
  SELECT items.a, CASE WHEN denom > 0 THEN
           wins * CAST(1000000000000 AS BIGINT) // denom
         ELSE CAST(0 AS BIGINT) END AS g
  FROM items JOIN r2t USING (a)
),
r2s AS (SELECT CAST(sum(g) AS BIGINT) AS gsum FROM r2raw),
g2 AS (
  SELECT a, CASE WHEN gsum > 0 THEN
           (g * CAST(1000000 AS BIGINT) // gsum) * (SELECT n_items FROM ni)
         ELSE CAST(0 AS BIGINT) END AS g
  FROM r2raw, r2s
)
SELECT items.a AS item, items.wins, items.n_comp,
       CAST(g2.g AS BIGINT) AS gamma_x1e6
FROM items JOIN g2 ON items.a = g2.a
"""



# ---------------------------------------------------------------------------
# Q: Apriori frequent brand triples over order baskets
# ---------------------------------------------------------------------------


def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apriori level-3 itemsets over order baskets (order = basket, part
    brand = item): candidates only from frequent pairs sharing their
    head item with the (b,c) subset semi-checked — the pruning property
    that keeps naive triple counting from materializing; all-confidence
    ranks triples independent of brand popularity."""
    from .operators.baskets import frequent_triples

    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    b = li.join(
        F.broadcast(p.select("p_partkey", "p_brand")),
        li["l_partkey"] == p["p_partkey"],
    ).select(
        F.col("l_orderkey").alias("basket_id"), F.col("p_brand").alias("item")
    )
    return frequent_triples(b, min_support=5)


FREQUENT_TRIPLES_SQL = """
WITH base AS (
  SELECT DISTINCT l_orderkey AS bk, p_brand AS it
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
ok AS (
  SELECT bk, it FROM base
  WHERE bk IN (SELECT bk FROM base GROUP BY bk HAVING count(*) <= 64)
),
item_n AS (SELECT it, CAST(count(*) AS BIGINT) AS n_it FROM ok GROUP BY it),
pairs AS (
  SELECT x.bk, x.it AS a, y.it AS b
  FROM ok x JOIN ok y ON x.bk = y.bk AND x.it < y.it
),
fp AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
  FROM pairs GROUP BY a, b HAVING count(*) >= 5
),
cand AS (
  SELECT p.a, p.b, q.b AS c
  FROM fp p JOIN fp q ON p.a = q.a AND p.b < q.b
  WHERE EXISTS (SELECT 1 FROM fp z WHERE z.a = p.b AND z.b = q.b)
),
sup AS (
  SELECT pr.a, pr.b, cand.c, CAST(count(*) AS BIGINT) AS support
  FROM pairs pr
  JOIN cand ON pr.a = cand.a AND pr.b = cand.b
  JOIN ok oc ON oc.bk = pr.bk AND oc.it = cand.c
  GROUP BY pr.a, pr.b, cand.c HAVING count(*) >= 5
)
SELECT sup.a, sup.b, sup.c, sup.support,
       CAST(greatest(na.n_it, nb.n_it, nc.n_it) AS BIGINT) AS max_item_n,
       CAST(sup.support * CAST(1000000 AS BIGINT)
            // greatest(na.n_it, nb.n_it, nc.n_it) AS BIGINT)
         AS all_conf_x1e6
FROM sup
JOIN item_n na ON na.it = sup.a
JOIN item_n nb ON nb.it = sup.b
JOIN item_n nc ON nc.it = sup.c
"""



# ---------------------------------------------------------------------------
# Q: greedy max-coverage selection of documents by distinct 3-grams
# ---------------------------------------------------------------------------


def q_max_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pick the 5 documents whose 3-gram sets greedily cover the most of
    the corpus vocabulary — the diversity-selection pass where
    top-by-length would pick near-duplicates; marginal gains are exact
    and ties pin to the smallest doc. Oracle replays the identical
    rounds as a recursive CTE over the picked list (same zip-unnest /
    encoded-argmax devices as influence_seeds)."""
    from .operators.sampling import greedy_max_coverage

    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    sh = (
        docs.select(F.col("doc_id").alias("item"), toks.alias("__t"))
        .filter(F.size("__t") >= 3)
        .select(
            "item",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 2),"
                    " i -> concat_ws(' ', slice(__t, i, 3)))"
                )
            ).alias("element"),
        )
    )
    return greedy_max_coverage(sh, k=5)


MAX_COVERAGE_DOCS_SQL = """
WITH RECURSIVE sh AS MATERIALIZED (
  SELECT DISTINCT it, el FROM (
    SELECT doc_id AS it,
           unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
             i -> array_to_string(t[i : i + 2], ' '))) AS el
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM documents)
    WHERE len(t) >= 3
  )
),
sel AS (
  SELECT 0 AS r, CAST([] AS BIGINT[]) AS picked, CAST([] AS BIGINT[]) AS margs
  UNION ALL
  SELECT sel.r + 1,
         list_append(sel.picked, cand.bi),
         list_append(sel.margs, (cand.mk + cand.bi) // 2147483648)
  FROM sel, LATERAL (
    SELECT arg_max(it, key) AS bi, max(key) AS mk FROM (
      SELECT s.it,
             CAST(count(*) AS BIGINT) * 2147483648 - s.it AS key
      FROM sh s
      WHERE NOT list_contains(sel.picked, s.it)
        AND NOT EXISTS (SELECT 1 FROM sh s2
                        WHERE list_contains(sel.picked, s2.it)
                          AND s2.el = s.el)
      GROUP BY s.it
    )
  ) cand
  WHERE sel.r < 5
)
SELECT CAST(unnest(range(1, 6)) AS BIGINT) AS rnk,
       unnest(picked) AS item, unnest(margs) AS marginal
FROM sel WHERE r = 5
"""



# ---------------------------------------------------------------------------
# Q: TrustRank spam mass — global PR vs trusted-seed PPR on one graph
# ---------------------------------------------------------------------------


def q_spam_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TrustRank spam-mass estimate (Gyongyi, Garcia-Molina & Pedersen
    2004): how much of a node's PageRank is NOT accounted for by trust
    flowing from known-good seeds — spam_mass = (PR - min(N*TR, PR))/PR
    with TR the seed-personalized PageRank scaled by node count (both 2
    pinned rounds on the SAME symmetrized order<->customer<->nation
    graph, seeds c0/c1). Nodes near the seeds read ~0, nodes the trust
    walk cannot reach in 2 hops read 1e6 — the triage a KG ingestion
    runs before admitting a new subgraph. Final arithmetic on the
    1e6-snapped integers (the cross-engine float rule), staged quotient."""
    from .operators.graph_algos import pagerank, personalized_pagerank

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    e1 = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
    )
    e2 = cust.select(
        F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey").cast("string")).alias("dst"),
    )
    e = e1.unionByName(e2)
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    pr = pagerank(sym, damping=0.85, iterations=2).select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("pr_x1e6"),
    )
    tr = personalized_pagerank(sym, seeds=["c0", "c1"], iterations=2).select(
        "node",
        F.floor(F.col("rank") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("tr_x1e6"),
    )
    nn = sym.select(F.col("src").alias("node")).unionByName(
        sym.select(F.col("dst").alias("node"))
    ).dropDuplicates().agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        pr.join(tr, "node", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "node",
            "pr_x1e6",
            F.coalesce("tr_x1e6", F.lit(0)).cast("long").alias("tr_x1e6"),
            F.expr(
                "CASE WHEN pr_x1e6 > 0 THEN"
                " (pr_x1e6 - least(coalesce(tr_x1e6, 0) * n_nodes, pr_x1e6))"
                " * CAST(1000000 AS BIGINT) DIV pr_x1e6"
                " ELSE CAST(1000000 AS BIGINT) END"
            ).alias("spam_mass_x1e6"),
        )
    )


SPAM_MASS_SQL = """
WITH e0 AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS src,
         'c' || CAST(o_custkey AS VARCHAR) AS dst
  FROM orders
  UNION ALL
  SELECT 'c' || CAST(c_custkey AS VARCHAR),
         'n' || CAST(c_nationkey AS VARCHAR)
  FROM customer
),
e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
nodes AS (
  SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)
),
outdeg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT node, 1.0 AS r FROM nodes),
r1 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r0.r / o.d) AS m
    FROM e JOIN r0 ON r0.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
r2 AS (
  SELECT n.node, (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(s.m, CAST(0 AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r1.r / o.d) AS m
    FROM e JOIN r1 ON r1.node = e.src JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = n.node
),
seeds AS (SELECT 'c0' AS node, CAST(0.5 AS DOUBLE) AS p
          UNION ALL SELECT 'c1', CAST(0.5 AS DOUBLE)),
t0 AS (SELECT node, p AS rank FROM seeds),
tc1 AS (
  SELECT e.dst AS node, sum(r.rank / o.d) AS m
  FROM e JOIN t0 r ON e.src = r.node JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
t1 AS (
  SELECT coalesce(c.node, s.node) AS node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             * coalesce(s.p, CAST(0 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(c.m, CAST(0 AS DOUBLE)) AS rank
  FROM tc1 c FULL JOIN seeds s ON c.node = s.node
),
tc2 AS (
  SELECT e.dst AS node, sum(r.rank / o.d) AS m
  FROM e JOIN t1 r ON e.src = r.node JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
),
t2 AS (
  SELECT coalesce(c.node, s.node) AS node,
         (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE))
             * coalesce(s.p, CAST(0 AS DOUBLE))
           + CAST(0.85 AS DOUBLE) * coalesce(c.m, CAST(0 AS DOUBLE)) AS rank
  FROM tc2 c FULL JOIN seeds s ON c.node = s.node
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes),
pri AS (
  SELECT node, CAST(floor(r * 1000000 + 0.5) AS BIGINT) AS pr_x1e6 FROM r2
),
tri AS (
  SELECT node, CAST(floor(rank * 1000000 + 0.5) AS BIGINT) AS tr_x1e6 FROM t2
)
SELECT pri.node, pri.pr_x1e6,
       CAST(coalesce(tri.tr_x1e6, 0) AS BIGINT) AS tr_x1e6,
       CAST(CASE WHEN pri.pr_x1e6 > 0 THEN
         (pri.pr_x1e6 - least(coalesce(tri.tr_x1e6, 0) * nn.n_nodes,
                              pri.pr_x1e6))
         * CAST(1000000 AS BIGINT) // pri.pr_x1e6
       ELSE 1000000 END AS BIGINT) AS spam_mass_x1e6
FROM pri LEFT JOIN tri ON pri.node = tri.node CROSS JOIN nn
"""



# ---------------------------------------------------------------------------
# Q: Good-Turing count-of-counts and unseen mass over the corpus vocab
# ---------------------------------------------------------------------------


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing re-estimation over the documents vocabulary: the N_r
    table with adjusted r* = (r+1)·N_{r+1}/N_r and the unseen-mass
    N_1/N riding every row — the coverage caveat beside vocab_richness
    and zipf_slope."""
    from .operators.text import good_turing

    return good_turing(_t(spark, sf_dir, "documents"))


GOOD_TURING_SQL = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS t
  FROM documents
),
vocab AS (SELECT t, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY t),
coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM vocab GROUP BY r),
tot AS (SELECT CAST(sum(r) AS BIGINT) AS n_tokens FROM vocab),
n1 AS (SELECT CAST(coalesce(sum(n_r), 0) AS BIGINT) AS n_1
       FROM coc WHERE r = 1),
nxt AS (
  SELECT r, n_r,
         CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
              THEN lead(n_r) OVER (ORDER BY r) END AS next_nr
  FROM coc
)
SELECT r, n_r,
       CAST(CASE WHEN next_nr IS NOT NULL THEN
         (r + 1) * next_nr * CAST(1000000 AS BIGINT) // n_r
       END AS BIGINT) AS r_star_x1e6,
       CAST(n_1 * CAST(1000000 AS BIGINT) // n_tokens AS BIGINT)
         AS unseen_x1e6
FROM nxt, tot, n1
"""



# ---------------------------------------------------------------------------
# Q: chat-template rendering / context-tail truncation / regen compaction
# (transcript formatting stage of an SFT-data pipeline)
# ---------------------------------------------------------------------------


def q_chat_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-template render per conversation (dialogue.chat_render): the
    serialize-before-tokenize step; one conv_id shuffle, per-conversation
    array_sort, byte-stable strings both engines."""
    from .operators.dialogue import chat_render

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
    from .operators.dialogue import context_tail

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
    from .operators.dialogue import latest_wins_compact

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
# Q: classifier-eval family — multiclass report, naive Bayes, kNN, NDCG
# ---------------------------------------------------------------------------


def q_macro_f1_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class P/R/F1 report (classifier.multiclass_report) for the
    stopword language-id heuristic against the documents table's true
    `lang` labels: per-class rows plus __macro__/__micro__ summaries, all
    exact integer quotients. The es/zh classes are never predicted (the
    heuristic only knows en/fr/de stopwords) — exactly the
    undefined-precision case the zero_division=0 convention pins."""
    from .operators.classifier import multiclass_report
    from .operators.text import language_id

    docs = _t(spark, sf_dir, "documents")
    return multiclass_report(language_id(docs), "lang", "lang_pred")


MACRO_F1_LANGID_SQL = """
WITH words AS (
  SELECT doc_id, lang AS y, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
ratios AS (
  SELECT doc_id, 'en' AS lang,
    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
      / greatest(len(w), 1) AS ratio FROM words
  UNION ALL
  SELECT doc_id, 'fr',
    CAST(len(list_filter(w, x -> x IN ('le','la','de','et','les','des','un','une','dans','est'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
  UNION ALL
  SELECT doc_id, 'de',
    CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','von','mit','den','ein','zu'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
),
pred AS (
  SELECT doc_id, lang AS yhat FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY doc_id ORDER BY ratio DESC, lang DESC) AS rn
    FROM ratios
  ) WHERE rn = 1
),
cells AS (
  SELECT w.y, p.yhat, CAST(count(*) AS BIGINT) AS n
  FROM words w JOIN pred p USING (doc_id)
  GROUP BY w.y, p.yhat
),
classes AS (
  SELECT DISTINCT y AS cls FROM cells
  UNION
  SELECT DISTINCT yhat FROM cells
),
c_tp AS (SELECT y AS cls, n AS tpn FROM cells WHERE y = yhat),
c_pt AS (SELECT yhat AS cls, sum(n) AS pred_n FROM cells GROUP BY yhat),
c_tt AS (SELECT y AS cls, sum(n) AS true_n FROM cells GROUP BY y),
scored AS (
  SELECT c.cls,
         CAST(coalesce(tpn, 0) AS BIGINT) AS tp,
         CAST(coalesce(pred_n, 0) - coalesce(tpn, 0) AS BIGINT) AS fp,
         CAST(coalesce(true_n, 0) - coalesce(tpn, 0) AS BIGINT) AS fn,
         CAST(coalesce(tpn, 0) * 1000000
              // greatest(coalesce(pred_n, 0), 1) AS BIGINT) AS prec_x1e6,
         CAST(coalesce(tpn, 0) * 1000000
              // greatest(coalesce(true_n, 0), 1) AS BIGINT) AS rec_x1e6,
         CAST(2 * coalesce(tpn, 0) * 1000000
              // greatest(coalesce(pred_n, 0) + coalesce(true_n, 0), 1) AS BIGINT)
           AS f1_x1e6
  FROM classes c
  LEFT JOIN c_tp USING (cls) LEFT JOIN c_pt USING (cls) LEFT JOIN c_tt USING (cls)
)
SELECT cls, tp, fp, fn, prec_x1e6, rec_x1e6, f1_x1e6 FROM scored
UNION ALL
SELECT '__macro__', CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
       CAST(sum(fn) AS BIGINT),
       CAST(sum(prec_x1e6) // count(*) AS BIGINT),
       CAST(sum(rec_x1e6) // count(*) AS BIGINT),
       CAST(sum(f1_x1e6) // count(*) AS BIGINT)
FROM scored
UNION ALL
SELECT '__micro__', CAST(sum(tp) AS BIGINT), CAST(sum(fp) AS BIGINT),
       CAST(sum(fn) AS BIGINT),
       CAST(sum(tp) * 1000000 // greatest(sum(tp) + sum(fp), 1) AS BIGINT),
       CAST(sum(tp) * 1000000 // greatest(sum(tp) + sum(fn), 1) AS BIGINT),
       CAST(2 * sum(tp) * 1000000
            // greatest(2 * sum(tp) + sum(fp) + sum(fn), 1) AS BIGINT)
FROM scored
"""


def q_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier
    (classifier.multinomial_nb): add-1-smoothed per-(class, token) msb16
    log-weights trained on doc_id % 5 != 0, argmax-scored on the held-out
    fifth — pure-integer log arithmetic end to end."""
    from .operators.classifier import multinomial_nb

    return multinomial_nb(
        _t(spark, sf_dir, "documents"), label_col="lang", test_mod=5
    )


def _nb_lang_sql() -> str:
    prior = _duck_msb16("docs_c * 1048576 // dt")
    default = _duck_msb16("1048576 // (n_c + v)")
    term = _duck_msb16("(cnt + 1) * 1048576 // (n_c + v)")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, lang AS cls,
         unnest(list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS tok
  FROM documents
),
train AS (SELECT * FROM toks WHERE id % 5 <> 0),
test AS (SELECT id, tok FROM toks WHERE id % 5 = 0),
cnt_ct AS (SELECT cls, tok, CAST(count(*) AS BIGINT) AS cnt
           FROM train GROUP BY cls, tok),
nc AS (SELECT cls, CAST(sum(cnt) AS BIGINT) AS n_c FROM cnt_ct GROUP BY cls),
vv AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v FROM train),
tdocs AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS docs_c
          FROM documents WHERE doc_id % 5 <> 0 GROUP BY lang),
dtot AS (SELECT CAST(sum(docs_c) AS BIGINT) AS dt FROM tdocs),
class_tbl AS (
  SELECT nc.cls,
         CAST({prior} AS BIGINT) AS prior_x16,
         CAST({default} AS BIGINT) AS default_x16
  FROM nc JOIN tdocs USING (cls), vv, dtot
),
model AS (
  SELECT cnt_ct.cls, tok, CAST({term} AS BIGINT) AS term_x16
  FROM cnt_ct JOIN nc USING (cls), vv
),
scored AS (
  SELECT t.id, ct.cls,
         sum(coalesce(m.term_x16, ct.default_x16)) + max(ct.prior_x16)
           AS score_x16
  FROM test t CROSS JOIN class_tbl ct
  LEFT JOIN model m ON m.cls = ct.cls AND m.tok = t.tok
  GROUP BY t.id, ct.cls
),
pred AS (
  SELECT id, cls AS pred_cls, score_x16 FROM (
    SELECT *, row_number() OVER (PARTITION BY id
                                 ORDER BY score_x16 DESC, cls ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT d.doc_id, d.lang AS true_cls, p.pred_cls,
       CAST(p.score_x16 AS BIGINT) AS score_x16,
       CAST(CASE WHEN d.lang = p.pred_cls THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM documents d JOIN pred p ON p.id = d.doc_id
WHERE d.doc_id % 5 = 0
"""


NB_LANG_SQL = _nb_lang_sql()


def q_knn_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote label prediction over int8-quantized embeddings
    (similarity.knn_classify): signed-r² pure-integer cosine ordering,
    vec_id % 10 held out, packed-vote argmax with smallest-label
    tie-break. Brute-force exactness baseline; LSH/IVF candidate
    generation is the drop-in 100 TB path."""
    from .operators.similarity import knn_classify

    return knn_classify(_t(spark, sf_dir, "embeddings"), k=5, test_mod=10)


KNN_VOTE_SQL = """
WITH emb AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
             FROM embeddings),
qz AS (
  SELECT vec_id, label,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x * 127.0 / list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER))
         END AS q
  FROM emb
),
test AS (SELECT vec_id AS tid, CAST(label AS BIGINT) AS true_lbl, q AS tq
         FROM qz WHERE vec_id % 10 = 0),
train AS (SELECT vec_id AS cid, CAST(label AS BIGINT) AS clbl, q,
                 CAST(list_sum(list_transform(q, x -> CAST(x AS BIGINT) * CAST(x AS BIGINT))) AS BIGINT) AS cnorm
          FROM qz WHERE vec_id % 10 <> 0),
keyed AS (
  SELECT tid, true_lbl, cid, clbl,
         CASE WHEN d >= 0 THEN (d * d * 1000000) // greatest(cnorm, 1)
              ELSE -((d * d * 1000000) // greatest(cnorm, 1)) END AS rk
  FROM (
    SELECT t.tid, t.true_lbl, c.cid, c.clbl, c.cnorm,
           CAST(list_sum(list_transform(list_zip(c.q, t.tq), x -> CAST(x[1] AS BIGINT) * CAST(x[2] AS BIGINT))) AS BIGINT) AS d
    FROM train c CROSS JOIN test t
  )
),
top AS (
  SELECT tid, true_lbl, clbl FROM (
    SELECT tid, true_lbl, clbl,
           row_number() OVER (PARTITION BY tid ORDER BY rk DESC, cid ASC) AS rn
    FROM keyed
  ) WHERE rn <= 5
),
votes AS (SELECT tid, true_lbl, clbl, CAST(count(*) AS BIGINT) AS cnt
          FROM top GROUP BY tid, true_lbl, clbl),
best AS (SELECT tid, true_lbl, max(cnt * 16 + (15 - clbl)) AS vk
         FROM votes GROUP BY tid, true_lbl)
SELECT tid AS vec_id, true_lbl AS true_label,
       CAST(15 - (vk % 16) AS BIGINT) AS pred_label,
       CAST(vk // 16 AS BIGINT) AS n_votes,
       CAST(CASE WHEN true_lbl = 15 - (vk % 16) THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM best
"""


def q_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the BM25 run for "fast join vector" judged by graded
    term-coverage relevance (grade = distinct query terms present;
    retrieval.ndcg_at_k): msb16-quantized integer discounts shared by
    both engines — the discount table is part of the metric's contract,
    so dcg/idcg/ndcg are exact integers."""
    from .operators.retrieval import bm25_search, build_inverted_index, ndcg_at_k

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs).localCheckpoint(eager=True)
    ranked = bm25_search(index, docs, "fast join vector", k=10).select(
        "doc_id", "rank"
    )
    grades = (
        index.filter(F.col("term").isin(["fast", "join", "vector"]))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("grade"))
    )
    return ndcg_at_k(ranked, grades, k=10)


def _ndcg_bm25_sql() -> str:
    disc_r = _duck_msb16("r.rank + 1")
    disc_i = _duck_msb16("rank + 1")
    return f"""
WITH ranked AS ({BM25_SQL}),
toks2 AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
  FROM documents
),
grades AS (
  SELECT doc_id, CAST(count(DISTINCT term) AS BIGINT) AS grade
  FROM toks2 WHERE term IN ('fast', 'join', 'vector') GROUP BY doc_id
),
dcg AS (
  SELECT CAST(sum(coalesce(g.grade, 0) * 16777216 // {disc_r}) AS BIGINT)
           AS dcg_x
  FROM ranked r LEFT JOIN grades g USING (doc_id)
  WHERE r.rank <= 10
),
ideal AS (
  SELECT grade, row_number() OVER (ORDER BY grade DESC, doc_id ASC) AS rank
  FROM grades ORDER BY grade DESC, doc_id ASC LIMIT 10
),
idcg AS (
  SELECT CAST(sum(grade * 16777216 // {disc_i}) AS BIGINT) AS idcg_x FROM ideal
)
SELECT CAST(10 AS BIGINT) AS k,
       coalesce(dcg_x, 0) AS dcg_x,
       coalesce(idcg_x, 0) AS idcg_x,
       CAST(coalesce(dcg_x, 0) * 1000000
            // greatest(coalesce(idcg_x, 0), 1) AS BIGINT) AS ndcg_x1e6
FROM dcg, idcg
"""


NDCG_BM25_SQL = _ndcg_bm25_sql()


# ---------------------------------------------------------------------------
# Q: eigenvector centrality / MMR re-rank / Heaps'-law vocabulary growth
# ---------------------------------------------------------------------------


def q_eigencentrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round max-normalized integer power iteration
    (graph_algos.eigenvector_centrality) over the symmetrized
    user<->event-type bipartite graph — the handful of event-type hub
    nodes dominate, exactly the shape eigenvector centrality surfaces."""
    from .operators.graph_algos import eigenvector_centrality

    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("a"),
        F.concat(F.lit("t"), F.col("event_type")).alias("bb"),
    ).distinct()
    edges = b.select(F.col("a").alias("src"), F.col("bb").alias("dst")).union(
        b.select(F.col("bb").alias("src"), F.col("a").alias("dst"))
    )
    return eigenvector_centrality(edges, rounds=3)


EIGENCENTRALITY_SQL = """
WITH b AS (SELECT DISTINCT 'u' || CAST(user_id AS VARCHAR) AS a,
                  't' || event_type AS bb
           FROM events),
edges AS (SELECT a AS src, bb AS dst FROM b
          UNION ALL SELECT bb, a FROM b),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS (SELECT node, CAST(1048576 AS BIGINT) AS score FROM nodes),
s1 AS (SELECT e.dst AS node, CAST(sum(r.score) AS BIGINT) AS s
       FROM edges e JOIN r0 r ON r.node = e.src GROUP BY e.dst),
n1 AS (SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS s
       FROM nodes n LEFT JOIN s1 s USING (node)),
m1 AS (SELECT max(s) AS mx FROM n1),
r1 AS (SELECT node, CAST(s * 1048576 // greatest(mx, 1) AS BIGINT) AS score
       FROM n1, m1),
s2 AS (SELECT e.dst AS node, CAST(sum(r.score) AS BIGINT) AS s
       FROM edges e JOIN r1 r ON r.node = e.src GROUP BY e.dst),
n2 AS (SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS s
       FROM nodes n LEFT JOIN s2 s USING (node)),
m2 AS (SELECT max(s) AS mx FROM n2),
r2 AS (SELECT node, CAST(s * 1048576 // greatest(mx, 1) AS BIGINT) AS score
       FROM n2, m2),
s3 AS (SELECT e.dst AS node, CAST(sum(r.score) AS BIGINT) AS s
       FROM edges e JOIN r2 r ON r.node = e.src GROUP BY e.dst),
n3 AS (SELECT n.node, CAST(coalesce(s.s, 0) AS BIGINT) AS s
       FROM nodes n LEFT JOIN s3 s USING (node)),
m3 AS (SELECT max(s) AS mx FROM n3)
SELECT node, CAST(s * 1048576 // greatest(mx, 1) AS BIGINT) AS score
FROM n3, m3
"""


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (sampling.mmr_rerank, λ=7/10) of the 20
    longest documents: relevance = max-normalized n_chars, similarity =
    3-gram shingle Jaccard — max_coverage's pairwise-similarity sibling,
    oracle replayed as the same recursive-CTE greedy."""
    from .operators.sampling import mmr_rerank

    docs = _t(spark, sf_dir, "documents")
    top = (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(20)
        .select("doc_id", "n_chars", "text")
        .localCheckpoint(eager=True)
    )
    mx = top.agg(F.max("n_chars").alias("mx"))
    items = top.crossJoin(F.broadcast(mx)).select(
        F.col("doc_id").alias("item"),
        F.expr("n_chars * 1000000 DIV mx").alias("rel_x1e6"),
    )
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != F.lit(""))
    sh = (
        top.select(F.col("doc_id").alias("id"), toks.alias("__t"))
        .filter(F.size("__t") >= 3)
        .select(
            "id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(__t) - 2),"
                    " i -> concat_ws(' ', slice(__t, i, 3)))"
                )
            ).alias("el"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "el")
        .filter(F.col("x.id") != F.col("y.id"))
        .groupBy(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    sims = (
        inter.join(
            sizes.select(F.col("id").alias("a"), F.col("sz").alias("sa")), "a"
        )
        .join(
            sizes.select(F.col("id").alias("b"), F.col("sz").alias("sb")), "b"
        )
        .select(
            "a", "b", F.expr("ix * 1000000 DIV (sa + sb - ix)").alias("sim_x1e6")
        )
    )
    return mmr_rerank(items, sims, k=5)


MMR_RERANK_SQL = """
WITH RECURSIVE top20 AS MATERIALIZED (
  SELECT doc_id, n_chars, text FROM documents
  ORDER BY n_chars DESC, doc_id ASC LIMIT 20
),
mx AS (SELECT max(n_chars) AS mx FROM top20),
items AS MATERIALIZED (
  SELECT doc_id AS it, CAST(n_chars * 1000000 // mx AS BIGINT) AS rel_x
  FROM top20, mx
),
sh AS MATERIALIZED (
  SELECT DISTINCT id, el FROM (
    SELECT doc_id AS id,
           unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
             i -> array_to_string(t[i : i + 2], ' '))) AS el
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '), x -> x <> '') AS t
          FROM top20)
    WHERE len(t) >= 3
  )
),
sizes AS (SELECT id, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY id),
sims AS MATERIALIZED (
  SELECT x.id AS a, y.id AS b,
         CAST(count(*) * 1000000 // (sa.sz + sb.sz - count(*)) AS BIGINT)
           AS sim
  FROM sh x JOIN sh y ON x.el = y.el AND x.id <> y.id
  JOIN sizes sa ON sa.id = x.id JOIN sizes sb ON sb.id = y.id
  GROUP BY x.id, y.id, sa.sz, sb.sz
),
sel AS (
  SELECT 0 AS r, CAST([] AS BIGINT[]) AS picked, CAST([] AS BIGINT[]) AS scores
  UNION ALL
  SELECT sel.r + 1,
         list_append(sel.picked, cand.bi),
         list_append(sel.scores, (cand.mk + cand.bi) // 2147483648)
  FROM sel, LATERAL (
    SELECT arg_max(it, key) AS bi, max(key) AS mk FROM (
      SELECT i.it,
             (7 * i.rel_x
              - 3 * coalesce(max(CASE WHEN list_contains(sel.picked, s.b)
                                      THEN s.sim END), 0))
               * 2147483648 - i.it AS key
      FROM items i LEFT JOIN sims s ON s.a = i.it
      WHERE NOT list_contains(sel.picked, i.it)
      GROUP BY i.it, i.rel_x
    )
  ) cand
  WHERE sel.r < 5
)
SELECT CAST(unnest(range(1, 6)) AS BIGINT) AS rnk,
       unnest(picked) AS item,
       unnest(list_transform(scores, s -> CAST(s // 10 AS BIGINT)))
         AS mmr_x1e6
FROM sel WHERE r = 5
"""


def q_heaps_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth at 8 ingestion checkpoints
    (text.heaps_profile): V(N) and the per-segment msb16 log-log growth
    exponent — the is-more-data-still-novel diagnostic beside
    zipf_slope/good_turing."""
    from .operators.text import heaps_profile

    return heaps_profile(_t(spark, sf_dir, "documents"), n_checkpoints=8)


def _heaps_sql() -> str:
    d = _duck_msb16
    return f"""
WITH toks AS (
  SELECT doc_id AS id,
         unnest(list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS tok
  FROM documents
),
fd AS (SELECT tok, min(id) AS fd FROM toks GROUP BY tok),
pd AS (SELECT id, CAST(count(*) AS BIGINT) AS ntok FROM toks GROUP BY id),
mxd AS (SELECT max(doc_id) AS mx FROM documents),
cps AS (SELECT DISTINCT mx * i // 8 AS cp
        FROM mxd, (SELECT unnest(range(1, 9)) AS i)),
vocab AS (SELECT cp, CAST(count(*) AS BIGINT) AS vocab
          FROM fd, cps WHERE fd.fd <= cps.cp GROUP BY cp),
sizes AS (SELECT cp, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(ntok) AS BIGINT) AS n_tokens
          FROM pd, cps WHERE pd.id <= cps.cp GROUP BY cp),
prof AS (
  SELECT s.cp, s.n_docs, s.n_tokens,
         CAST(coalesce(v.vocab, 0) AS BIGINT) AS vocab
  FROM sizes s LEFT JOIN vocab v USING (cp)
),
lagged AS (
  SELECT cp, n_docs, n_tokens, vocab,
         lag(vocab) OVER (ORDER BY cp) AS pv,
         lag(n_tokens) OVER (ORDER BY cp) AS pn
  FROM prof
)
SELECT cp, n_docs, n_tokens, vocab,
       CASE WHEN pv IS NOT NULL THEN
         CAST(({d('vocab')} - {d('pv')}) * 1000000
              // nullif({d('n_tokens')} - {d('pn')}, 0) AS BIGINT)
       END AS beta_x1e6
FROM lagged
"""


HEAPS_PROFILE_SQL = _heaps_sql()


# ---------------------------------------------------------------------------
# Q: readability / paired-classifier tests (McNemar, MCC)
# ---------------------------------------------------------------------------


def q_flesch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (text.readability_scores):
    vowel-group syllable proxy, punctuation-run sentences, truncating
    integer quotients ×1e3 — the readability gate beside quality_score."""
    from .operators.text import readability_scores

    return readability_scores(_t(spark, sf_dir, "documents"))


READABILITY_SQL = """
WITH f AS (
  SELECT doc_id,
    greatest(CAST(len(list_filter(string_split(
      regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
      t -> t <> '')) AS BIGINT), 1) AS n_words,
    greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT), 1)
      AS n_sentences,
    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
      AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CAST(206835 - 1015 * n_words // n_sentences
            - 84600 * n_syllables // n_words AS BIGINT) AS flesch_x1e3
FROM f
"""


_LANGID_PRED_SQL = """
words AS (
  SELECT doc_id, lang, text, string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents
),
ratios AS (
  SELECT doc_id, 'en' AS plang,
    CAST(len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it','that','for'))) AS DOUBLE)
      / greatest(len(w), 1) AS ratio FROM words
  UNION ALL
  SELECT doc_id, 'fr',
    CAST(len(list_filter(w, x -> x IN ('le','la','de','et','les','des','un','une','dans','est'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
  UNION ALL
  SELECT doc_id, 'de',
    CAST(len(list_filter(w, x -> x IN ('der','die','das','und','ist','von','mit','den','ein','zu'))) AS DOUBLE)
      / greatest(len(w), 1) FROM words
),
pred AS (
  SELECT doc_id, plang AS yhat FROM (
    SELECT doc_id, plang,
           row_number() OVER (PARTITION BY doc_id ORDER BY ratio DESC, plang DESC) AS rn
    FROM ratios
  ) WHERE rn = 1
)
"""


def q_mcnemar_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (classifier.mcnemar_test): the stopword
    language-id heuristic vs the bare `' the '` marker, both predicting
    is-English on the same documents — discordant-pair counts and the
    exact (b−c)²·1e6 DIV (b+c) statistic."""
    from .operators.classifier import mcnemar_test
    from .operators.text import language_id

    docs = language_id(_t(spark, sf_dir, "documents"))
    paired = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.when(F.col("lang_pred") == "en", 1)
        .otherwise(0)
        .cast("long")
        .alias("pa"),
        F.when(F.lower(F.col("text")).like("% the %"), 1)
        .otherwise(0)
        .cast("long")
        .alias("pb"),
    )
    return mcnemar_test(paired, "y", "pa", "pb")


MCNEMAR_LANGID_SQL = f"""
WITH {_LANGID_PRED_SQL},
paired AS (
  SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN p.yhat = 'en' THEN 1 ELSE 0 END AS pa,
         CASE WHEN lower(d.text) LIKE '% the %' THEN 1 ELSE 0 END AS pb
  FROM documents d JOIN pred p USING (doc_id)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END) AS BIGINT)
           AS b,
         CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END) AS BIGINT)
           AS c
  FROM paired
)
SELECT n, b, c,
       CAST((b - c) * (b - c) * 1000000 // greatest(b + c, 1) AS BIGINT)
         AS chi2_x1e6
FROM agg
"""


def q_mcc_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matthews correlation of the is-English language-id prediction
    (classifier.mcc_binary): signed-square staged-quotient emit, exact in
    both engines."""
    from .operators.classifier import mcc_binary
    from .operators.text import language_id

    docs = language_id(_t(spark, sf_dir, "documents"))
    paired = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).cast("long").alias("y"),
        F.when(F.col("lang_pred") == "en", 1)
        .otherwise(0)
        .cast("long")
        .alias("p"),
    )
    return mcc_binary(paired, "y", "p")


MCC_LANGID_SQL = f"""
WITH {_LANGID_PRED_SQL},
paired AS (
  SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
         CASE WHEN p.yhat = 'en' THEN 1 ELSE 0 END AS p
  FROM documents d JOIN pred p USING (doc_id)
),
agg AS (
  SELECT CAST(sum(y * p) AS BIGINT) AS tp,
         CAST(sum((1 - y) * (1 - p)) AS BIGINT) AS tn,
         CAST(sum((1 - y) * p) AS BIGINT) AS fp,
         CAST(sum(y * (1 - p)) AS BIGINT) AS fn
  FROM paired
)
SELECT tp, tn, fp, fn,
       CAST(CASE WHEN (tp+fp) = 0 OR (tp+fn) = 0 OR (tn+fp) = 0
                  OR (tn+fn) = 0 THEN 0 ELSE
         CAST(sign(tp*tn - fp*fn) AS BIGINT)
         * (abs(tp*tn - fp*fn) * 1000 // ((tp+fp) * (tp+fn)))
         * (abs(tp*tn - fp*fn) * 1000 // ((tn+fp) * (tn+fn)))
       END AS BIGINT) AS mcc2_x1e6
FROM agg
"""


# ---------------------------------------------------------------------------
# Q: blocking quality — pairs completeness + reduction ratio of the LSH
# blocker against the exact prefix-filter join
# ---------------------------------------------------------------------------


def q_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking quality (dedup.blocking_quality): the 8-hash/2-band
    1-gram minhash blocker evaluated against EXACT 3-gram Jaccard >= 0.5
    truth from prefix_jaccard_join (100% recall by construction) — how
    much of the true near-dup set the bands retain, at what pair-space
    reduction."""
    from .operators.dedup import (
        blocking_quality,
        minhash_lsh_candidates,
        prefix_jaccard_join,
    )

    docs = _t(spark, sf_dir, "documents")
    truth = prefix_jaccard_join(docs, threshold=0.5, shingle_n=3).select(
        "id_a", "id_b"
    )
    cand = minhash_lsh_candidates(docs, num_hashes=8, bands=2, shingle_n=1)
    return blocking_quality(cand, truth, n_items=docs.count())


BLOCKING_EVAL_SQL = f"""
WITH cand AS ({MINHASH_LSH_SQL}),
sh3 AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 3, 0) + 2),
           i -> array_to_string(t[i : i + 2], ' '))) AS el
  FROM (SELECT doc_id, string_split(
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
        FROM documents)
),
sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM sh3 GROUP BY doc_id),
ix AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
       FROM sh3 a JOIN sh3 b ON a.el = b.el AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
truth AS (
  SELECT id_a, id_b
  FROM ix JOIN sz sa ON sa.doc_id = ix.id_a JOIN sz sb ON sb.doc_id = ix.id_b
  WHERE i * 1000000 >= 500000 * (sa.sz + sb.sz - i)
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
agg AS (
  SELECT (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
         (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
         (SELECT CAST(count(*) AS BIGINT)
          FROM cand c JOIN truth t ON c.id_a = t.id_a AND c.id_b = t.id_b)
           AS n_hits
)
SELECT n AS n_items, n_cand, n_truth, n_hits,
       CAST(n_hits * 1000000 // greatest(n_truth, 1) AS BIGINT)
         AS completeness_x1e6,
       CAST(1000000 - n_cand * 1000000 // greatest(n * (n - 1) // 2, 1)
         AS BIGINT) AS reduction_x1e6
FROM agg, nn
"""


# ---------------------------------------------------------------------------
# Q: clustering external agreement (purity/Rand/ARI) + Krippendorff alpha
# ---------------------------------------------------------------------------


def q_clustering_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """External eval of the 2-round k-means clustering against the
    embeddings table's true labels (clustering.clustering_agreement):
    purity, Rand index, Adjusted Rand — exact cross-multiplied integers
    off the contingency cells."""
    from .operators.clustering import clustering_agreement, kmeans

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(emb, k=4, iterations=2)
    j = assigned.select("vec_id", "cluster").join(
        emb.select("vec_id", "label"), "vec_id"
    )
    return clustering_agreement(j, "cluster", "label")


CLUSTERING_AGREEMENT_SQL = f"""
WITH asg AS ({KMEANS_SQL}),
j AS (SELECT a.cluster AS ci, CAST(e.label AS VARCHAR) AS lj
      FROM asg a JOIN embeddings e USING (vec_id)),
cells AS (SELECT ci, lj, CAST(count(*) AS BIGINT) AS nij
          FROM j GROUP BY ci, lj),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
               CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_ij
        FROM cells),
aa AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a
       FROM (SELECT sum(nij) AS ai FROM cells GROUP BY ci)),
bb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b
       FROM (SELECT sum(nij) AS bj FROM cells GROUP BY lj)),
pp AS (SELECT CAST(sum(mx) AS BIGINT) AS pure
       FROM (SELECT max(nij) AS mx FROM cells GROUP BY ci))
SELECT n,
       CAST(pure * 1000000 // n AS BIGINT) AS purity_x1e6,
       CAST((n * (n - 1) // 2 + 2 * s_ij - s_a - s_b) * 1000000
            // greatest(n * (n - 1) // 2, 1) AS BIGINT) AS rand_x1e6,
       CAST(CASE WHEN (n * (n - 1) // 2) * (s_a + s_b) - 2 * s_a * s_b = 0
                 THEN 1000000 ELSE
            2 * ((n * (n - 1) // 2) * s_ij - s_a * s_b) * 1000000
            // ((n * (n - 1) // 2) * (s_a + s_b) - 2 * s_a * s_b)
            END AS BIGINT) AS ari_x1e6
FROM tot, aa, bb, pp
"""


def q_krippendorff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (classifier.krippendorff_alpha) across three
    deterministic raters of document language — the full stopword
    heuristic plus two single-marker raters that ABSTAIN when no marker
    hits (real missing data; units with <2 ratings drop out)."""
    from .operators.classifier import krippendorff_alpha
    from .operators.text import language_id

    docs = language_id(_t(spark, sf_dir, "documents"))

    def marker(en: str, fr: str, de: str):
        t = F.lower(F.col("text"))
        return (
            F.when(t.like(f"% {en} %"), "en")
            .when(t.like(f"% {fr} %"), "fr")
            .when(t.like(f"% {de} %"), "de")
        )

    rated = (
        docs.select(
            F.col("doc_id").alias("unit"),
            F.array(
                F.struct(F.lit("A").alias("r"), F.col("lang_pred").alias("v")),
                F.struct(
                    F.lit("B").alias("r"), marker("the", "le", "der").alias("v")
                ),
                F.struct(
                    F.lit("C").alias("r"), marker("and", "et", "und").alias("v")
                ),
            ).alias("rs"),
        )
        .select("unit", F.explode("rs").alias("p"))
        .filter(F.col("p.v").isNotNull())
        .select("unit", F.col("p.v").alias("value"))
    )
    return krippendorff_alpha(rated, "unit", "value")


KRIPPENDORFF_SQL = f"""
WITH {_LANGID_PRED_SQL},
markers AS (
  SELECT d.doc_id,
         p.yhat AS ra,
         CASE WHEN lower(d.text) LIKE '% the %' THEN 'en'
              WHEN lower(d.text) LIKE '% le %' THEN 'fr'
              WHEN lower(d.text) LIKE '% der %' THEN 'de' END AS rb,
         CASE WHEN lower(d.text) LIKE '% and %' THEN 'en'
              WHEN lower(d.text) LIKE '% et %' THEN 'fr'
              WHEN lower(d.text) LIKE '% und %' THEN 'de' END AS rc
  FROM documents d JOIN pred p USING (doc_id)
),
pu AS (
  SELECT doc_id, vals, len(vals) AS m FROM (
    SELECT doc_id, list_filter([ra, rb, rc], x -> x IS NOT NULL) AS vals
    FROM markers
  ) WHERE len(vals) >= 2
),
pairs AS (
  SELECT vals[ii.i] AS c, vals[jj.j] AS k, CAST(6 // (m - 1) AS BIGINT) AS w
  FROM pu,
       LATERAL unnest(range(1, m + 1)) AS ii(i),
       LATERAL unnest(range(1, m + 1)) AS jj(j)
  WHERE ii.i <> jj.j
),
occ AS (SELECT c, k, CAST(sum(w) AS BIGINT) AS o6 FROM pairs GROUP BY c, k),
nu AS (SELECT CAST(count(*) AS BIGINT) AS n_units FROM pu),
doo AS (SELECT CAST(coalesce(sum(o6), 0) AS BIGINT) AS do6
        FROM occ WHERE c <> k),
marg AS (SELECT c, CAST(sum(o6) AS BIGINT) AS nc FROM occ GROUP BY c),
dee AS (SELECT CAST(sum(nc) * sum(nc) - sum(nc * nc) AS BIGINT) AS de36,
               CAST(sum(nc) // 6 AS BIGINT) AS n_vals FROM marg)
SELECT n_units, n_vals, do6 AS do_scaled, de36 AS de_scaled,
       CAST(CASE WHEN de36 = 0 THEN 1000000
            ELSE 1000000 - 6 * (n_vals - 1) * do6 * 1000000 // de36
            END AS BIGINT) AS alpha_x1e6
FROM nu, doo, dee
"""


# ---------------------------------------------------------------------------
# Q: rank tests (Wilcoxon paired, Kruskal-Wallis) + forecasting/drift
# (SES, Page-Hinkley)
# ---------------------------------------------------------------------------


def q_wilcoxon_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank per event type (classifier.
    wilcoxon_signed_rank): each user's first-half-year vs
    second-half-year spend as the paired sample — doubled midranks, exact
    tie-corrected moments, cross-multiplied z²."""
    from .operators.classifier import wilcoxon_signed_rank

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("event_type", "user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.month("ts") <= 6,
                    F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"),
                )
            ),
            F.lit(0),
        ).alias("x"),
        F.coalesce(
            F.sum(
                F.when(
                    F.month("ts") > 6,
                    F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)"),
                )
            ),
            F.lit(0),
        ).alias("y"),
    )
    return wilcoxon_signed_rank(per, "event_type", "x", "y")


WILCOXON_PAIRED_SQL = """
WITH per AS (
  SELECT event_type AS key, user_id,
         CAST(coalesce(sum(CASE WHEN month(ts) <= 6 THEN
           CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(coalesce(sum(CASE WHEN month(ts) > 6 THEN
           CAST(floor(value * 100 + 0.5) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events GROUP BY event_type, user_id
),
base AS (
  SELECT key, x - y AS d, abs(x - y) AS ad FROM per WHERE x - y <> 0
),
ranked AS (
  SELECT key, d,
         rank() OVER (PARTITION BY key ORDER BY ad) AS rmin,
         count(*) OVER (PARTITION BY key, ad) AS t
  FROM base
),
agg AS (
  SELECT key,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN d > 0 THEN 2 * rmin + (t - 1) ELSE 0 END)
           AS BIGINT) AS w2,
         CAST(sum(t * t - 1) AS BIGINT) AS tie3
  FROM ranked GROUP BY key
)
SELECT key, n_pairs, w2,
       CAST(n_pairs * (n_pairs + 1) // 2 AS BIGINT) AS e2,
       CAST(n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) // 6
            - tie3 // 12 AS BIGINT) AS var2,
       CAST(CASE WHEN n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) // 6
                      - tie3 // 12 <= 0 THEN 0 ELSE
         CAST(w2 - n_pairs * (n_pairs + 1) // 2 AS HUGEINT)
         * (w2 - n_pairs * (n_pairs + 1) // 2) * 1000000
         // (n_pairs * (n_pairs + 1) * (2 * n_pairs + 1) // 6 - tie3 // 12)
       END AS BIGINT) AS z2_x1e6
FROM agg
"""


def q_kruskal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types on value cents
    (classifier.kruskal_wallis): collapsed-bucket doubled midranks, the
    pinned per-group DIV contract — the k-sample rank ANOVA beside
    auc_priority's two-sample Mann-Whitney."""
    from .operators.classifier import kruskal_wallis

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return kruskal_wallis(pts, "event_type", "cents")


KRUSKAL_EVENTS_SQL = """
WITH cells AS (
  SELECT event_type AS grp, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
vtot AS (SELECT v, CAST(sum(c) AS BIGINT) AS tv FROM cells GROUP BY v),
vrank AS (
  SELECT v, tv,
         1 + CAST(coalesce(sum(tv) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS rmin
  FROM vtot
),
per AS (
  SELECT grp, CAST(sum(c) AS BIGINT) AS n_j,
         CAST(sum(c * (2 * rmin + (tv - 1))) AS BIGINT) AS r2_sum
  FROM cells JOIN vrank USING (v) GROUP BY grp
),
tot AS (
  SELECT CAST(sum(n_j) AS BIGINT) AS n,
         sum(CAST(r2_sum AS HUGEINT) * r2_sum // n_j) AS t_sum
  FROM per
)
SELECT grp, n_j, r2_sum,
       CAST(3 * t_sum * 1000000 // (n * (n + 1))
            - 3 * (n + 1) * 1000000 AS BIGINT) AS h_x1e6
FROM per, tot
"""


def _hourly_series_sql() -> str:
    return """
series AS (
  SELECT event_type AS key,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS o,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
)
"""


def q_ses_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=1/2 exponential-smoothing level + one-step residual over each
    event type's hourly count series (temporal.ses_forecast): bit-shift
    weights over the last 16 observations, exact integers, one window
    shuffle."""
    from .operators.temporal import ses_forecast

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return ses_forecast(series, "event_type", "hr", "c", window=16)


def _ses_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END")
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip().rstrip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
)
SELECT key, o, x, CAST(nm // dn AS BIGINT) AS ses,
       CAST(nxt - nm // dn AS BIGINT) AS next_err
FROM lagged
"""


SES_HOURLY_SQL = _ses_sql()


def q_page_hinkley_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift alarms over the hourly count series
    (temporal.page_hinkley, train_n=8, λ=5): deviation accumulated
    against each key's trained baseline, everything scaled by the
    training count — no float mean, one shuffle."""
    from .operators.temporal import page_hinkley

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type", F.expr("CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)").alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    return page_hinkley(series, "event_type", "hr", "c", train_n=8, lam=5)


PAGE_HINKLEY_SQL = f"""
WITH {_hourly_series_sql().strip()},
rn AS (
  SELECT key, o, x, row_number() OVER (PARTITION BY key ORDER BY o) AS rn
  FROM series
),
tr AS (
  SELECT key, CAST(sum(x) AS BIGINT) AS s_tr, CAST(count(*) AS BIGINT) AS n_tr
  FROM rn WHERE rn <= 8 GROUP BY key
),
post AS (
  SELECT r.key, r.o, r.x, t.s_tr, t.n_tr,
         r.x * t.n_tr - t.s_tr - 0 * t.n_tr AS inc
  FROM rn r JOIN tr t USING (key) WHERE r.rn > 8
),
cum1 AS (
  SELECT key, o, x, n_tr, sum(inc) OVER w AS ph
  FROM post
  WINDOW w AS (PARTITION BY key ORDER BY o
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cum AS (
  SELECT key, o, x, n_tr, ph, min(ph) OVER w2 AS mn
  FROM cum1
  WINDOW w2 AS (PARTITION BY key ORDER BY o
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT key, o, x,
       CAST(ph - mn AS BIGINT) AS gap_scaled,
       CAST(CASE WHEN ph - mn > 5 * n_tr THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM cum
"""


# ---------------------------------------------------------------------------
# Q: one-way ANOVA / Brown-Forsythe / PCA power iteration
# ---------------------------------------------------------------------------


def _duck_anova_tail(src: str) -> str:
    ssb = "b - CAST(s AS HUGEINT) * s // n"
    return f"""
per AS (SELECT g, CAST(sum(x) AS BIGINT) AS s_j,
               CAST(count(*) AS BIGINT) AS n_j
        FROM {src} GROUP BY g),
agg AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_j) AS BIGINT) AS n,
               CAST(sum(s_j) AS BIGINT) AS s,
               sum(CAST(s_j AS HUGEINT) * s_j // n_j) AS b
        FROM per),
qq AS (SELECT sum(CAST(x AS HUGEINT) * x) AS q128 FROM {src})
SELECT n, k,
       CAST({ssb} AS BIGINT) AS ssb_q,
       CAST(q128 - b AS BIGINT) AS ssw_q,
       CAST(CASE WHEN k <= 1 OR n <= k OR q128 - b <= 0 THEN 0 ELSE
         ({ssb}) * (n - k) * 1000000 // ((q128 - b) * (k - 1))
       END AS BIGINT) AS f_x1e6
FROM agg, qq
"""


def q_anova_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across event types on value cents
    (classifier.anova_oneway): 128-bit squares + the pinned per-group
    DIV contract — the mean-based sibling of kruskal_events."""
    from .operators.classifier import anova_oneway

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return anova_oneway(pts, "event_type", "cents")


ANOVA_EVENTS_SQL = f"""
WITH src AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
{_duck_anova_tail('src')}
"""


def q_brown_forsythe_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe variance-homogeneity across event types
    (classifier.brown_forsythe): ANOVA on |cents − group lower median|,
    medians from collapsed cells."""
    from .operators.classifier import brown_forsythe

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return brown_forsythe(pts, "event_type", "cents")


BROWN_FORSYTHE_SQL = f"""
WITH raw AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
cells AS (SELECT g, x AS v, CAST(count(*) AS BIGINT) AS c
          FROM raw GROUP BY g, v),
cum AS (
  SELECT g, v, c,
         sum(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY g) AS n_j
  FROM cells
),
med AS (SELECT g, min(v) AS med FROM cum
        WHERE cum >= (n_j + 1) // 2 GROUP BY g),
src AS (SELECT raw.g, abs(raw.x - med.med) AS x
        FROM raw JOIN med USING (g)),
{_duck_anova_tail('src')}
"""


def q_pca_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the quantized embeddings
    (similarity.pca_top_component): dim² Gram cells, 3 signed integer
    power-iteration rounds, pinned sign — no float anywhere."""
    from .operators.similarity import pca_top_component

    return pca_top_component(_t(spark, sf_dir, "embeddings"), rounds=3)


def _pca_sql() -> str:
    quant = (
        "CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0"
        " THEN list_transform(v, x -> 0)"
        " ELSE list_transform(v, x -> CAST(floor(x * 127.0 /"
        " list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER)) END"
    )
    rounds = []
    prev = "v0"
    for r in (1, 2, 3):
        rounds.append(f"""
s{r} AS (
  SELECT c.i AS d, CAST(sum(c.g * p.val) AS BIGINT) AS s
  FROM cells c JOIN {prev} p ON p.d = c.j GROUP BY c.i
),
m{r} AS (SELECT max(abs(s)) AS mx FROM s{r}),
v{r} AS (SELECT d, CAST(s * 1048576 // greatest(mx, 1) AS BIGINT) AS val
         FROM s{r}, m{r})""")
        prev = f"v{r}"
    rounds_sql = ",".join(rounds)
    return f"""
WITH emb AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qz AS (SELECT {quant} AS q FROM emb),
cells AS (
  SELECT ii.i - 1 AS i, jj.j - 1 AS j,
         CAST(sum(CAST(q[ii.i] AS BIGINT) * q[jj.j]) AS BIGINT) AS g
  FROM qz,
       LATERAL unnest(range(1, len(q) + 1)) AS ii(i),
       LATERAL unnest(range(1, len(q) + 1)) AS jj(j)
  GROUP BY 1, 2
),
dims AS (SELECT DISTINCT i AS d FROM cells),
v0 AS (SELECT d, CAST(1048576 AS BIGINT) AS val FROM dims),
{rounds_sql},
pick AS (SELECT CASE WHEN val >= 0 THEN 1 ELSE -1 END AS sgn
         FROM v3 ORDER BY abs(val) DESC, d ASC LIMIT 1)
SELECT CAST(d AS BIGINT) AS dim, CAST(val * sgn AS BIGINT) AS loading_x
FROM v3, pick
"""


PCA_COMPONENT_SQL = _pca_sql()


# ---------------------------------------------------------------------------
# Q: Friedman repeated-measures test + MASE forecast evaluation
# ---------------------------------------------------------------------------


def q_friedman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (classifier.friedman_test): users as blocks, event
    types as treatments, per-(user, type) spend as the repeated measure
    — only users observed under every type count as complete blocks."""
    from .operators.classifier import friedman_test

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)")
        .alias("v")
    )
    return friedman_test(per, "user_id", "event_type", "v")


FRIEDMAN_EVENTS_SQL = """
WITH per AS (
  SELECT user_id AS b, event_type AS trt,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY user_id, event_type
),
kk AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k_total FROM per),
complete AS (
  SELECT b, trt, v FROM (
    SELECT b, trt, v, count(*) OVER (PARTITION BY b) AS bk FROM per
  ), kk WHERE bk = k_total
),
ranked AS (
  SELECT trt,
         2 * rank() OVER (PARTITION BY b ORDER BY v)
           + (count(*) OVER (PARTITION BY b, v) - 1) AS mr2
  FROM complete
),
agg AS (
  SELECT trt, CAST(sum(mr2) AS BIGINT) AS r2_sum,
         CAST(count(*) AS BIGINT) AS n_blocks
  FROM ranked GROUP BY trt
),
tot AS (
  SELECT CAST(sum(r2_sum * r2_sum) AS BIGINT) AS rr,
         CAST(max(n_blocks) AS BIGINT) AS bb,
         CAST(count(*) AS BIGINT) AS k
  FROM agg
)
SELECT trt, r2_sum, n_blocks, k,
       CAST(CASE WHEN bb = 0 THEN 0 ELSE
         3 * rr * 1000000 // (bb * k * (k + 1)) - 3 * bb * (k + 1) * 1000000
       END AS BIGINT) AS chi2_x1e6
FROM agg, tot
"""


def q_mase_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MASE of the SES forecaster on the hourly count series
    (temporal.forecast_mase): exact integer ratio of model vs
    random-walk absolute-error sums per event type."""
    from .operators.temporal import forecast_mase

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    return forecast_mase(series, "event_type", "hr", "c", window=16)


def _mase_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END"
        )
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
)
SELECT key,
       CAST(count(*) AS BIGINT) AS n_evals,
       CAST(sum(abs(nxt - nm // dn)) AS BIGINT) AS mae_model_sum,
       CAST(sum(abs(nxt - x)) AS BIGINT) AS mae_naive_sum,
       CAST(CASE WHEN sum(abs(nxt - x)) > 0 THEN
         sum(abs(nxt - nm // dn)) * 1000000 // sum(abs(nxt - x))
       END AS BIGINT) AS mase_x1e6
FROM lagged
WHERE nxt IS NOT NULL
GROUP BY key
"""


MASE_HOURLY_SQL = _mase_sql()


# ---------------------------------------------------------------------------
# Q: sampled-quantile calibration + k-fold cross-validated NB
# ---------------------------------------------------------------------------


def q_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k-md5 sample quantiles with the exactness audit
    (sketches.sample_quantile_report): estimate, exact distributed
    quantile, and the estimate's true rank error per percentile."""
    from .operators.sketches import sample_quantile_report

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        "event_id",
    )
    return sample_quantile_report(
        pts, "cents", "event_id", k=100, ps=(50, 90, 99)
    )


SAMPLE_QUANTILES_SQL = """
WITH base AS (
  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events
),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
samp AS (SELECT v FROM base ORDER BY h LIMIT 100),
ns AS (SELECT CAST(count(*) AS BIGINT) AS n_s FROM samp),
cum AS (
  SELECT v, sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY v)
),
scum AS (
  SELECT v, sum(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM (SELECT v, CAST(count(*) AS BIGINT) AS c FROM samp GROUP BY v)
),
pp AS (SELECT unnest([50, 90, 99]) AS p),
ex AS (SELECT p, min(v) AS exact FROM cum, pp, nn
       WHERE cum >= (p * n + 99) // 100 GROUP BY p),
es AS (SELECT p, min(v) AS est FROM scum, pp, ns
       WHERE cum >= (p * n_s + 99) // 100 GROUP BY p),
rk AS (SELECT es.p, es.est, c.cum AS rank_of_est
       FROM es LEFT JOIN cum c ON c.v = es.est)
SELECT CAST(p AS BIGINT) AS p, CAST(est AS BIGINT) AS est,
       CAST(exact AS BIGINT) AS exact,
       CAST(abs(est - exact) AS BIGINT) AS abs_err,
       CAST(abs(rank_of_est - p * n // 100) * 1000000 // greatest(n, 1)
         AS BIGINT) AS rank_err_x1e6
FROM ex JOIN rk USING (p), nn
"""


def q_nb_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated NB accuracy
    (classifier.multinomial_nb_crossval): every fold model is the total
    count table minus that fold's counts — one corpus pass trains all
    five leave-fold-out models; out-of-fold accuracy per fold plus
    overall."""
    from .operators.classifier import multinomial_nb_crossval

    return multinomial_nb_crossval(
        _t(spark, sf_dir, "documents"), label_col="lang", n_folds=5
    )


def _nb_cv_sql() -> str:
    prior = _duck_msb16("docs_c * 1048576 // dt")
    default = _duck_msb16("1048576 // (n_c + v)")
    term = _duck_msb16("(cnt + 1) * 1048576 // (n_c + v)")
    return f"""
WITH toks AS (
  SELECT doc_id AS id, CAST(doc_id % 5 AS BIGINT) AS fold, lang AS cls,
         unnest(list_filter(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
           t -> t <> '')) AS tok
  FROM documents
),
folds AS (SELECT CAST(unnest(range(0, 5)) AS BIGINT) AS fold),
cnt_t AS (SELECT cls, tok, CAST(count(*) AS BIGINT) AS ct
          FROM toks GROUP BY cls, tok),
cnt_f AS (SELECT fold, cls, tok, CAST(count(*) AS BIGINT) AS cf
          FROM toks GROUP BY fold, cls, tok),
rest AS (
  SELECT f.fold, t.cls, t.tok, t.ct - coalesce(c.cf, 0) AS cnt
  FROM folds f CROSS JOIN cnt_t t
  LEFT JOIN cnt_f c ON c.fold = f.fold AND c.cls = t.cls AND c.tok = t.tok
  WHERE t.ct - coalesce(c.cf, 0) > 0
),
n_cf AS (SELECT fold, cls, CAST(sum(cnt) AS BIGINT) AS n_c
         FROM rest GROUP BY fold, cls),
v_f AS (SELECT fold, CAST(count(DISTINCT tok) AS BIGINT) AS v
        FROM rest GROUP BY fold),
dcls AS (SELECT CAST(doc_id % 5 AS BIGINT) AS fold, lang AS cls
         FROM documents),
docs_t AS (SELECT cls, CAST(count(*) AS BIGINT) AS dct FROM dcls GROUP BY cls),
docs_f AS (SELECT fold, cls, CAST(count(*) AS BIGINT) AS dcf
           FROM dcls GROUP BY fold, cls),
dprior AS (
  SELECT f.fold, t.cls, t.dct - coalesce(d.dcf, 0) AS docs_c
  FROM folds f CROSS JOIN docs_t t
  LEFT JOIN docs_f d ON d.fold = f.fold AND d.cls = t.cls
  WHERE t.dct - coalesce(d.dcf, 0) > 0
),
dtot AS (SELECT fold, CAST(sum(docs_c) AS BIGINT) AS dt
         FROM dprior GROUP BY fold),
class_tbl AS (
  SELECT n_cf.fold, n_cf.cls,
         CAST({prior} AS BIGINT) AS prior_x16,
         CAST({default} AS BIGINT) AS default_x16
  FROM n_cf JOIN v_f USING (fold) JOIN dprior USING (fold, cls)
  JOIN dtot USING (fold)
),
model AS (
  SELECT rest.fold, rest.cls, rest.tok, CAST({term} AS BIGINT) AS term_x16
  FROM rest JOIN n_cf USING (fold, cls) JOIN v_f USING (fold)
),
scored AS (
  SELECT t.id, t.fold, ct.cls,
         sum(coalesce(m.term_x16, ct.default_x16)) + max(ct.prior_x16)
           AS score_x16
  FROM toks t JOIN class_tbl ct ON ct.fold = t.fold
  LEFT JOIN model m ON m.fold = t.fold AND m.cls = ct.cls AND m.tok = t.tok
  GROUP BY t.id, t.fold, ct.cls
),
pred AS (
  SELECT id, fold, cls AS pred_cls FROM (
    SELECT *, row_number() OVER (PARTITION BY id
               ORDER BY score_x16 DESC, cls ASC) AS rn
    FROM scored
  ) WHERE rn = 1
),
per_doc AS (
  SELECT p.fold, CASE WHEN d.lang = p.pred_cls THEN 1 ELSE 0 END AS ok
  FROM documents d JOIN pred p ON p.id = d.doc_id
)
SELECT CAST(fold AS VARCHAR) AS fold, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ok) AS BIGINT) AS n_correct,
       CAST(sum(ok) * 1000000 // greatest(count(*), 1) AS BIGINT) AS acc_x1e6
FROM per_doc GROUP BY fold
UNION ALL
SELECT '__overall__', CAST(count(*) AS BIGINT), CAST(sum(ok) AS BIGINT),
       CAST(sum(ok) * 1000000 // greatest(count(*), 1) AS BIGINT)
FROM per_doc
"""


NB_CROSSVAL_SQL = _nb_cv_sql()


# ---------------------------------------------------------------------------
# Q: V-measure + two-proportion z² screen + Grubbs outlier screen
# ---------------------------------------------------------------------------


def q_vmeasure_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homogeneity/completeness/V-measure of the 2-round k-means
    clustering vs true labels (clustering.vmeasure): msb16-quantized
    entropies with the 320n offset cancelling in the ratios."""
    from .operators.clustering import kmeans, vmeasure

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans(emb, k=4, iterations=2)
    j = assigned.select("vec_id", "cluster").join(
        emb.select("vec_id", "label"), "vec_id"
    )
    return vmeasure(j, "cluster", "label")


def _vmeasure_sql() -> str:
    d = _duck_msb16
    return f"""
WITH asg AS ({KMEANS_SQL}),
j AS (SELECT a.cluster AS ci, CAST(e.label AS VARCHAR) AS lj
      FROM asg a JOIN embeddings e USING (vec_id)),
cells AS (SELECT ci, lj, CAST(count(*) AS BIGINT) AS nij
          FROM j GROUP BY ci, lj),
aa AS (SELECT ci, CAST(sum(nij) AS BIGINT) AS ai FROM cells GROUP BY ci),
bb AS (SELECT lj, CAST(sum(nij) AS BIGINT) AS bj FROM cells GROUP BY lj),
nn AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cells),
hc AS (SELECT CAST(sum(bj * ({d('n * 1048576 // bj')})) AS BIGINT) AS hc16
       FROM bb, nn),
hk AS (SELECT CAST(sum(ai * ({d('n * 1048576 // ai')})) AS BIGINT) AS hk16
       FROM aa, nn),
ck AS (SELECT CAST(sum(nij * ({d('ai * 1048576 // nij')})) AS BIGINT) AS ck16
       FROM cells JOIN aa USING (ci)),
kc AS (SELECT CAST(sum(nij * ({d('bj * 1048576 // nij')})) AS BIGINT) AS kc16
       FROM cells JOIN bb USING (lj)),
hv AS (
  SELECT n,
    CAST(CASE WHEN hc16 - 320 * n <= 0 THEN 1000000 ELSE
      1000000 - (ck16 - 320 * n) * 1000000 // (hc16 - 320 * n)
    END AS BIGINT) AS homogeneity_x1e6,
    CAST(CASE WHEN hk16 - 320 * n <= 0 THEN 1000000 ELSE
      1000000 - (kc16 - 320 * n) * 1000000 // (hk16 - 320 * n)
    END AS BIGINT) AS completeness_x1e6
  FROM nn, hc, hk, ck, kc
)
SELECT n, homogeneity_x1e6, completeness_x1e6,
  CAST(CASE WHEN homogeneity_x1e6 + completeness_x1e6 = 0 THEN 0 ELSE
    2 * homogeneity_x1e6 * completeness_x1e6
    // (homogeneity_x1e6 + completeness_x1e6)
  END AS BIGINT) AS v_x1e6
FROM hv
"""


VMEASURE_KMEANS_SQL = _vmeasure_sql()


def q_prop_ztest_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z² per event type vs the rest
    (classifier.proportion_ztest_segments) on a deterministic cents-mod
    success flag — 128-bit cross-multiplied, no sqrt, no float."""
    from .operators.classifier import proportion_ztest_segments

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr(
            "CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 7 < 3"
            " THEN 1 ELSE 0 END"
        ).alias("s"),
    )
    return proportion_ztest_segments(base, "event_type", "s")


PROP_ZTEST_SQL = """
WITH base AS (
  SELECT event_type AS seg,
         CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 7 < 3
              THEN 1 ELSE 0 END AS s
  FROM events
),
per AS (SELECT seg, CAST(count(*) AS BIGINT) AS n1,
               CAST(sum(s) AS BIGINT) AS k1
        FROM base GROUP BY seg),
tot AS (SELECT CAST(sum(n1) AS BIGINT) AS nn2, CAST(sum(k1) AS BIGINT) AS kk
        FROM per)
SELECT seg AS segment, n1 AS n_seg, k1 AS k_seg,
  CAST(CASE WHEN kk = 0 OR kk = nn2 OR n1 = nn2 THEN 0 ELSE
    CAST(k1 * (nn2 - n1) - (kk - k1) * n1 AS HUGEINT)
    * (k1 * (nn2 - n1) - (kk - k1) * n1) * nn2 * 1000000
    // (CAST(n1 AS HUGEINT) * (nn2 - n1) * kk * (nn2 - kk))
  END AS BIGINT) AS z2_x1e6
FROM per, tot
"""


def q_grubbs_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubbs max-deviation screen per event type on value cents
    (classifier.grubbs_screen): pinned deviant pick, 128-bit G²."""
    from .operators.classifier import grubbs_screen

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return grubbs_screen(pts, "event_type", "cents")


GRUBBS_TYPES_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
stats AS (SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
                 sum(CAST(x AS HUGEINT) * x) AS q128
          FROM base GROUP BY key),
devs AS (SELECT b.key, b.x, abs(st.n * b.x - st.s) AS ad
         FROM base b JOIN stats st USING (key)),
mx AS (SELECT key, max(ad) AS mx_ad FROM devs GROUP BY key),
dev AS (SELECT d.key, CAST(min(d.x) AS BIGINT) AS x_star
        FROM devs d JOIN mx USING (key)
        WHERE d.ad = mx.mx_ad GROUP BY d.key)
SELECT st.key, st.n, dev.x_star,
  CAST(CASE WHEN st.n <= 1 OR st.n * q128 - CAST(st.s AS HUGEINT) * st.s <= 0
       THEN 0 ELSE
    CAST(st.n * dev.x_star - st.s AS HUGEINT) * (st.n * dev.x_star - st.s)
    * (st.n - 1) * 1000000
    // (st.n * (st.n * q128 - CAST(st.s AS HUGEINT) * st.s))
  END AS BIGINT) AS g2_x1e6
FROM stats st JOIN dev USING (key)
"""


# ---------------------------------------------------------------------------
# Q: generation diversity (distinct-n) + duplicate-turn rate per role
# ---------------------------------------------------------------------------


def q_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/distinct-2 per role (dialogue.distinct_n_diversity):
    the mode-collapse screen over each role's turn text."""
    from .operators.dialogue import distinct_n_diversity

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
    from .operators.dialogue import duplicate_turn_rate

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
# Q: Chao1 richness + Cronbach alpha + signed Cohen's d²
# ---------------------------------------------------------------------------


def q_chao1_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimate of the documents vocabulary
    (text.chao1_richness): observed distinct + N1²/2N2 — the
    unseen-types ceiling beside good_turing's unseen mass."""
    from .operators.text import chao1_richness

    return chao1_richness(_t(spark, sf_dir, "documents"))


CHAO1_SQL = """
WITH toks AS (
  SELECT unnest(list_filter(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
    t -> t <> '')) AS tok
  FROM documents
),
vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS r FROM toks GROUP BY tok),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS d_obs,
         CAST(sum(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM vocab
)
SELECT d_obs, n1, n2,
  CAST(CASE WHEN n2 > 0
       THEN d_obs * 1000000 + n1 * n1 * 1000000 // (2 * n2)
       ELSE d_obs * 1000000 + n1 * (n1 - 1) * 1000000 // (2 * (n2 + 1))
  END AS BIGINT) AS chao1_x1e6
FROM agg
"""


def q_cronbach_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha across event types as 'items' with users as
    subjects (classifier.cronbach_alpha): do per-type spends co-vary as
    one construct; complete-case users only."""
    from .operators.classifier import cronbach_alpha

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.expr("CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)")
        .alias("v")
    )
    return cronbach_alpha(per, "user_id", "event_type", "v")


CRONBACH_SQL = """
WITH per AS (
  SELECT CAST(user_id AS VARCHAR) AS sb, event_type AS it,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM events GROUP BY user_id, event_type
),
kk AS (SELECT CAST(count(DISTINCT it) AS BIGINT) AS k_total FROM per),
complete AS (
  SELECT sb, it, x FROM (
    SELECT sb, it, x, count(*) OVER (PARTITION BY sb) AS c FROM per
  ), kk WHERE c = k_total
),
ns AS (SELECT CAST(count(DISTINCT sb) AS BIGINT) AS nsub FROM complete),
items AS (SELECT it, CAST(sum(x) AS BIGINT) AS s_i,
                 sum(CAST(x AS HUGEINT) * x) AS q_i
          FROM complete GROUP BY it),
bsum AS (SELECT CAST(count(*) AS BIGINT) AS k,
                sum((SELECT nsub FROM ns) * q_i
                    - CAST(s_i AS HUGEINT) * s_i) AS b128
         FROM items),
subj AS (SELECT sb, CAST(sum(x) AS BIGINT) AS t FROM complete GROUP BY sb),
asum AS (SELECT CAST(sum(t) AS BIGINT) AS s_t,
                sum(CAST(t AS HUGEINT) * t) AS q_t
         FROM subj)
SELECT k, nsub AS n_subjects,
  CAST(CASE WHEN k < 2 OR nsub < 2
            OR nsub * q_t - CAST(s_t AS HUGEINT) * s_t <= 0 THEN NULL ELSE
    k * ((nsub * q_t - CAST(s_t AS HUGEINT) * s_t) - b128) * 1000000
    // ((k - 1) * (nsub * q_t - CAST(s_t AS HUGEINT) * s_t))
  END AS BIGINT) AS alpha_x1e6
FROM bsum, asum, ns
"""


def q_cohens_d_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed Cohen's d² per event type between odd and even users
    (classifier.cohens_d_signed): the effect-size reading beside
    welch_t's significance."""
    from .operators.classifier import cohens_d_signed

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return cohens_d_signed(base, "event_type", "g", "cents")


COHENS_D_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(user_id % 2 AS BIGINT) AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
per AS (
  SELECT key,
    CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN g = 0 THEN x ELSE 0 END) AS BIGINT) AS s0,
    CAST(sum(CASE WHEN g = 1 THEN x ELSE 0 END) AS BIGINT) AS s1,
    sum(CASE WHEN g = 0 THEN CAST(x AS HUGEINT) * x
        ELSE CAST(0 AS HUGEINT) END) AS q0,
    sum(CASE WHEN g = 1 THEN CAST(x AS HUGEINT) * x
        ELSE CAST(0 AS HUGEINT) END) AS q1
  FROM base GROUP BY key
)
SELECT key, n0, n1,
  CAST(CASE WHEN n0 < 2 OR n1 < 2
       OR n1 * (n0 * q0 - CAST(s0 AS HUGEINT) * s0)
          + n0 * (n1 * q1 - CAST(s1 AS HUGEINT) * s1) <= 0
       THEN NULL ELSE
    CAST(sign(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
         AS HUGEINT)
    * (CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
    * (CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
    * (n0 + n1 - 2) * 1000000
    // (n0 * n1 * (n1 * (n0 * q0 - CAST(s0 AS HUGEINT) * s0)
                   + n0 * (n1 * q1 - CAST(s1 AS HUGEINT) * s1)))
  END AS BIGINT) AS d2_x1e6
FROM per
"""


# ---------------------------------------------------------------------------
# Q: Cochran's Q + Jonckheere trend + Durbin-Watson on SES residuals
# ---------------------------------------------------------------------------


def q_cochran_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q (classifier.cochran_q): users as complete blocks,
    event types as binary treatments (success = >= 2 events of the type)
    — the binary repeated-measures member beside friedman/mcnemar."""
    from .operators.classifier import cochran_q

    ev = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(
        F.expr("CAST(CASE WHEN count(1) >= 2 THEN 1 ELSE 0 END AS BIGINT)")
        .alias("s")
    )
    return cochran_q(per, "user_id", "event_type", "s")


COCHRAN_Q_SQL = """
WITH per AS (
  SELECT CAST(user_id AS VARCHAR) AS b, event_type AS trt,
         CAST(CASE WHEN count(*) >= 2 THEN 1 ELSE 0 END AS BIGINT) AS s
  FROM events GROUP BY user_id, event_type
),
kk AS (SELECT count(DISTINCT trt) AS k_total FROM per),
complete AS (
  SELECT b, trt, s FROM (
    SELECT b, trt, s, count(*) OVER (PARTITION BY b) AS c FROM per
  ), kk WHERE c = k_total
),
cols AS (SELECT trt, CAST(sum(s) AS BIGINT) AS c_j,
                CAST(count(*) AS BIGINT) AS n_blocks
         FROM complete GROUP BY trt),
rws AS (SELECT b, CAST(sum(s) AS BIGINT) AS r_b FROM complete GROUP BY b),
tot AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(c_j) AS BIGINT) AS nn,
               CAST(sum(c_j * c_j) AS BIGINT) AS cc2
        FROM cols),
rr AS (SELECT CAST(sum(r_b * r_b) AS BIGINT) AS rr2 FROM rws),
stat AS (
  SELECT CAST(CASE WHEN k * nn - rr2 <= 0 OR k < 2 THEN NULL ELSE
    (k - 1) * (k * cc2 - nn * nn) * 1000000 // (k * nn - rr2)
  END AS BIGINT) AS q_x1e6
  FROM tot, rr
)
SELECT trt AS treatment, c_j, n_blocks, q_x1e6 FROM cols, stat
"""


def q_jonckheere_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jonckheere-Terpstra ordered-trend test across event types
    (classifier.jonckheere_trend) on value cents: runs on the dense
    (value × group) grid with prefix windows — never pairwise."""
    from .operators.classifier import jonckheere_trend

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return jonckheere_trend(base, "event_type", "cents")


JONCKHEERE_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events
),
cells AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY g, v),
grid AS (
  SELECT gg.g, vv.v, CAST(coalesce(c.c, 0) AS BIGINT) AS c
  FROM (SELECT DISTINCT g FROM cells) gg
  CROSS JOIN (SELECT DISTINCT v FROM cells) vv
  LEFT JOIN cells c ON c.g = gg.g AND c.v = vv.v
),
pre AS (
  SELECT g, v, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY g ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS less
  FROM grid
),
roll AS (
  SELECT g, v, c,
         CAST(coalesce(sum(less) OVER wg, 0) AS BIGINT) AS less_lo,
         CAST(coalesce(sum(c) OVER wg, 0) AS BIGINT) AS eq_lo
  FROM pre
  WINDOW wg AS (PARTITION BY v ORDER BY g
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
jj AS (SELECT CAST(sum(c * (2 * less_lo + eq_lo)) AS BIGINT) AS j2 FROM roll),
sizes AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_i FROM cells GROUP BY g),
mom AS (SELECT CAST(count(*) AS BIGINT) AS k, CAST(sum(n_i) AS BIGINT) AS n,
               sum(CAST(n_i AS HUGEINT) * n_i) AS s2,
               sum(CAST(n_i AS HUGEINT) * n_i * (2 * n_i + 3)) AS s3
        FROM sizes)
SELECT n, k, j2,
  CAST((CAST(n AS HUGEINT) * n - s2) // 2 AS BIGINT) AS e2,
  CAST((CAST(n AS HUGEINT) * n * (2 * n + 3) - s3) // 18 AS BIGINT) AS var2,
  CAST(CASE WHEN (CAST(n AS HUGEINT) * n * (2 * n + 3) - s3) // 18 <= 0
       THEN 0 ELSE
    CAST(j2 - (CAST(n AS HUGEINT) * n - s2) // 2 AS HUGEINT)
    * (j2 - (CAST(n AS HUGEINT) * n - s2) // 2)
    * 1000000 // ((CAST(n AS HUGEINT) * n * (2 * n + 3) - s3) // 18)
  END AS BIGINT) AS z2_x1e6
FROM jj, mom
"""


def q_durbin_watson_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson on the SES one-step residuals per event type
    (temporal.durbin_watson over temporal.ses_forecast): is the smoother
    leaving autocorrelated errors."""
    from .operators.temporal import durbin_watson, ses_forecast

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ses = ses_forecast(series, "event_type", "hr", "c", window=16)
    return durbin_watson(ses, "key", "o", "next_err")


def _durbin_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END"
        )
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
),
resid AS (
  SELECT key, o, CAST(nxt - nm // dn AS BIGINT) AS e
  FROM lagged WHERE nxt IS NOT NULL
),
lag2 AS (
  SELECT key, e, lag(e) OVER (PARTITION BY key ORDER BY o) AS pe FROM resid
)
SELECT key, CAST(count(*) AS BIGINT) AS n_resid,
  CAST(CASE WHEN sum(CAST(e AS HUGEINT) * e) <= 0 THEN NULL ELSE
    sum(CASE WHEN pe IS NOT NULL THEN CAST(e - pe AS HUGEINT) * (e - pe)
        ELSE CAST(0 AS HUGEINT) END) * 1000000
    // sum(CAST(e AS HUGEINT) * e)
  END AS BIGINT) AS dw_x1e6
FROM lag2 GROUP BY key
"""


DURBIN_WATSON_SQL = _durbin_sql()


# ---------------------------------------------------------------------------
# Q: Markov entropy rate + conversation near-dups + sessionizer agreement
# ---------------------------------------------------------------------------


def q_markov_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-transition entropy rate (dialogue.markov_entropy_rate):
    per-source conditional entropy + the `__rate__` row, msb16 device
    with exact offset removal."""
    from .operators.dialogue import markov_entropy_rate

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


def q_conv_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level near-duplicate candidates: chat_render
    serializes each conversation, the minhash blocker generates candidate
    pairs over the rendered text, exact 1-gram Jaccard verifies — the
    formatting + dedup stacks CHAINED (dedup templated conversations
    before SFT). Emits the top-20 most similar candidate pairs."""
    from .operators.dedup import minhash_lsh_candidates, ngram_jaccard
    from .operators.dialogue import chat_render

    tx = transcripts_from_events(spark, sf_dir)
    rendered = (
        chat_render(tx)
        .select(F.col("conv_id").alias("doc_id"), F.col("rendered").alias("text"))
        .localCheckpoint(eager=True)
    )
    pairs = minhash_lsh_candidates(rendered, num_hashes=8, bands=2, shingle_n=1)
    jac = ngram_jaccard(rendered, pairs, shingle_n=1)
    return (
        jac.select(
            "id_a",
            "id_b",
            F.floor(F.col("jaccard") * 1000000 + F.lit(0.5))
            .cast("long")
            .alias("jac_x1e6"),
        )
        .orderBy(F.desc("jac_x1e6"), "id_a", "id_b")
        .limit(20)
    )


CONV_NEAR_DUPS_SQL = f"""
{TX_SQL},
docs2 AS (
  SELECT conv_id AS doc_id,
         string_agg('<|' || CASE WHEN tool <> '' THEN 'tool:' || tool ELSE role END
                    || '|>' || text, chr(10) ORDER BY turn_idx) AS text
  FROM tx GROUP BY conv_id
),
words AS (
  SELECT doc_id, unnest(list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '))) AS w
  FROM docs2
),
sig AS (
  SELECT doc_id,
    min(md5('s0|' || w)) AS h0, min(md5('s1|' || w)) AS h1,
    min(md5('s2|' || w)) AS h2, min(md5('s3|' || w)) AS h3,
    min(md5('s4|' || w)) AS h4, min(md5('s5|' || w)) AS h5,
    min(md5('s6|' || w)) AS h6, min(md5('s7|' || w)) AS h7
  FROM words GROUP BY doc_id
),
buckets AS (
  SELECT doc_id, 0 AS band, md5(h0 || '|' || h1 || '|' || h2 || '|' || h3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(h4 || '|' || h5 || '|' || h6 || '|' || h7) AS bucket FROM sig
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
sh AS (
  SELECT doc_id, list_distinct(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS sh
  FROM docs2
)
SELECT p.id_a, p.id_b,
  CAST(floor(
    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / len(list_distinct(list_concat(a.sh, b.sh))) * 1000000 + 0.5) AS BIGINT)
    AS jac_x1e6
FROM cand p JOIN sh a ON a.doc_id = p.id_a JOIN sh b ON b.doc_id = p.id_b
ORDER BY jac_x1e6 DESC, id_a, id_b LIMIT 20
"""


def q_sessionizer_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition agreement between two sessionizers (30-min vs 60-min
    gaps) as purity/Rand/ARI — clustering_agreement reused to quantify
    how much a sessionization threshold actually changes the segmentation
    (ARI near 1e6 ⇒ the cheaper/coarser setting is safe)."""
    from .operators.clustering import clustering_agreement
    from .operators.temporal import sessionize

    ev = _t(spark, sf_dir, "events")
    s30 = sessionize(ev, ["user_id"], gap_seconds=1800).select(
        "event_id",
        F.concat_ws("#", F.col("user_id"), F.col("session_seq")).alias("c30"),
    )
    s60 = sessionize(ev, ["user_id"], gap_seconds=3600).select(
        "event_id",
        F.concat_ws("#", F.col("user_id"), F.col("session_seq")).alias("c60"),
    )
    j = s30.join(s60, "event_id")
    return clustering_agreement(j, "c30", "c60")


SESSIONIZER_AGREEMENT_SQL = """
WITH o AS (
  SELECT user_id, event_id, ts,
         CAST(floor(epoch(ts)) AS BIGINT)
           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
seqs AS (
  SELECT CAST(user_id AS VARCHAR) || '#' || CAST(
           sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)
           OVER w2 AS VARCHAR) AS ci,
         CAST(user_id AS VARCHAR) || '#' || CAST(
           sum(CASE WHEN gap IS NULL OR gap > 3600 THEN 1 ELSE 0 END)
           OVER w2 AS VARCHAR) AS lj
  FROM o
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
cells AS (SELECT ci, lj, CAST(count(*) AS BIGINT) AS nij
          FROM seqs GROUP BY ci, lj),
tot AS (SELECT CAST(sum(nij) AS BIGINT) AS n,
               CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS s_ij
        FROM cells),
aa AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS s_a
       FROM (SELECT sum(nij) AS ai FROM cells GROUP BY ci)),
bb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS s_b
       FROM (SELECT sum(nij) AS bj FROM cells GROUP BY lj)),
pp AS (SELECT CAST(sum(mx) AS BIGINT) AS pure
       FROM (SELECT max(nij) AS mx FROM cells GROUP BY ci))
SELECT n,
       CAST(pure * 1000000 // n AS BIGINT) AS purity_x1e6,
       CAST((n * (n - 1) // 2 + 2 * s_ij - s_a - s_b) * 1000000
            // greatest(n * (n - 1) // 2, 1) AS BIGINT) AS rand_x1e6,
       CAST(CASE WHEN (n * (n - 1) // 2) * (s_a + s_b) - 2 * s_a * s_b = 0
                 THEN 1000000 ELSE
            2 * ((n * (n - 1) // 2) * s_ij - s_a * s_b) * 1000000
            // ((n * (n - 1) // 2) * (s_a + s_b) - 2 * s_a * s_b)
            END AS BIGINT) AS ari_x1e6
FROM tot, aa, bb, pp
"""


# ---------------------------------------------------------------------------
# Q: k-anonymity/l-diversity audit + water-filling budget allocation
# ---------------------------------------------------------------------------


def q_k_anonymity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (dq.k_anonymity_report) over the
    (lang, source) quasi-identifier with length bands as the sensitive
    attribute — the privacy screen before a corpus ships (the EVENT-side
    risk profile lives under the `k_anonymity` key)."""
    from .operators.dq import k_anonymity_report

    docs = _t(spark, sf_dir, "documents").withColumn(
        "band", F.expr("CAST(n_chars DIV 200 AS BIGINT)")
    )
    return k_anonymity_report(docs, ["lang", "source"], "band", k=5)


K_ANONYMITY_DOCS_SQL = """
WITH g AS (
  SELECT lang || '|' || source AS group_key,
         CAST(n_chars // 200 AS VARCHAR) AS sv
  FROM documents
)
SELECT group_key, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT sv) AS BIGINT) AS l_div,
       CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS BIGINT) AS k_ok,
       CAST(CASE WHEN count(DISTINCT sv) >= 2 THEN 1 ELSE 0 END AS BIGINT)
         AS l_ok
FROM g GROUP BY group_key
"""


def q_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling allocation of half the corpus token budget across
    sources (sampling.budget_waterfill): weight = doc count, capacity =
    source token total — closed-form saturation order, no driver loop."""
    from .operators.sampling import budget_waterfill

    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(
            F.split(
                F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "),
                " ",
            ),
            lambda t: t != F.lit(""),
        )
    ).cast("long")
    srcs = docs.select("source", ntok.alias("ntok")).groupBy("source").agg(
        F.count(F.lit(1)).alias("w"), F.sum("ntok").alias("cap")
    )
    total = srcs.agg(F.sum("cap")).first()[0]
    return budget_waterfill(srcs, int(total) // 2)


BUDGET_WATERFILL_SQL = """
WITH toks AS (
  SELECT source, CAST(len(list_filter(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
    t -> t <> '')) AS BIGINT) AS ntok
  FROM documents
),
srcs AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS w,
                CAST(sum(ntok) AS BIGINT) AS cap
         FROM toks GROUP BY source),
bb AS (SELECT CAST(sum(cap) // 2 AS BIGINT) AS b FROM srcs),
pre AS (
  SELECT src, w, cap,
         CAST(coalesce(sum(cap) OVER wo, 0) AS BIGINT) AS c_prev,
         CAST(coalesce(sum(w) OVER wo, 0) AS BIGINT) AS w_prev
  FROM (SELECT *, cap * 1000000 // greatest(w, 1) AS ratio FROM srcs)
  WINDOW wo AS (ORDER BY ratio, src
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
tww AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM srcs),
flagged AS (
  SELECT src, w, cap,
         CASE WHEN cap * (tw - w_prev) <= (b - c_prev) * w
              THEN 1 ELSE 0 END AS capped
  FROM pre, tww, bb
),
sat AS (SELECT CAST(coalesce(sum(CASE WHEN capped = 1 THEN cap END), 0)
               AS BIGINT) AS sc,
               CAST(coalesce(sum(CASE WHEN capped = 1 THEN w END), 0)
               AS BIGINT) AS sw
        FROM flagged),
alloc AS (
  SELECT src, w, cap, capped,
         CAST(CASE WHEN capped = 1 THEN cap
              WHEN tw - sw <= 0 THEN 0
              ELSE greatest(b - sc, 0) * w // (tw - sw) END AS BIGINT)
           AS alloc
  FROM flagged, sat, tww, bb
),
lo AS (SELECT CAST((SELECT b FROM bb) - sum(alloc) AS BIGINT) AS leftover
       FROM alloc)
SELECT src AS source, w, cap, alloc, CAST(capped AS BIGINT) AS capped,
       leftover
FROM alloc, lo
"""


# ---------------------------------------------------------------------------
# Q: double-sweep diameter lower bound on the divide lattice
# ---------------------------------------------------------------------------


def q_diameter_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep BFS diameter lower bound
    (graph_algos.double_sweep_diameter) on the symmetrized divide
    lattice — pinned seeds, O(diameter) frontier rounds; the exact
    companion to HyperBall."""
    from .operators.graph_algos import double_sweep_diameter

    return double_sweep_diameter(_divide_dag_edges(spark, sf_dir))


DIAMETER_LATTICE_SQL = """
WITH RECURSIVE und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(c_custkey // 2 AS BIGINT) AS dst
      FROM customer WHERE c_custkey >= 2
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey // 3 AS BIGINT)
      FROM customer WHERE c_custkey >= 3
        AND c_custkey // 3 <> c_custkey // 2
    )
    UNION ALL
    SELECT dst, src FROM (
      SELECT CAST(c_custkey AS BIGINT) AS src,
             CAST(c_custkey // 2 AS BIGINT) AS dst
      FROM customer WHERE c_custkey >= 2
      UNION ALL
      SELECT CAST(c_custkey AS BIGINT), CAST(c_custkey // 3 AS BIGINT)
      FROM customer WHERE c_custkey >= 3
        AND c_custkey // 3 <> c_custkey // 2
    )
  )
),
s1 AS (SELECT min(src) AS seed FROM und),
walk1 AS (
  SELECT seed AS node, CAST(0 AS BIGINT) AS d FROM s1
  UNION
  SELECT u.dst, w.d + 1
  FROM walk1 w JOIN und u ON u.src = w.node
  WHERE w.d < 32
),
dist1 AS (SELECT node, CAST(min(d) AS BIGINT) AS d FROM walk1 GROUP BY node),
far AS (SELECT node AS seed2, d AS ecc1 FROM dist1
        ORDER BY d DESC, node ASC LIMIT 1),
walk2 AS (
  SELECT seed2 AS node, CAST(0 AS BIGINT) AS d FROM far
  UNION
  SELECT u.dst, w.d + 1
  FROM walk2 w JOIN und u ON u.src = w.node
  WHERE w.d < 32
),
dist2 AS (SELECT node, CAST(min(d) AS BIGINT) AS d FROM walk2 GROUP BY node)
SELECT (SELECT CAST(seed AS BIGINT) FROM s1) AS seed1,
       (SELECT CAST(seed2 AS BIGINT) FROM far) AS seed2,
       (SELECT CAST(ecc1 AS BIGINT) FROM far) AS ecc1,
       CAST(max(d) AS BIGINT) AS diameter_lb
FROM dist2
"""


# ---------------------------------------------------------------------------
# Q: Mood's median test + Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


def q_moods_median_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types on value cents
    (classifier.moods_median): 2×k above-pooled-median chi-square with
    128-bit cells — the assumption-free location screen."""
    from .operators.classifier import moods_median

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return moods_median(pts, "event_type", "cents")


MOODS_MEDIAN_SQL = """
WITH base AS (
  SELECT event_type AS g, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x
  FROM events
),
vtot AS (SELECT x, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY x),
nn0 AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM base),
med AS (
  SELECT min(x) AS med FROM (
    SELECT x, sum(c) OVER (ORDER BY x
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM vtot
  ), nn0 WHERE cum >= (n_total + 1) // 2
),
per AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_j,
         CAST(sum(CASE WHEN x > med THEN 1 ELSE 0 END) AS BIGINT) AS a_j
  FROM base, med GROUP BY g
),
tot AS (SELECT CAST(sum(n_j) AS BIGINT) AS nn, CAST(sum(a_j) AS BIGINT) AS aa
        FROM per),
terms AS (
  SELECT g, n_j, a_j,
    CASE WHEN aa = 0 OR aa = nn THEN NULL ELSE
      CAST(a_j * nn - n_j * aa AS HUGEINT) * (a_j * nn - n_j * aa)
        * 1000000 // (CAST(nn AS HUGEINT) * n_j * aa)
      + CAST((n_j - a_j) * nn - n_j * (nn - aa) AS HUGEINT)
        * ((n_j - a_j) * nn - n_j * (nn - aa)) * 1000000
        // (CAST(nn AS HUGEINT) * n_j * (nn - aa))
    END AS term
  FROM per, tot
),
chi AS (SELECT CAST(sum(term) AS BIGINT) AS chi2_x1e6 FROM terms)
SELECT g AS grp, n_j, a_j AS n_above, chi2_x1e6 FROM terms, chi
"""


def q_runs_test_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test on the SES residual signs per event type
    (classifier.runs_test over temporal.ses_forecast): sign-clustering
    randomness check beside durbin_watson."""
    from .operators.classifier import runs_test
    from .operators.temporal import ses_forecast

    ev = _t(spark, sf_dir, "events")
    series = ev.groupBy(
        "event_type",
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 AS BIGINT)"
        ).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("c"))
    ses = ses_forecast(series, "event_type", "hr", "c", window=16).filter(
        F.col("next_err").isNotNull()
    )
    return runs_test(ses, "key", "o", "next_err")


def _runs_test_sql() -> str:
    terms = []
    pres = []
    for i in range(16):
        wt = 1 << (15 - i)
        lag = "x" if i == 0 else f"lag(x, {i}) OVER w"
        terms.append(
            f"CASE WHEN {lag} IS NOT NULL THEN ({lag}) * {wt} ELSE 0 END"
        )
        pres.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0 END")
    num = " + ".join(terms)
    den = " + ".join(pres)
    return f"""
WITH {_hourly_series_sql().strip()},
lagged AS (
  SELECT key, o, x,
         CAST({num} AS BIGINT) AS nm,
         CAST({den} AS BIGINT) AS dn,
         lead(x) OVER w AS nxt
  FROM series
  WINDOW w AS (PARTITION BY key ORDER BY o)
),
resid AS (
  SELECT key, o,
         CASE WHEN nxt - nm // dn >= 0 THEN 1 ELSE 0 END AS sgn
  FROM lagged WHERE nxt IS NOT NULL
),
lag2 AS (
  SELECT key, sgn, lag(sgn) OVER (PARTITION BY key ORDER BY o) AS prev
  FROM resid
),
per AS (
  SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(sgn) AS BIGINT) AS n1,
         CAST(1 + sum(CASE WHEN prev IS NOT NULL AND prev <> sgn
                      THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM lag2 GROUP BY key
)
SELECT key, n, n1 AS n_pos, r AS n_runs,
  CAST(CASE WHEN 2 * n1 * (n - n1) <= n OR n < 2 THEN NULL ELSE
    CAST(r * n - n - 2 * n1 * (n - n1) AS HUGEINT)
    * (r * n - n - 2 * n1 * (n - n1)) * (n - 1) * 1000000
    // (CAST(2 AS HUGEINT) * n1 * (n - n1) * (2 * n1 * (n - n1) - n))
  END AS BIGINT) AS z2_x1e6
FROM per
"""


RUNS_TEST_SQL = _runs_test_sql()


# ---------------------------------------------------------------------------
# Q: simplified silhouette of the k-means clustering
# ---------------------------------------------------------------------------


def q_silhouette_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (clustering.simplified_silhouette) of the
    2-round k-means partition: int8-quantized centroid distances, exact
    integer squared-distance scores — the INTERNAL fit score beside the
    external clustering_agreement/vmeasure."""
    from .operators.clustering import kmeans, simplified_silhouette

    emb = _t(spark, sf_dir, "embeddings")
    _, cents = kmeans(emb, k=4, iterations=2)
    return simplified_silhouette(emb, cents)


_SIL_QUANT = (
    "CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0"
    " THEN list_transform(v, x -> 0)"
    " ELSE list_transform(v, x -> CAST(floor(x * 127.0 /"
    " list_max(list_transform(v, y -> abs(y))) + 0.5) AS INTEGER)) END"
)

SILHOUETTE_KMEANS_SQL = f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, v
  FROM (SELECT * FROM emb ORDER BY vec_id LIMIT 4)
),
a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c0 c
  ) WHERE rn = 1
),
u1 AS (
  SELECT a.cluster, d.i, floor(avg(e.v[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a1 a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY a.cluster, d.i
),
c1 AS (
  SELECT CAST(cluster AS INTEGER) AS cid, list(x ORDER BY i) AS v
  FROM u1 GROUP BY cluster
),
a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, c.cid AS cluster,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_sum(list_transform(list_zip(e.v, c.v), x -> (x[1]-x[2])*(x[1]-x[2]))), c.cid
           ) AS rn
    FROM emb e CROSS JOIN c1 c
  ) WHERE rn = 1
),
u2 AS (
  SELECT a.cluster, d.i, floor(avg(e.v[d.i]) * 1000000 + 0.5) / 1000000 AS x
  FROM a2 a JOIN emb e USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d
  GROUP BY a.cluster, d.i
),
c2 AS (
  SELECT CAST(cluster AS INTEGER) AS cid, list(x ORDER BY i) AS v
  FROM u2 GROUP BY cluster
),
qc AS (SELECT cid, {_SIL_QUANT} AS q FROM c2),
qe AS (SELECT vec_id, {_SIL_QUANT} AS q FROM emb),
dists AS (
  SELECT e.vec_id, c.cid,
         CAST(list_sum(list_transform(list_zip(e.q, c.q),
           x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2]))) AS BIGINT) AS d
  FROM qe e CROSS JOIN qc c
),
ranked AS (
  SELECT vec_id, cid, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
  FROM dists
),
ab AS (
  SELECT r1.vec_id, r1.cid AS cluster, r1.d AS a, r2.d AS b
  FROM ranked r1 JOIN ranked r2
    ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
),
sc AS (SELECT cluster,
              (b - a) * 1000000 // greatest(greatest(a, b), 1) AS s
       FROM ab)
SELECT CAST(cluster AS VARCHAR) AS cluster, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(s) // count(*) AS BIGINT) AS mean_s_x1e6
FROM sc GROUP BY cluster
UNION ALL
SELECT '__overall__', CAST(count(*) AS BIGINT),
       CAST(sum(s) // count(*) AS BIGINT)
FROM sc
"""


# ---------------------------------------------------------------------------
# Q: weighted-Jaccard source similarity + exact L-moments
# ---------------------------------------------------------------------------


def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Jaccard similarity between sources' term-count vectors
    (text.source_similarity): Σmin/Σmax with Σmax never materialized —
    the which-corpora-overlap matrix for mixing decisions."""
    from .operators.text import source_similarity

    return source_similarity(_t(spark, sf_dir, "documents"))


SOURCE_SIMILARITY_SQL = """
WITH toks AS (
  SELECT source AS src, unnest(list_filter(string_split(
    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' '),
    t -> t <> '')) AS tok
  FROM documents
),
cnt AS (SELECT src, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY src, tok),
tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS t FROM cnt GROUP BY src),
inter AS (
  SELECT a.src AS src_a, b.src AS src_b,
         CAST(count(*) AS BIGINT) AS n_common,
         CAST(sum(least(a.c, b.c)) AS BIGINT) AS smin
  FROM cnt a JOIN cnt b ON a.tok = b.tok AND a.src < b.src
  GROUP BY a.src, b.src
)
SELECT src_a, src_b, n_common,
  CAST(smin * 1000000 // greatest(ta.t + tb.t - smin, 1) AS BIGINT)
    AS wj_x1e6
FROM inter
JOIN tot ta ON ta.src = inter.src_a
JOIN tot tb ON tb.src = inter.src_b
"""


def q_l_moments_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact L-moments per event type on value cents
    (classifier.l_moments): L1/L2/τ3 from collapsed-run closed forms —
    the robust distribution-shape card."""
    from .operators.classifier import l_moments

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return l_moments(pts, "event_type", "cents")


L_MOMENTS_SQL = """
WITH cells AS (
  SELECT event_type AS key, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
runs AS (
  SELECT key, v, c,
         1 + CAST(coalesce(sum(c) OVER (PARTITION BY key ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS a
  FROM cells
),
per AS (
  SELECT key, CAST(sum(c) AS BIGINT) AS n,
         sum(CAST(v AS HUGEINT) * c) AS sx,
         sum(CAST(v AS HUGEINT) * (c * (2 * a + c - 3) // 2)) AS s1,
         sum(CAST(v AS HUGEINT)
             * (CAST(a + c - 1 AS HUGEINT) * (a + c - 2) * (a + c - 3)
                - CAST(a - 1 AS HUGEINT) * (a - 2) * (a - 3))) AS s2
  FROM runs GROUP BY key
)
SELECT key, n,
  CAST(sx * 1000000 // n AS BIGINT) AS l1_x1e6,
  CAST(CASE WHEN n < 3 THEN NULL ELSE
    (2 * s1 * (n - 2) - sx * (n - 1) * (n - 2)) * 1000000
    // (CAST(n AS HUGEINT) * (n - 1) * (n - 2))
  END AS BIGINT) AS l2_x1e6,
  CAST(CASE WHEN n < 3
            OR (2 * s1 * (n - 2) - sx * (n - 1) * (n - 2)) = 0 THEN NULL ELSE
    (2 * s2 - 6 * s1 * (n - 2) + sx * (n - 1) * (n - 2)) * 1000000
    // (2 * s1 * (n - 2) - sx * (n - 1) * (n - 2))
  END AS BIGINT) AS t3_x1e6
FROM per
"""


# ---------------------------------------------------------------------------
# Q: Benjamini-Yekutieli FDR + Dunning G-test
# ---------------------------------------------------------------------------


def q_by_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Yekutieli step-up at alpha=10% on the same planted-p
    nation fixture as bh_fdr (classifier.by_select): the
    any-dependence-safe variant — its harmonic-penalized budget rejects
    a SUBSET of BH's rejections, the honest conservative readout."""
    from .operators.classifier import by_select
    from .operators.sketches import _hash32

    n = _t(spark, sf_dir, "nation").select(
        "n_name",
        F.when(
            F.expr("n_nationkey % 8 = 0"),
            F.expr("1 + n_nationkey % 3"),
        )
        .otherwise(
            _hash32(F.concat(F.lit("bh:"), F.col("n_name"))) % 1000 + 1
        )
        .cast("long")
        .alias("p_num"),
        F.lit(1001).cast("long").alias("p_den"),
    )
    out = by_select(n, alpha=(10, 100), key_col="n_name",
                    p_num_col="p_num", p_den_col="p_den")
    return out.select(
        F.col("key").alias("n_name"), "p_num", "p_den", "rnk", "rejected"
    )


BY_FDR_SQL = """
WITH hyp AS (
  SELECT n_name,
         CAST(CASE WHEN n_nationkey % 8 = 0 THEN 1 + n_nationkey % 3
              ELSE CAST(concat('0x', substr(md5('bh:' || n_name), 1, 8))
                   AS BIGINT) % 1000 + 1 END AS BIGINT) AS p_num,
         CAST(1001 AS BIGINT) AS p_den
  FROM nation
),
ranked AS (
  SELECT n_name, p_num, p_den,
         CAST(row_number() OVER (ORDER BY p_num ASC, n_name ASC) AS BIGINT)
           AS rnk,
         CAST(count(*) OVER () AS BIGINT) AS m
  FROM hyp
),
harm AS (
  SELECT *, CAST(sum(1000000000 // rnk) OVER () AS BIGINT) AS c9 FROM ranked
),
crossed AS (
  SELECT *,
         max(CASE WHEN CAST(p_num AS HUGEINT) * m * c9 * 100
                   <= CAST(rnk AS HUGEINT) * 10 * p_den * 1000000000
             THEN rnk END) OVER () AS istar
  FROM harm
)
SELECT n_name, p_num, p_den, rnk,
       rnk <= coalesce(istar, 0) AS rejected
FROM crossed
"""


def q_g_test_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning G² independence test of event type × user cohort
    (classifier.g_test): msb16 log-likelihood terms with exact offset
    removal — chi-square's sparse-safe sibling."""
    from .operators.classifier import g_test

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type", F.expr("CAST(user_id % 3 AS BIGINT)").alias("cohort")
    )
    return g_test(base, "event_type", "cohort")


def _g_test_sql() -> str:
    m16 = _duck_msb16("o * n * 1048576 // (r * c)")
    return f"""
WITH cells AS (
  SELECT event_type AS a, CAST(user_id % 3 AS BIGINT) AS b,
         CAST(count(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2
),
ra AS (SELECT a, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY a),
cb AS (SELECT b, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY b),
nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT o, o * ({m16}) AS t16
  FROM cells JOIN ra USING (a) JOIN cb USING (b), nn
),
kk AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM ra) AS ka,
              (SELECT CAST(count(*) AS BIGINT) FROM cb) AS kb)
SELECT CAST(sum(o) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST((ka - 1) * (kb - 1) AS BIGINT) AS dof,
       CAST(2 * (sum(t16) - 320 * sum(o)) AS BIGINT) AS g2_16log2
FROM terms, kk
GROUP BY ka, kb
"""


G_TEST_SQL = _g_test_sql()


# ---------------------------------------------------------------------------
# Q: Cramér-von Mises two-sample per event type
# ---------------------------------------------------------------------------


def q_cvm_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CvM two-sample per event type (classifier.cvm_two_sample): odd vs
    even users' cents — the integrated-ECDF drift statistic beside
    ks_drift's max gap, collapsed-run closed forms throughout."""
    from .operators.classifier import cvm_two_sample

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return cvm_two_sample(base, "event_type", "g", "cents")


CVM_TYPES_SQL = """
WITH cells AS (
  SELECT event_type AS key, CAST(user_id % 2 AS BIGINT) AS g,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
vtot AS (SELECT key, v, CAST(sum(c) AS BIGINT) AS tv
         FROM cells GROUP BY key, v),
pooled AS (
  SELECT key, v,
         2 * (1 + CAST(coalesce(sum(tv) OVER (PARTITION BY key ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           + tv - 1 AS r2
  FROM vtot
),
runs AS (
  SELECT c.key, c.g, c.c,
         p.r2 - 2 * (1 + CAST(coalesce(sum(c.c) OVER (
           PARTITION BY c.key, c.g ORDER BY c.v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT))
           AS d
  FROM cells c JOIN pooled p ON p.key = c.key AND p.v = c.v
),
rsum AS (
  SELECT key, g, CAST(sum(c) AS BIGINT) AS ng,
         sum(CAST(d AS HUGEINT) * d * c
             - 2 * CAST(d AS HUGEINT) * c * (c - 1)
             + 2 * (CAST(c - 1 AS HUGEINT) * c * (2 * c - 1)) // 3) AS sg
  FROM runs GROUP BY key, g
),
wide AS (
  SELECT key,
         CAST(sum(CASE WHEN g = 0 THEN ng END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN g = 1 THEN ng END) AS BIGINT) AS n1,
         sum(CASE WHEN g = 0 THEN sg END) AS s0,
         sum(CASE WHEN g = 1 THEN sg END) AS s1
  FROM rsum GROUP BY key
)
SELECT key, n0, n1,
  CAST(CASE WHEN n0 IS NULL OR n1 IS NULL THEN NULL
       ELSE n0 * s0 + n1 * s1 END AS BIGINT) AS u4,
  CAST(CASE WHEN n0 IS NULL OR n1 IS NULL THEN NULL ELSE
    (n0 * s0 + n1 * s1) * 1000000
      // (CAST(4 AS HUGEINT) * n0 * n1 * (n0 + n1))
    - (4 * CAST(n0 AS HUGEINT) * n1 - 1) * 1000000 // (6 * (n0 + n1))
  END AS BIGINT) AS t_x1e6
FROM wide
"""


# ---------------------------------------------------------------------------
# Q: Average Precision / MAP + Kuiper two-sample
# ---------------------------------------------------------------------------


def q_map_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AP@10 + MAP of the BM25 run judged by phrase-match
    pseudo-relevance (retrieval.average_precision) — the rank-weighted
    completion of retrieval_eval's MRR/P/R."""
    from .operators.retrieval import (
        average_precision,
        bm25_search,
        build_inverted_index,
        phrase_search,
    )

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs).localCheckpoint(eager=True)
    ranked = bm25_search(index, docs, "fast join vector", k=10).withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    labels = phrase_search(index, "fast join").withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    return average_precision(ranked, labels, k=10)


MAP_BM25_SQL = f"""
WITH ranked AS ({BM25_SQL}),
ptoks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l
        FROM documents)
),
p0 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'fast'),
p1 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'join'),
labels AS (
  SELECT DISTINCT p0.doc_id
  FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_rel FROM labels),
hits AS (
  SELECT r.rank, CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ranked r LEFT JOIN labels l ON l.doc_id = r.doc_id
  WHERE r.rank <= 10
),
terms AS (
  SELECT rel, rank,
         sum(rel) OVER (ORDER BY rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM hits
),
ap AS (
  SELECT CAST(CASE WHEN (SELECT n_rel FROM nrel) = 0 THEN 0 ELSE
    sum(CASE WHEN rel = 1 THEN cum * 1000000 // rank ELSE 0 END)
    // least((SELECT n_rel FROM nrel), 10) END AS BIGINT) AS ap_x1e6
  FROM terms
)
SELECT 'q_fast_join_vector' AS query_id,
       (SELECT n_rel FROM nrel) AS n_rel, ap_x1e6 FROM ap
UNION ALL
SELECT '__map__', (SELECT n_rel FROM nrel), ap_x1e6 FROM ap
"""


def q_kuiper_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper V per event type, odd vs even users' cents
    (classifier.kuiper_two_sample): D⁺ + D⁻, the tail-sensitive sibling
    of the KS gap."""
    from .operators.classifier import kuiper_two_sample

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return kuiper_two_sample(base, "event_type", "g", "cents")


KUIPER_TYPES_SQL = """
WITH cells AS (
  SELECT event_type AS key, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c0,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT key,
         sum(c0) OVER w AS k0, sum(c1) OVER w AS k1
  FROM cells
  WINDOW w AS (PARTITION BY key ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (SELECT key, CAST(sum(c0) AS BIGINT) AS n0,
               CAST(sum(c1) AS BIGINT) AS n1
        FROM cells GROUP BY key),
gaps AS (
  SELECT c.key, t.n0, t.n1, c.k0 * t.n1 - c.k1 * t.n0 AS gap
  FROM cum c JOIN tot t USING (key)
)
SELECT key, CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1,
  CAST(CASE WHEN max(n0) = 0 OR max(n1) = 0 THEN NULL ELSE
    (greatest(max(gap), 0) + greatest(-min(gap), 0)) * 1000000
    // (max(n0) * max(n1))
  END AS BIGINT) AS v_x1e6
FROM gaps GROUP BY key
"""


# ---------------------------------------------------------------------------
# Q: Vargha-Delaney A + Kendall tau-b
# ---------------------------------------------------------------------------


def q_vargha_delaney_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vargha-Delaney Â per event type, odd vs even users' cents
    (classifier.vargha_delaney_a): the stochastic-superiority effect
    size beside cohens_d — exact doubled contract on collapsed cells."""
    from .operators.classifier import vargha_delaney_a

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    return vargha_delaney_a(base, "event_type", "g", "cents")


VARGHA_DELANEY_SQL = """
WITH cells AS (
  SELECT event_type AS key, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c0,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c1
  FROM events GROUP BY 1, 2
),
pre AS (
  SELECT key, c0, c1,
         CAST(coalesce(sum(c0) OVER (PARTITION BY key ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS c0_less
  FROM cells
)
SELECT key, CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
  CAST(CASE WHEN sum(c0) = 0 OR sum(c1) = 0 THEN NULL ELSE
    (2 * sum(CAST(c1 AS HUGEINT) * c0_less)
     + sum(CAST(c1 AS HUGEINT) * c0)) * 1000000
    // (2 * CAST(sum(c0) AS HUGEINT) * sum(c1))
  END AS BIGINT) AS a_x1e6
FROM pre GROUP BY key
"""


def q_kendall_taub_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b per event type between value cents and hour-of-day
    (classifier.kendall_taub): dense-grid prefix concordance — never
    pairwise; signed-square emit with both tie margins corrected."""
    from .operators.classifier import kendall_taub

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"),
        F.expr(
            "CAST(unix_micros(CAST(ts AS TIMESTAMP)) DIV 3600000000 % 24"
            " AS BIGINT)"
        ).alias("hr"),
    )
    return kendall_taub(base, "event_type", "cents", "hr")


KENDALL_TAUB_SQL = """
WITH cells AS (
  SELECT event_type AS key, CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(epoch_us(ts) // 3600000000 % 24 AS BIGINT) AS y,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
),
xs AS (SELECT DISTINCT key, x FROM cells),
ys AS (SELECT DISTINCT key, y FROM cells),
grid AS (
  SELECT xs.key, xs.x, ys.y, CAST(coalesce(c.c, 0) AS BIGINT) AS c
  FROM xs JOIN ys USING (key)
  LEFT JOIN cells c ON c.key = xs.key AND c.x = xs.x AND c.y = ys.y
),
pre AS (
  SELECT key, x, y, c,
         CAST(coalesce(sum(c) OVER (PARTITION BY key, y ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cx_less
  FROM grid
),
acc AS (
  SELECT key, c,
         CAST(coalesce(sum(cx_less) OVER (PARTITION BY key, x ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS a,
         CAST(coalesce(sum(cx_less) OVER (PARTITION BY key, x ORDER BY y
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0) AS BIGINT)
           AS b
  FROM pre
),
sums AS (
  SELECT key, CAST(sum(c) AS BIGINT) AS n,
         2 * sum(CAST(c AS HUGEINT) * a) AS c2,
         2 * sum(CAST(c AS HUGEINT) * b) AS d2
  FROM acc GROUP BY key
),
txx AS (SELECT key, sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS tx
        FROM (SELECT key, x, CAST(sum(c) AS BIGINT) AS t
              FROM cells GROUP BY key, x) GROUP BY key),
tyy AS (SELECT key, sum(CAST(t AS HUGEINT) * (t - 1) // 2) AS ty
        FROM (SELECT key, y, CAST(sum(c) AS BIGINT) AS t
              FROM cells GROUP BY key, y) GROUP BY key)
SELECT s.key, s.n,
  CAST(c2 AS BIGINT) AS conc2, CAST(d2 AS BIGINT) AS disc2,
  CAST(CASE WHEN (CAST(s.n AS HUGEINT) * (s.n - 1) // 2 - tx)
             * (CAST(s.n AS HUGEINT) * (s.n - 1) // 2 - ty) <= 0 THEN NULL
       ELSE CAST(sign(c2 - d2) AS HUGEINT)
         * ((c2 - d2) // 2) * ((c2 - d2) // 2) * 1000000
         // ((CAST(s.n AS HUGEINT) * (s.n - 1) // 2 - tx)
             * (CAST(s.n AS HUGEINT) * (s.n - 1) // 2 - ty))
  END AS BIGINT) AS taub2_x1e6
FROM sums s JOIN txx USING (key) JOIN tyy USING (key)
"""


# ---------------------------------------------------------------------------
# Q: Rank-Biased Precision (bit-shift weights) + Simpson diversity
# ---------------------------------------------------------------------------


def q_rbp_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBP at p=1/2 of the BM25 run (retrieval.rank_biased_precision):
    geometric user-model weights as EXACT bit shifts — no quantized log
    anywhere; residual emitted per the metric's definition."""
    from .operators.retrieval import (
        bm25_search,
        build_inverted_index,
        phrase_search,
        rank_biased_precision,
    )

    docs = _t(spark, sf_dir, "documents")
    index = build_inverted_index(docs).localCheckpoint(eager=True)
    ranked = bm25_search(index, docs, "fast join vector", k=10).withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    labels = phrase_search(index, "fast join").withColumn(
        "query_id", F.lit("q_fast_join_vector")
    )
    return rank_biased_precision(ranked, labels, k=10)


RBP_BM25_SQL = f"""
WITH ranked AS ({BM25_SQL}),
ptoks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS pos
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS l
        FROM documents)
),
p0 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'fast'),
p1 AS (SELECT doc_id, pos FROM ptoks WHERE term = 'join'),
labels AS (
  SELECT DISTINCT p0.doc_id
  FROM p0 JOIN p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
),
hits AS (
  SELECT r.rank, CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ranked r LEFT JOIN labels l ON l.doc_id = r.doc_id
  WHERE r.rank <= 10
),
per AS (
  SELECT CAST(sum(rel) AS BIGINT) AS n_hits,
         CAST(sum(rel * (1000000 // (CAST(1 AS BIGINT) << rank)))
           AS BIGINT) AS rbp_x1e6
  FROM hits
)
SELECT 'q_fast_join_vector' AS query_id, n_hits, rbp_x1e6,
       CAST(976 AS BIGINT) AS residual_x1e6
FROM per
UNION ALL
SELECT '__mean__', n_hits, rbp_x1e6, CAST(976 AS BIGINT) FROM per
"""


def q_simpson_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson language diversity per source (text.simpson_diversity):
    exact without-replacement collision probability, diversity index and
    effective language count — no logs at all."""
    from .operators.text import simpson_diversity

    return simpson_diversity(
        _t(spark, sf_dir, "documents"), "source", "lang"
    )


SIMPSON_SOURCES_SQL = """
WITH per AS (
  SELECT source AS key, lang AS cat, CAST(count(*) AS BIGINT) AS c
  FROM documents GROUP BY source, lang
),
agg AS (
  SELECT key, CAST(sum(c) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cats,
         sum(CAST(c AS HUGEINT) * (c - 1)) AS rep
  FROM per GROUP BY key
)
SELECT key, n, n_cats,
  CAST(CASE WHEN n < 2 THEN NULL ELSE
    rep * 1000000 // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT)
    AS lambda_x1e6,
  CAST(CASE WHEN n < 2 THEN NULL ELSE
    1000000 - rep * 1000000 // (CAST(n AS HUGEINT) * (n - 1)) END AS BIGINT)
    AS diversity_x1e6,
  CAST(CASE WHEN n < 2 OR rep = 0 THEN NULL ELSE
    CAST(n AS HUGEINT) * (n - 1) * 1000 // rep END AS BIGINT)
    AS eff_cats_x1e3
FROM agg
"""


# ---------------------------------------------------------------------------
# Q: 2×2 effect measures (odds ratio / risk ratio / risk difference)
# ---------------------------------------------------------------------------


def q_effect_measures_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR / RR / RD per event type between odd and even users on the
    cents-mod success flag (classifier.effect_measures_2x2) — how BIG
    beside prop_ztest's is-it-real."""
    from .operators.classifier import effect_measures_2x2

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"),
        F.expr(
            "CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 7 < 3"
            " THEN 1 ELSE 0 END"
        ).alias("s"),
    )
    return effect_measures_2x2(base, "event_type", "g", "s")


EFFECT_MEASURES_SQL = """
WITH base AS (
  SELECT event_type AS key, CAST(user_id % 2 AS BIGINT) AS g,
         CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT) % 7 < 3
              THEN 1 ELSE 0 END AS s
  FROM events
),
per AS (
  SELECT key,
    CAST(sum(CASE WHEN g = 1 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
    CAST(sum(CASE WHEN g = 1 AND s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
    CAST(sum(CASE WHEN g = 0 AND s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
    CAST(sum(CASE WHEN g = 0 AND s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
  FROM base GROUP BY key
)
SELECT key, a, b, c, d,
  CAST(CASE WHEN b = 0 OR c = 0 THEN NULL ELSE
    CAST(a AS HUGEINT) * d * 1000000 // (CAST(b AS HUGEINT) * c)
  END AS BIGINT) AS or_x1e6,
  CAST(CASE WHEN a + b = 0 OR c = 0 THEN NULL ELSE
    CAST(a AS HUGEINT) * (c + d) * 1000000
    // (CAST(a + b AS HUGEINT) * c)
  END AS BIGINT) AS rr_x1e6,
  CAST(CASE WHEN a + b = 0 OR c + d = 0 THEN NULL ELSE
    (CAST(a AS HUGEINT) * (c + d) - CAST(c AS HUGEINT) * (a + b)) * 1000000
    // (CAST(a + b AS HUGEINT) * (c + d))
  END AS BIGINT) AS rd_x1e6
FROM per
"""


# ---------------------------------------------------------------------------
# Q: Youden cutpoint for the affinity quality classifier
# ---------------------------------------------------------------------------


def q_youden_cutpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal is-English filter threshold by Youden's J
    (classifier.youden_cutpoint over classify_documents scores): the
    choose-the-cutoff step a curation filter ships with."""
    from .operators.classifier import classify_documents, youden_cutpoint

    docs = _t(spark, sf_dir, "documents").withColumn(
        "is_en", F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END")
    )
    scored = classify_documents(docs, "is_en").join(
        docs.select(F.col("doc_id").alias("id"), "is_en"), "id"
    )
    return youden_cutpoint(scored, "score_x1e6", "is_en")


YOUDEN_CUTPOINT_SQL = """
WITH toks AS (
  SELECT doc_id AS id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos,
         unnest(string_split(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
  FROM documents
),
model AS (
  SELECT tok,
         (CAST(sum(is_pos) AS BIGINT) + 1) * 1000000
           // (CAST(count(*) AS BIGINT) + 2) AS affinity_x1e6
  FROM toks GROUP BY tok
),
scored AS (
  SELECT t.id,
         CAST(sum(m.affinity_x1e6) // count(*) AS BIGINT) AS score_x1e6
  FROM toks t JOIN model m USING (tok)
  GROUP BY t.id
),
lab AS (
  SELECT s.score_x1e6 AS t,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM scored s JOIN documents d ON d.doc_id = s.id
),
cells AS (SELECT t, CAST(sum(y) AS BIGINT) AS pos,
                 CAST(sum(1 - y) AS BIGINT) AS neg
          FROM lab GROUP BY t),
pre AS (
  SELECT t,
         sum(pos) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
         sum(neg) OVER (ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
         sum(pos) OVER () AS p_tot,
         sum(neg) OVER () AS n_tot
  FROM cells
),
jj AS (
  SELECT t, tp, fp, p_tot, n_tot,
         tp * 1000000 // p_tot - fp * 1000000 // n_tot AS j_x1e6
  FROM pre WHERE p_tot > 0 AND n_tot > 0
)
SELECT CAST(t AS BIGINT) AS threshold, CAST(tp AS BIGINT) AS tp,
       CAST(fp AS BIGINT) AS fp,
       CAST(p_tot - tp AS BIGINT) AS fn, CAST(n_tot - fp AS BIGINT) AS tn,
       CAST(j_x1e6 AS BIGINT) AS j_x1e6
FROM jj ORDER BY j_x1e6 DESC, t ASC LIMIT 1
"""


QUERIES = {
    "youden_cutpoint": q_youden_cutpoint,
    "effect_measures_types": q_effect_measures_types,
    "rbp_bm25": q_rbp_bm25,
    "simpson_sources": q_simpson_sources,
    "vargha_delaney_types": q_vargha_delaney_types,
    "kendall_taub_types": q_kendall_taub_types,
    "map_bm25": q_map_bm25,
    "kuiper_types": q_kuiper_types,
    "cvm_types": q_cvm_types,
    "by_fdr": q_by_fdr,
    "g_test_types": q_g_test_types,
    "source_similarity": q_source_similarity,
    "l_moments_types": q_l_moments_types,
    "silhouette_kmeans": q_silhouette_kmeans,
    "moods_median_types": q_moods_median_types,
    "runs_test_ses": q_runs_test_ses,
    "diameter_lattice": q_diameter_lattice,
    "k_anonymity_docs": q_k_anonymity_docs,
    "budget_waterfill": q_budget_waterfill,
    "markov_entropy_rate": q_markov_entropy,
    "conv_near_dups": q_conv_near_dups,
    "sessionizer_agreement": q_sessionizer_agreement,
    "cochran_q_types": q_cochran_types,
    "jonckheere_types": q_jonckheere_types,
    "durbin_watson_ses": q_durbin_watson_ses,
    "chao1_docs": q_chao1_docs,
    "cronbach_types": q_cronbach_types,
    "cohens_d_types": q_cohens_d_types,
    "distinct_n_diversity": q_distinct_n,
    "duplicate_turn_rate": q_dup_turn_rate,
    "vmeasure_kmeans": q_vmeasure_kmeans,
    "prop_ztest_types": q_prop_ztest_types,
    "grubbs_types": q_grubbs_types,
    "sample_quantiles": q_sample_quantiles,
    "nb_crossval": q_nb_crossval,
    "friedman_events": q_friedman_events,
    "mase_hourly": q_mase_hourly,
    "anova_events": q_anova_events,
    "brown_forsythe_events": q_brown_forsythe_events,
    "pca_component": q_pca_component,
    "wilcoxon_paired": q_wilcoxon_paired,
    "kruskal_events": q_kruskal_events,
    "ses_hourly": q_ses_hourly,
    "page_hinkley_hourly": q_page_hinkley_hourly,
    "clustering_agreement": q_clustering_agreement,
    "krippendorff_docs": q_krippendorff_docs,
    "blocking_eval": q_blocking_eval,
    "flesch_docs": q_flesch_docs,
    "mcnemar_langid": q_mcnemar_langid,
    "mcc_langid": q_mcc_langid,
    "eigencentrality_bipartite": q_eigencentrality,
    "mmr_rerank_docs": q_mmr_rerank,
    "heaps_profile": q_heaps_profile,
    "macro_f1_langid": q_macro_f1_langid,
    "naive_bayes_lang": q_naive_bayes_lang,
    "knn_vote": q_knn_vote,
    "ndcg_bm25": q_ndcg_bm25,
    "chat_render": q_chat_render,
    "context_tail_budget": q_context_tail,
    "regen_latest_wins": q_regen_latest_wins,
    "good_turing": q_good_turing,
    "spam_mass": q_spam_mass,
    "max_coverage_docs": q_max_coverage_docs,
    "frequent_triples": q_frequent_triples,
    "bradley_terry": q_bradley_terry,
    "hill_tail": q_hill_tail,
    "kl_drift": q_kl_drift,
    "welch_t": q_welch_t,
    "url_dedup": q_url_dedup,
    "robust_means": q_robust_means,
    "gini_user_activity": q_gini_user_activity,
    "benford_screen": q_benford_screen,
    "stable_match": q_stable_match,
    "haar_energy": q_haar_energy,
    "dq_suite": q_dq_suite,
    "dq_referential": q_dq_referential,
    "ams_f2": q_ams_f2,
    "control_chart": q_control_chart,
    "rouge2_pairs": q_rouge2_pairs,
    "bleu_pairs": q_bleu_pairs,
    "logrank_test": q_logrank_test,
    "kaplan_meier": q_kaplan_meier,
    "bh_fdr": q_bh_fdr,
    "sprt_decisions": q_sprt_decisions,
    "louvain_round": q_louvain_round,
    "incremental_bm25": q_incremental_bm25,
    "influence_seeds": q_influence_seeds,
    "fs_weights": q_fs_weights,
    "fs_match_scores": q_fs_match_scores,
    "soundex_portable": q_soundex_portable,
    "fano_burstiness": q_fano_burstiness,
    "degree_assortativity": q_degree_assortativity,
    "ngram_novelty": q_ngram_novelty,
    "newman_modularity": q_newman_modularity,
    "rake_keywords": q_rake_keywords,
    "changepoint_scan": q_changepoint_scan,
    "mutual_information": q_mutual_information,
    "pmi_collocations": q_pmi_collocations,
    "event_search_2iter": q_event_search,
    "info_counters": q_info_counters,
    "triple_prf1": q_triple_prf1,
    "apply_referents": q_apply_referents,
    "scan_filter_chain": q_scan_filter_chain,
    "transitive_closure": q_transitive_closure,
    "n_hop_neighbors": q_n_hop_neighbors,
    "pagerank_2iter": q_pagerank_2iter,
    "pagerank_dangling": q_pagerank_dangling,
    "wikidata_scan_chain": q_wikidata_scan_chain,
    "kmeans_2iter": q_kmeans_2iter,
    "semantic_dedup": q_semantic_dedup,
    "cluster_quota_sample": q_cluster_quota_sample,
    "quantized_topk": q_quantized_topk,
    "phrase_search_docs": q_phrase_search,
    "bm25_topk": q_bm25_topk,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "tfidf_top_terms": q_tfidf_top_terms,
    "entity_type_discard": q_entity_type_discard,
    "frame_count_per_event": q_frame_count_per_event,
    "sem_emission_rules": q_sem_emission_rules,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "lang_id_multi": q_lang_id_multi,
    "subword_tokens": q_subword_tokens,
    "embedding_near_dups": q_embedding_near_dups,
    "lsh_topk_portable": q_lsh_topk_portable,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "flagship_event_graph": q_flagship_event_graph,
    "transcripts_view": q_transcripts_view,
    "occurrence_count": q_occurrence_count,
    "entropy_rank_top1": q_entropy_rank_top1,
    "frontier_expand_outgoing": q_frontier_expand_outgoing,
    "two_hop_expand": q_two_hop_expand,
    "anti_join_visited": q_anti_join_visited,
    "temporal_discard": q_temporal_discard,
    "regex_year_discard": q_regex_year_discard,
    "superclass_annotate": q_superclass_annotate,
    "window_lead_next": q_window_lead_next,
    "window_first_mention": q_window_first_mention,
    "minmax_dates": q_minmax_dates,
    "dedup_exact": q_dedup_exact,
    "set_except": q_set_except,
    "count_unique_events": q_count_unique_events,
    "event_prf1": q_event_prf1,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "minhash_signature": q_minhash_signature,
    "vocab_mentions": q_vocab_mentions,
    "cosine_topk": q_cosine_topk,
    "cc_canonical": q_cc_canonical,
    "cc_canonical_agg": q_cc_canonical_agg,
    "asof_join_latest": q_asof_join_latest,
    "interval_join_pairs": q_interval_join_pairs,
    "sessionize_events": q_sessionize_events,
    "allen_relations_events": q_allen_relations,
    "k_core_users": q_k_core,
    "ann_recall_lsh": q_ann_recall,
    "neighborhood_overlap": q_neighborhood_overlap,
    "funnel_3step": q_funnel_3step,
    "ivf_topk": q_ivf_topk,
    "simhash_portable": q_simhash_portable,
    "simhash_candidates": q_simhash_candidates,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
    "fuzzy_vocab_ed1": q_fuzzy_vocab_ed1,
    "dialogue_metrics": q_dialogue_metrics,
    "random_walks_3step": q_random_walks,
    "tool_transitions": q_tool_transitions,
    "cooccurrence_lift": q_cooccurrence_lift,
    "kb_alignment_mutual": q_kb_alignment,
    "burst_hours": q_burst_hours,
    "walk_skipgrams": q_walk_skipgrams,
    "negative_samples": q_negative_samples,
    "retrieval_eval_bm25": q_retrieval_eval,
    "metapath_counts": q_metapath_counts,
    "degree_histogram": q_degree_histogram,
    "split_token_budget": q_split_token_budget,
    "bpe_merges": q_bpe_merges,
    "bpe_segment_counts": q_bpe_segment_counts,
    "path_rules": q_path_rules,
    "fuse_attributes": q_fuse_attributes,
    "er_fuse_pipeline": q_er_fuse_pipeline,
    "transe_link_pred": q_transe_link_pred,
    "er_clustering_eval": q_er_clustering_eval,
    "gazetteer_mentions": q_gazetteer_mentions,
    "temporal_kg_asof": q_temporal_kg_asof,
    "bpe_fertility": q_bpe_fertility,
    "budget_sample": q_budget_sample,
    "template_profile": q_template_profile,
    "er_threshold_curve": q_er_threshold_curve,
    "distant_patterns": q_distant_patterns,
    "affinity_classifier": q_affinity_classifier,
    "snowball_triples": q_snowball_triples,
    "classifier_pr_curve": q_classifier_pr_curve,
    "ssl_labels": q_ssl_labels,
    "subclass_induction": q_subclass_induction,
    "disjointness_induction": q_disjointness_induction,
    "context_windows": q_context_windows,
    "bgp_path_ancestors": q_bgp_path_ancestors,
    "shape_violations": q_shape_violations,
    "bm25_many": q_bm25_many,
    "hyperball_balls": q_hyperball,
    "bfs_landmarks": q_bfs_landmarks,
    "ppr_seeds": q_ppr_seeds,
    "luby_mis_2round": q_luby_mis,
    "clustering_coef": q_clustering_coef,
    "kcenter_coreset": q_kcenter,
    "anaphora_resolution": q_anaphora,
    "span_dedup_rewrite": q_span_dedup_rewrite,
    "cdc_dedup_profile": q_cdc_dedup,
    "domain_range_direct": q_domain_range_direct,
    "join_size_estimate": q_join_size_estimate,
    "rdfs_closure": q_rdfs_closure,
    "priority_sample": q_priority_sample,
    "priority_sample_groups": q_priority_sample_groups,
    "blocked_er_scores": q_blocked_er,
    "scd2_intervals": q_scd2_intervals,
    "textrank_keywords": q_textrank,
    "tool_loop_runs": q_tool_loops,
    "constraint_class_walk": q_constraint_walk,
    "neighborhood_function": q_neighborhood_function,
    "k_truss_edges": q_k_truss,
    "topic_boundaries": q_topic_boundaries,
    "comention_graph": q_comention_graph,
    "kg_profile": q_kg_profile,
    "entity_salience": q_entity_salience,
    "entity_timeline_edges": q_entity_timeline_edges,
    "event_coreference": q_event_coreference,
    "dialogue_curation": q_dialogue_curation,
    "bigram_typicality": q_bigram_typicality,
    "community_stats": q_community_stats,
    "fuzzy_canonical_vocab": q_fuzzy_canonical_vocab,
    "topic_segments": q_topic_segments,
    "ann_recall_pq": q_ann_recall_pq,
    "curation_score": q_curation_score,
    "transition_reciprocity": q_transition_reciprocity,
    "hourly_profile": q_hourly_profile,
    "conv_split": q_conv_split,
    "split_balance": q_split_balance,
    "hll_distinct_users": q_hll_distinct_users,
    "cms_heavy_tokens": q_cms_heavy_tokens,
    "bloom_decontaminate": q_bloom_decontaminate,
    "domain_mix_sample": q_domain_mix_sample,
    "pack_sequences": q_pack_sequences,
    "scrub_pii": q_scrub_pii,
    "repetition_metrics": q_repetition_metrics,
    "label_propagation": q_label_propagation,
    "chunk_documents": q_chunk_documents,
    "boilerplate_clean": q_boilerplate_removal,
    "corpus_overlap": q_corpus_overlap,
    "curation_gopher": q_curation_gopher,
    "hll_users_by_type": q_hll_users_by_type,
    "repeated_ngram_spans": q_repeated_ngram_spans,
    "pq_adc_topk": q_pq_adc_topk,
    "triangle_count": q_triangle_count,
    "zorder_values": q_zorder_values,
    "hist_quantiles": q_hist_quantiles,
    "rollup_orders": q_rollup_orders,
    "pivot_event_counts": q_pivot_event_counts,
    "quantiles_by_type": q_quantiles_by_type,
    "ng_sub_events": q_ng_sub_events,
    "bgp_sub_events": q_bgp_sub_events,
    "ng_actor_events": q_ng_actor_events,
    "ng_events_in_period": q_ng_events_in_period,
    "ng_actor_interaction": q_ng_actor_interaction,
    "ng_event_frames": q_ng_event_frames,
    "ng_causes_consequences": q_ng_causes_consequences,
    "gold_graph": q_gold_graph,
    "props_json_stats": q_props_json_stats,
    "stratified_sample": q_stratified_sample,
    "np_chunks": q_np_chunks,
    "dedup_keep_best": q_dedup_keep_best,
    "near_dup_clusters": q_near_dup_clusters,
    "near_dup_clusters_fast": q_near_dup_clusters_fast,
    "contamination": q_contamination,
    "curation_pipeline": q_curation_pipeline,
    "sql_revenue_by_nation": q_sql_revenue_by_nation,
    "scc_nations": q_scc_nations,
    "scc_nations_direct": q_scc_nations_direct,
    "salted_count_types": q_salted_count_types,
    "salted_join_nation": q_salted_join_nation,
    "char_sets_users": q_char_sets_users,
    "char_sets_graph": q_char_sets_graph,
    "star_card_estimate": q_star_card_estimate,
    "sssp_nations": q_sssp_nations,
    "truth_discovery": q_truth_discovery,
    "fd_profile": q_fd_profile,
    "k_anonymity": q_k_anonymity,
    "ind_profile": q_ind_profile,
    "frequent_subseqs": q_frequent_subseqs,
    "hits_nations": q_hits_nations,
    "resample_gapfill": q_resample_gapfill,
    "l_diversity": q_l_diversity,
    "pca_scores": q_pca_scores,
    "t_closeness": q_t_closeness,
    "modularity_regions": q_modularity_regions,
    "coalesce_intervals": q_coalesce_intervals,
    "skyline_docs": q_skyline_docs,
    "snm_pairs": q_snm_pairs,
    "cusum_level_shift": q_cusum_level_shift,
    "copurchase_brands": q_copurchase_brands,
    "cohort_retention": q_cohort_retention,
    "acf_daily_rates": q_acf_daily_rates,
    "harmonic_closeness": q_harmonic_closeness,
    "mk_trend": q_mk_trend,
    "gini_users": q_gini_users,
    "cusum_online": q_cusum_online,
    "gk_lambda": q_gk_lambda,
    "decayed_activity": q_decayed_activity,
    "snm_levenshtein": q_snm_levenshtein,
    "reciprocity_trade": q_reciprocity_trade,
    "completeness_docs": q_completeness_docs,
    "benford_orders": q_benford_orders,
    "novelty_curve": q_novelty_curve,
    "rolling_7d": q_rolling_7d,
    "kfold_report": q_kfold_report,
    "feature_propagation": q_feature_propagation,
    "domain_range": q_domain_range,
    "validate_rules": q_validate_rules,
    "label_centroids": q_label_centroids,
    "type_drift": q_type_drift,
    "coburst_xcorr": q_coburst_xcorr,
    "zorder_docs": q_zorder_docs,
    "label_noise": q_label_noise,
    "survival_users": q_survival_users,
    "pagerank_weighted": q_pagerank_weighted,
    "classifier_calibration": q_classifier_calibration,
    "brand_movers": q_brand_movers,
    "value_outliers": q_value_outliers,
    "script_mix": q_script_mix,
    "sft_pipeline": q_sft_pipeline,
    "hard_negatives": q_hard_negatives,
    "partition_checksums": q_partition_checksums,
    "bow_dups": q_bow_dups,
    "tx_conformance": q_tx_conformance,
    "centroid_shift": q_centroid_shift,
    "budget_curve": q_budget_curve,
    "source_overlap": q_source_overlap,
    "blocking_quality": q_blocking_quality,
    "seasonal_profile": q_seasonal_profile,
    "gap_histogram": q_gap_histogram,
    "term_movers": q_term_movers,
    "ra_linkpred": q_ra_linkpred,
    "ks_drift": q_ks_drift,
    "assortativity": q_assortativity,
    "wl_classes": q_wl_classes,
    "cube_orders": q_cube_orders,
    "ucc_profile": q_ucc_profile,
    "dp_type_counts": q_dp_type_counts,
    "soundex_blocks": q_soundex_blocks,
    "densest_rounds": q_densest_rounds,
    "encoding_anomalies": q_encoding_anomalies,
    "conformal_value": q_conformal_value,
    "tool_cache_hits": q_tool_cache_hits,
    "w1_drift": q_w1_drift,
    "kappa_raters": q_kappa_raters,
    "markov_tool_eval": q_markov_tool_eval,
    "dispersion_types": q_dispersion_types,
    "percolation": q_percolation,
    "dict_advisor": q_dict_advisor,
    "temporal_motifs": q_temporal_motifs,
    "phash_dups": q_phash_dups,
    "rich_club": q_rich_club,
    "seasonal_anomalies": q_seasonal_anomalies,
    "persistent_users": q_persistent_users,
    "pass_at_k": q_pass_at_k,
    "stress_centrality": q_stress_centrality,
    "theilsen_types": q_theilsen_types,
    "funnel_report": q_funnel_report,
    "global_quantiles": q_global_quantiles,
    "bowley_types": q_bowley_types,
    "bgp_minus_open": q_bgp_minus_open,
    "grouped_quantiles": q_grouped_quantiles,
    "winsorized_value": q_winsorized_value,
    "mst_trade": q_mst_trade,
    "matching_trade": q_matching_trade,
    "simrank_trade": q_simrank_trade,
    "bootstrap_value_ci": q_bootstrap_value_ci,
    "spearman_value_ts": q_spearman_value_ts,
    "aa_linkpred": q_aa_linkpred,
    "kmv_distinct_users": q_kmv_distinct_users,
    "hhi_users": q_hhi_users,
    "dbscan_blobs": q_dbscan_blobs,
    "kmv_jaccard_types": q_kmv_jaccard_types,
    "ols_slope_types": q_ols_slope_types,
    "contingency_type_hour": q_contingency_type_hour,
    "chi2_type_dow": q_chi2_type_dow,
    "viterbi_sessions": q_viterbi_sessions,
    "burst_sessions": q_burst_sessions,
    "wis_sessions": q_wis_sessions,
    "lis_value_runs": q_lis_value_runs,
    "rephrase_turns": q_rephrase_turns,
    "rfm_users": q_rfm_users,
    "corr_matrix_events": q_corr_matrix_events,
    "perm_test_value": q_perm_test_value,
    "brier_forecast": q_brier_forecast,
    "attribution_touch": q_attribution_touch,
    "peak_concurrency": q_peak_concurrency,
    "zipf_slope_docs": q_zipf_slope_docs,
    "uplift_dayparts": q_uplift_dayparts,
    "trade_embeddedness": q_trade_embeddedness,
    "rebalance_types": q_rebalance_types,
    "did_value": q_did_value,
    "cuped_value": q_cuped_value,
    "growth_accounting": q_growth_accounting,
    "record_counts": q_record_counts,
    "vocab_richness": q_vocab_richness,
    "simpsons_trap": q_simpsons_trap,
    "bloom_fp_calibration": q_bloom_fp_calibration,
    "decision_stump_error": q_decision_stump_error,
    "katz_tools": q_katz_tools,
    "auc_priority": q_auc_priority,
    "dsir_bucket_llr": q_dsir_bucket_llr,
    "dsir_topk": q_dsir_topk,
    "dag_path_stats": q_dag_path_stats,
    "dag_depth_hist": q_dag_depth_hist,
    "incremental_cc": q_incremental_cc,
    "incremental_cc_delta": q_incremental_cc_delta,
    "node2vec_walks": q_node2vec_walks,
    "preference_pairs": q_preference_pairs,
    "bigram_nll_docs": q_bigram_nll_docs,
    "pagerank_warm_resume": q_pagerank_warm_resume,
    "bloom_semijoin": q_bloom_semijoin,
    "graph_coarsen": q_graph_coarsen,
    "multilevel_partition": q_multilevel_partition,
    "isotonic_calibration": q_isotonic_calibration,
    "incremental_lsh_pairs": q_incremental_lsh_pairs,
}

ORACLE_SQL = {
    "youden_cutpoint": YOUDEN_CUTPOINT_SQL,
    "effect_measures_types": EFFECT_MEASURES_SQL,
    "rbp_bm25": RBP_BM25_SQL,
    "simpson_sources": SIMPSON_SOURCES_SQL,
    "vargha_delaney_types": VARGHA_DELANEY_SQL,
    "kendall_taub_types": KENDALL_TAUB_SQL,
    "map_bm25": MAP_BM25_SQL,
    "kuiper_types": KUIPER_TYPES_SQL,
    "cvm_types": CVM_TYPES_SQL,
    "by_fdr": BY_FDR_SQL,
    "g_test_types": G_TEST_SQL,
    "source_similarity": SOURCE_SIMILARITY_SQL,
    "l_moments_types": L_MOMENTS_SQL,
    "silhouette_kmeans": SILHOUETTE_KMEANS_SQL,
    "moods_median_types": MOODS_MEDIAN_SQL,
    "runs_test_ses": RUNS_TEST_SQL,
    "diameter_lattice": DIAMETER_LATTICE_SQL,
    "k_anonymity_docs": K_ANONYMITY_DOCS_SQL,
    "budget_waterfill": BUDGET_WATERFILL_SQL,
    "markov_entropy_rate": MARKOV_ENTROPY_SQL,
    "conv_near_dups": CONV_NEAR_DUPS_SQL,
    "sessionizer_agreement": SESSIONIZER_AGREEMENT_SQL,
    "cochran_q_types": COCHRAN_Q_SQL,
    "jonckheere_types": JONCKHEERE_SQL,
    "durbin_watson_ses": DURBIN_WATSON_SQL,
    "chao1_docs": CHAO1_SQL,
    "cronbach_types": CRONBACH_SQL,
    "cohens_d_types": COHENS_D_SQL,
    "distinct_n_diversity": DISTINCT_N_SQL,
    "duplicate_turn_rate": DUP_TURN_RATE_SQL,
    "vmeasure_kmeans": VMEASURE_KMEANS_SQL,
    "prop_ztest_types": PROP_ZTEST_SQL,
    "grubbs_types": GRUBBS_TYPES_SQL,
    "sample_quantiles": SAMPLE_QUANTILES_SQL,
    "nb_crossval": NB_CROSSVAL_SQL,
    "friedman_events": FRIEDMAN_EVENTS_SQL,
    "mase_hourly": MASE_HOURLY_SQL,
    "anova_events": ANOVA_EVENTS_SQL,
    "brown_forsythe_events": BROWN_FORSYTHE_SQL,
    "pca_component": PCA_COMPONENT_SQL,
    "wilcoxon_paired": WILCOXON_PAIRED_SQL,
    "kruskal_events": KRUSKAL_EVENTS_SQL,
    "ses_hourly": SES_HOURLY_SQL,
    "page_hinkley_hourly": PAGE_HINKLEY_SQL,
    "clustering_agreement": CLUSTERING_AGREEMENT_SQL,
    "krippendorff_docs": KRIPPENDORFF_SQL,
    "blocking_eval": BLOCKING_EVAL_SQL,
    "flesch_docs": READABILITY_SQL,
    "mcnemar_langid": MCNEMAR_LANGID_SQL,
    "mcc_langid": MCC_LANGID_SQL,
    "eigencentrality_bipartite": EIGENCENTRALITY_SQL,
    "mmr_rerank_docs": MMR_RERANK_SQL,
    "heaps_profile": HEAPS_PROFILE_SQL,
    "macro_f1_langid": MACRO_F1_LANGID_SQL,
    "naive_bayes_lang": NB_LANG_SQL,
    "knn_vote": KNN_VOTE_SQL,
    "ndcg_bm25": NDCG_BM25_SQL,
    "chat_render": CHAT_RENDER_SQL,
    "context_tail_budget": CONTEXT_TAIL_SQL,
    "regen_latest_wins": REGEN_LATEST_WINS_SQL,
    "good_turing": GOOD_TURING_SQL,
    "spam_mass": SPAM_MASS_SQL,
    "max_coverage_docs": MAX_COVERAGE_DOCS_SQL,
    "frequent_triples": FREQUENT_TRIPLES_SQL,
    "bradley_terry": BRADLEY_TERRY_SQL,
    "hill_tail": HILL_TAIL_SQL,
    "kl_drift": KL_DRIFT_SQL,
    "welch_t": WELCH_T_SQL,
    "url_dedup": URL_DEDUP_SQL,
    "robust_means": ROBUST_MEANS_SQL,
    "gini_user_activity": GINI_USER_ACTIVITY_SQL,
    "benford_screen": BENFORD_SCREEN_SQL,
    "stable_match": STABLE_MATCH_SQL,
    "haar_energy": HAAR_ENERGY_SQL,
    "dq_suite": DQ_SUITE_SQL,
    "dq_referential": DQ_REFERENTIAL_SQL,
    "ams_f2": AMS_F2_SQL,
    "control_chart": CONTROL_CHART_SQL,
    "rouge2_pairs": ROUGE2_PAIRS_SQL,
    "bleu_pairs": BLEU_PAIRS_SQL,
    "logrank_test": LOGRANK_TEST_SQL,
    "kaplan_meier": KAPLAN_MEIER_SQL,
    "bh_fdr": BH_FDR_SQL,
    "sprt_decisions": SPRT_DECISIONS_SQL,
    "louvain_round": LOUVAIN_ROUND_SQL,
    "incremental_bm25": INCREMENTAL_BM25_SQL,
    "influence_seeds": INFLUENCE_SEEDS_SQL,
    "fs_weights": FS_WEIGHTS_SQL,
    "fs_match_scores": FS_MATCH_SCORES_SQL,
    "soundex_portable": SOUNDEX_PORTABLE_SQL,
    "fano_burstiness": FANO_BURSTINESS_SQL,
    "degree_assortativity": DEGREE_ASSORTATIVITY_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "newman_modularity": NEWMAN_MODULARITY_SQL,
    "rake_keywords": RAKE_KEYWORDS_SQL,
    "changepoint_scan": CHANGEPOINT_SCAN_SQL,
    "mutual_information": MUTUAL_INFORMATION_SQL,
    "pmi_collocations": PMI_COLLOCATIONS_SQL,
    "zorder_docs": ZORDER_DOCS_SQL,
    "label_noise": LABEL_NOISE_SQL,
    "survival_users": SURVIVAL_USERS_SQL,
    "pagerank_weighted": PAGERANK_WEIGHTED_SQL,
    "classifier_calibration": CLASSIFIER_CALIBRATION_SQL,
    "brand_movers": BRAND_MOVERS_SQL,
    "value_outliers": VALUE_OUTLIERS_SQL,
    "script_mix": SCRIPT_MIX_SQL,
    "sft_pipeline": SFT_PIPELINE_SQL,
    "hard_negatives": HARD_NEGATIVES_SQL,
    "partition_checksums": PARTITION_CHECKSUMS_SQL,
    "bow_dups": BOW_DUPS_SQL,
    "tx_conformance": TX_CONFORMANCE_SQL,
    "centroid_shift": CENTROID_SHIFT_SQL,
    "budget_curve": BUDGET_CURVE_SQL,
    "source_overlap": SOURCE_OVERLAP_SQL,
    "blocking_quality": BLOCKING_QUALITY_SQL,
    "seasonal_profile": SEASONAL_PROFILE_SQL,
    "gap_histogram": GAP_HISTOGRAM_SQL,
    "term_movers": TERM_MOVERS_SQL,
    "ra_linkpred": RA_LINKPRED_SQL,
    "ks_drift": KS_DRIFT_SQL,
    "assortativity": ASSORTATIVITY_SQL,
    "wl_classes": WL_CLASSES_SQL,
    "cube_orders": CUBE_SQL,
    "ucc_profile": UCC_PROFILE_SQL,
    "dp_type_counts": DP_TYPE_COUNTS_SQL,
    "soundex_blocks": SOUNDEX_BLOCKS_SQL,
    "densest_rounds": DENSEST_ROUNDS_SQL,
    "encoding_anomalies": ENCODING_ANOMALIES_SQL,
    "conformal_value": CONFORMAL_VALUE_SQL,
    "tool_cache_hits": TOOL_CACHE_HITS_SQL,
    "w1_drift": W1_DRIFT_SQL,
    "kappa_raters": KAPPA_RATERS_SQL,
    "markov_tool_eval": MARKOV_TOOL_EVAL_SQL,
    "dispersion_types": DISPERSION_TYPES_SQL,
    "percolation": PERCOLATION_SQL,
    "dict_advisor": DICT_ADVISOR_SQL,
    "temporal_motifs": TEMPORAL_MOTIFS_SQL,
    "phash_dups": PHASH_DUPS_SQL,
    "rich_club": RICH_CLUB_SQL,
    "seasonal_anomalies": SEASONAL_ANOMALIES_SQL,
    "persistent_users": PERSISTENT_USERS_SQL,
    "pass_at_k": PASS_AT_K_SQL,
    "stress_centrality": STRESS_CENTRALITY_SQL,
    "theilsen_types": THEILSEN_TYPES_SQL,
    "funnel_report": FUNNEL_REPORT_SQL,
    "global_quantiles": GLOBAL_QUANTILES_SQL,
    "bowley_types": BOWLEY_TYPES_SQL,
    "bgp_minus_open": BGP_MINUS_OPEN_SQL,
    "grouped_quantiles": GROUPED_QUANTILES_SQL,
    "type_drift": TYPE_DRIFT_SQL,
    "coburst_xcorr": COBURST_XCORR_SQL,
    "validate_rules": VALIDATE_RULES_SQL,
    "label_centroids": LABEL_CENTROIDS_SQL,
    "feature_propagation": FEATURE_PROP_SQL,
    "domain_range": DOMAIN_RANGE_KG_SQL,
    "rolling_7d": ROLLING_7D_SQL,
    "kfold_report": KFOLD_REPORT_SQL,
    "completeness_docs": COMPLETENESS_DOCS_SQL,
    "benford_orders": BENFORD_ORDERS_SQL,
    "novelty_curve": NOVELTY_CURVE_SQL,
    "snm_levenshtein": SNM_LEVENSHTEIN_SQL,
    "reciprocity_trade": RECIPROCITY_TRADE_SQL,
    "cusum_online": CUSUM_ONLINE_SQL,
    "gk_lambda": GK_LAMBDA_SQL,
    "decayed_activity": DECAYED_ACTIVITY_SQL,
    "mk_trend": MK_TREND_SQL,
    "gini_users": GINI_USERS_SQL,
    "acf_daily_rates": ACF_DAILY_RATES_SQL,
    "harmonic_closeness": HARMONIC_CLOSENESS_SQL,
    "cusum_level_shift": CUSUM_LEVEL_SHIFT_SQL,
    "copurchase_brands": COPURCHASE_BRANDS_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
    # Every registered query is oracle-gated. The xxhash64 variants
    # (simhash64, non-portable lsh_topk) are bench/test-only because a JVM
    # hash is semantically required there; their portable md5 twins
    # (simhash_portable, lsh_topk_portable) carry the gate.
    "truth_discovery": TRUTH_DISCOVERY_SQL,
    "fd_profile": FD_PROFILE_SQL,
    "k_anonymity": K_ANONYMITY_SQL,
    "ind_profile": IND_PROFILE_SQL,
    "frequent_subseqs": FREQUENT_SUBSEQS_SQL,
    "hits_nations": HITS_NATIONS_SQL,
    "resample_gapfill": RESAMPLE_GAPFILL_SQL,
    "l_diversity": L_DIVERSITY_SQL,
    "pca_scores": PCA_SCORES_SQL,
    "t_closeness": T_CLOSENESS_SQL,
    "modularity_regions": MODULARITY_REGIONS_SQL,
    "coalesce_intervals": COALESCE_INTERVALS_SQL,
    "skyline_docs": SKYLINE_DOCS_SQL,
    "snm_pairs": SNM_PAIRS_SQL,
    "scc_nations": SCC_NATIONS_SQL,
    "scc_nations_direct": SCC_NATIONS_SQL,
    "salted_count_types": SALTED_COUNT_TYPES_SQL,
    "salted_join_nation": SALTED_JOIN_NATION_SQL,
    "char_sets_users": CHAR_SETS_USERS_SQL,
    "char_sets_graph": CHAR_SETS_GRAPH_SQL,
    "star_card_estimate": STAR_CARD_ESTIMATE_SQL,
    "sssp_nations": SSSP_NATIONS_SQL,
    "lsh_topk_portable": LSH_TOPK_SQL,
    "multimodal_features": MULTIMODAL_FEATURES_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
    "event_search_2iter": EVENT_SEARCH_SQL,
    "info_counters": INFO_COUNTERS_SQL,
    "triple_prf1": TRIPLE_PRF1_SQL,
    "apply_referents": APPLY_REFERENTS_SQL,
    "scan_filter_chain": SCAN_FILTER_SQL,
    "transitive_closure": TRANSITIVE_SQL,
    "n_hop_neighbors": N_HOP_SQL,
    "pagerank_2iter": PAGERANK_SQL,
    "pagerank_dangling": PAGERANK_DANGLING_SQL,
    "wikidata_scan_chain": WIKIDATA_SCAN_SQL,
    "kmeans_2iter": KMEANS_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "cluster_quota_sample": CLUSTER_QUOTA_SQL,
    "quantized_topk": QUANTIZED_TOPK_SQL,
    "phrase_search_docs": PHRASE_SEARCH_SQL,
    "bm25_topk": BM25_SQL,
    "hybrid_rrf_topk": HYBRID_RRF_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "entity_type_discard": ENTITY_DISCARD_SQL,
    "frame_count_per_event": FRAME_COUNT_SQL,
    "sem_emission_rules": SEM_EMISSION_SQL,
    "minhash_lsh_pairs": MINHASH_LSH_SQL,
    "lang_id_multi": LANG_ID_MULTI_SQL,
    "subword_tokens": SUBWORD_SQL,
    "embedding_near_dups": EMB_NEAR_DUP_SQL,
    "flagship_event_graph": FLAGSHIP_SQL,
    "transcripts_view": TX_VIEW_SQL,
    "occurrence_count": "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    "entropy_rank_top1": ENTROPY_SQL,
    "frontier_expand_outgoing": FRONTIER_OUT_SQL,
    "two_hop_expand": TWO_HOP_SQL,
    "anti_join_visited": ANTI_JOIN_SQL,
    "temporal_discard": TEMPORAL_DISCARD_SQL,
    "regex_year_discard": REGEX_DISCARD_SQL,
    "superclass_annotate": SUPERCLASS_SQL,
    "window_lead_next": WINDOW_LEAD_SQL,
    "window_first_mention": WINDOW_FIRST_SQL,
    "minmax_dates": MINMAX_SQL,
    "dedup_exact": DEDUP_EXACT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "count_unique_events": COUNT_UNIQUE_SQL,
    "event_prf1": PRF1_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "quality_score": QUALITY_SQL,
    "lang_id": LANG_ID_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
    "minhash_signature": MINHASH_SQL,
    "vocab_mentions": VOCAB_MENTIONS_SQL,
    "cosine_topk": COSINE_TOPK_SQL,
    "cc_canonical": CC_SQL,
    "cc_canonical_agg": CC_SQL,
    "asof_join_latest": ASOF_SQL,
    "interval_join_pairs": INTERVAL_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "allen_relations_events": ALLEN_SQL,
    "k_core_users": K_CORE_SQL,
    "ann_recall_lsh": ANN_RECALL_SQL,
    "neighborhood_overlap": NEIGHBORHOOD_OVERLAP_SQL,
    "funnel_3step": FUNNEL_SQL,
    "ivf_topk": IVF_SQL,
    "simhash_portable": SIMHASH_PORTABLE_SQL,
    "simhash_candidates": SIMHASH_CANDIDATES_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "prefix_jaccard_pairs": PREFIX_JACCARD_SQL,
    "fuzzy_vocab_ed1": FUZZY_ED1_SQL,
    "dialogue_metrics": DIALOGUE_METRICS_SQL,
    "random_walks_3step": RANDOM_WALKS_SQL,
    "tool_transitions": TOOL_TRANSITIONS_SQL,
    "cooccurrence_lift": COOCCURRENCE_SQL,
    "kb_alignment_mutual": KB_ALIGNMENT_SQL,
    "burst_hours": BURST_HOURS_SQL,
    "walk_skipgrams": WALK_SKIPGRAMS_SQL,
    "negative_samples": NEGATIVE_SAMPLES_SQL,
    "retrieval_eval_bm25": RETRIEVAL_EVAL_SQL,
    "metapath_counts": METAPATH_SQL,
    "degree_histogram": DEGREE_HIST_SQL,
    "split_token_budget": SPLIT_TOKEN_BUDGET_SQL,
    "bpe_merges": BPE_MERGES_SQL,
    "bpe_segment_counts": BPE_SEGMENT_SQL,
    "path_rules": PATH_RULES_SQL,
    "fuse_attributes": FUSE_ATTRIBUTES_SQL,
    "er_fuse_pipeline": ER_FUSE_PIPELINE_SQL,
    "transe_link_pred": TRANSE_LINK_PRED_SQL,
    "er_clustering_eval": ER_CLUSTERING_EVAL_SQL,
    "gazetteer_mentions": GAZETTEER_MENTIONS_SQL,
    "temporal_kg_asof": TEMPORAL_KG_ASOF_SQL,
    "bpe_fertility": BPE_FERTILITY_SQL,
    "budget_sample": BUDGET_SAMPLE_SQL,
    "template_profile": TEMPLATE_PROFILE_SQL,
    "er_threshold_curve": ER_THRESHOLD_CURVE_SQL,
    "distant_patterns": DISTANT_PATTERNS_SQL,
    "affinity_classifier": AFFINITY_CLASSIFIER_SQL,
    "snowball_triples": SNOWBALL_TRIPLES_SQL,
    "classifier_pr_curve": CLASSIFIER_PR_CURVE_SQL,
    "ssl_labels": SSL_LABELS_SQL,
    "subclass_induction": SUBCLASS_INDUCTION_SQL,
    "disjointness_induction": DISJOINTNESS_INDUCTION_SQL,
    "context_windows": CONTEXT_WINDOWS_SQL,
    "bgp_path_ancestors": BGP_PATH_SQL,
    "shape_violations": SHAPE_VIOLATIONS_SQL,
    "bm25_many": BM25_MANY_SQL,
    "hyperball_balls": HYPERBALL_SQL,
    "bfs_landmarks": BFS_LANDMARKS_SQL,
    "ppr_seeds": PPR_SEEDS_SQL,
    "luby_mis_2round": LUBY_MIS_SQL,
    "clustering_coef": CLUSTERING_COEF_SQL,
    "kcenter_coreset": KCENTER_SQL,
    "anaphora_resolution": ANAPHORA_SQL,
    "span_dedup_rewrite": SPAN_DEDUP_SQL,
    "cdc_dedup_profile": CDC_DEDUP_SQL,
    "domain_range_direct": DOMAIN_RANGE_SQL,
    "join_size_estimate": JOIN_SIZE_EST_SQL,
    "rdfs_closure": RDFS_CLOSURE_SQL,
    "priority_sample": PRIORITY_SAMPLE_SQL,
    "priority_sample_groups": PRIORITY_GROUP_SQL,
    "blocked_er_scores": BLOCKED_ER_SQL,
    "scd2_intervals": SCD2_SQL,
    "textrank_keywords": TEXTRANK_SQL,
    "tool_loop_runs": TOOL_LOOPS_SQL,
    "constraint_class_walk": CONSTRAINT_WALK_SQL,
    "neighborhood_function": NEIGHBORHOOD_FN_SQL,
    "k_truss_edges": KTRUSS_SQL,
    "topic_boundaries": TOPIC_BOUNDARIES_SQL,
    "comention_graph": COMENTION_SQL,
    "kg_profile": KG_PROFILE_SQL,
    "entity_salience": ENTITY_SALIENCE_SQL,
    "entity_timeline_edges": ENTITY_TIMELINE_SQL,
    "event_coreference": EVENT_COREF_SQL,
    "dialogue_curation": DIALOGUE_CURATION_SQL,
    "bigram_typicality": BIGRAM_TYPICALITY_SQL,
    "community_stats": COMMUNITY_STATS_SQL,
    "fuzzy_canonical_vocab": FUZZY_CANONICAL_SQL,
    "topic_segments": TOPIC_SEGMENTS_SQL,
    "ann_recall_pq": ANN_RECALL_PQ_SQL,
    "curation_score": CURATION_SCORE_SQL,
    "transition_reciprocity": TRANSITION_RECIPROCITY_SQL,
    "hourly_profile": HOURLY_PROFILE_SQL,
    "conv_split": CONV_SPLIT_SQL,
    "split_balance": SPLIT_BALANCE_SQL,
    "hll_distinct_users": HLL_SQL,
    "cms_heavy_tokens": CMS_HEAVY_SQL,
    "bloom_decontaminate": BLOOM_DECONTAMINATE_SQL,
    "domain_mix_sample": DOMAIN_MIX_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "scrub_pii": SCRUB_PII_SQL,
    "repetition_metrics": REPETITION_SQL,
    "label_propagation": LABEL_PROP_SQL,
    "chunk_documents": CHUNK_DOCS_SQL,
    "boilerplate_clean": BOILERPLATE_SQL,
    "corpus_overlap": CORPUS_OVERLAP_SQL,
    "curation_gopher": CURATION_GOPHER_SQL,
    "hll_users_by_type": HLL_BY_TYPE_SQL,
    "repeated_ngram_spans": REPEATED_NGRAM_SQL,
    "pq_adc_topk": PQ_ADC_SQL,
    "triangle_count": TRIANGLE_SQL,
    "zorder_values": ZORDER_SQL,
    "hist_quantiles": HIST_QUANTILES_SQL,
    "rollup_orders": ROLLUP_SQL,
    "pivot_event_counts": PIVOT_SQL,
    "quantiles_by_type": QUANTILES_SQL,
    "ng_sub_events": NG_SUB_EVENTS_SQL,
    "bgp_sub_events": NG_SUB_EVENTS_SQL,
    "ng_actor_events": NG_ACTOR_EVENTS_SQL,
    "ng_events_in_period": NG_PERIOD_SQL,
    "ng_actor_interaction": NG_INTERACTION_SQL,
    "ng_event_frames": NG_EVENT_FRAMES_SQL,
    "ng_causes_consequences": NG_CAUSES_SQL,
    "gold_graph": GOLD_GRAPH_SQL,
    "props_json_stats": PROPS_JSON_SQL,
    "stratified_sample": STRATIFIED_SQL,
    "np_chunks": NP_CHUNKS_SQL,
    "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
    "near_dup_clusters": NEAR_DUP_CLUSTERS_SQL,
    "near_dup_clusters_fast": NEAR_DUP_CLUSTERS_SQL,
    "contamination": CONTAMINATION_SQL,
    "curation_pipeline": CURATION_SQL,
    "sql_revenue_by_nation": SQL_REVENUE_SQL,
    "winsorized_value": WINSORIZED_VALUE_SQL,
    "mst_trade": MST_TRADE_SQL,
    "matching_trade": MATCHING_TRADE_SQL,
    "simrank_trade": SIMRANK_TRADE_SQL,
    "bootstrap_value_ci": BOOTSTRAP_VALUE_CI_SQL,
    "spearman_value_ts": SPEARMAN_VALUE_TS_SQL,
    "aa_linkpred": AA_LINKPRED_SQL,
    "kmv_distinct_users": KMV_DISTINCT_USERS_SQL,
    "hhi_users": HHI_USERS_SQL,
    "dbscan_blobs": DBSCAN_BLOBS_SQL,
    "kmv_jaccard_types": KMV_JACCARD_TYPES_SQL,
    "ols_slope_types": OLS_SLOPE_TYPES_SQL,
    "contingency_type_hour": CONTINGENCY_TYPE_HOUR_SQL,
    "chi2_type_dow": CHI2_TYPE_DOW_SQL,
    "viterbi_sessions": VITERBI_SESSIONS_SQL,
    "burst_sessions": BURST_SESSIONS_SQL,
    "wis_sessions": WIS_SESSIONS_SQL,
    "lis_value_runs": LIS_VALUE_RUNS_SQL,
    "rephrase_turns": REPHRASE_TURNS_SQL,
    "rfm_users": RFM_USERS_SQL,
    "corr_matrix_events": CORR_MATRIX_EVENTS_SQL,
    "perm_test_value": PERM_TEST_VALUE_SQL,
    "brier_forecast": BRIER_FORECAST_SQL,
    "attribution_touch": ATTRIBUTION_TOUCH_SQL,
    "peak_concurrency": PEAK_CONCURRENCY_SQL,
    "zipf_slope_docs": ZIPF_SLOPE_DOCS_SQL,
    "uplift_dayparts": UPLIFT_DAYPARTS_SQL,
    "trade_embeddedness": TRADE_EMBEDDEDNESS_SQL,
    "rebalance_types": REBALANCE_TYPES_SQL,
    "did_value": DID_VALUE_SQL,
    "cuped_value": CUPED_VALUE_SQL,
    "growth_accounting": GROWTH_ACCOUNTING_SQL,
    "record_counts": RECORD_COUNTS_SQL,
    "vocab_richness": VOCAB_RICHNESS_SQL,
    "simpsons_trap": SIMPSONS_TRAP_SQL,
    "bloom_fp_calibration": BLOOM_FP_CALIBRATION_SQL,
    "decision_stump_error": DECISION_STUMP_ERROR_SQL,
    "katz_tools": KATZ_TOOLS_SQL,
    "auc_priority": AUC_PRIORITY_SQL,
    "dsir_bucket_llr": DSIR_BUCKET_SQL,
    "dsir_topk": DSIR_TOPK_SQL,
    "dag_path_stats": DAG_PATH_STATS_SQL,
    "dag_depth_hist": DAG_DEPTH_HIST_SQL,
    "incremental_cc": INCREMENTAL_CC_SQL,
    "incremental_cc_delta": INCREMENTAL_CC_DELTA_SQL,
    "node2vec_walks": NODE2VEC_WALKS_SQL,
    "preference_pairs": PREFERENCE_PAIRS_SQL,
    "bigram_nll_docs": BIGRAM_NLL_SQL,
    "pagerank_warm_resume": PAGERANK_WARM_SQL,
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "graph_coarsen": GRAPH_COARSEN_SQL,
    "multilevel_partition": MULTILEVEL_PARTITION_SQL,
    "isotonic_calibration": ISOTONIC_SQL,
    "incremental_lsh_pairs": INCREMENTAL_LSH_SQL,
}
