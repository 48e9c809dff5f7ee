"""Shared fixtures/helpers for the entry-query registry."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph


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

# ---------------------------------------------------------------------------
# NG usage queries (reference experiments_run/usage_ng/sparql_queries.py):
# basic-graph-pattern self-joins over the constructed triples table
# ---------------------------------------------------------------------------


def _flagship_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.graph.materialize import build_event_graph

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

def _hourly_series_sql() -> str:
    return """
series AS (
  SELECT event_type AS key,
         CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS o,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
)
"""
