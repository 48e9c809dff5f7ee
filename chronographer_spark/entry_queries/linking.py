"""Entity-resolution / blocking / matching queries."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph

from ._shared import (
    _duck_msb16,
    _t,
)

def q_blocked_er(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked ER scoring (linking/blocking.py blocked_match_scores):
    match customers against a deterministically perturbed copy of
    themselves (every 3rd account balance shifted, ids offset) through
    two blocking keys — (nation, segment) and (segment, balance-band) —
    with integer agreement weights on name/segment/balance-cents;
    min_score 10 keeps pairs whose name agrees. The oracle replays the
    block union, pair dedup, and weight sum."""
    from chronographer_spark.linking.blocking import blocked_match_scores

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

# ---------------------------------------------------------------------------
# Q: fuzzy ED-1 vocabulary join (typo-variant alias edges for canonicalization)
# ---------------------------------------------------------------------------


def q_fuzzy_vocab_ed1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell deletion-variant blocking + levenshtein verify over the
    combined part-name + documents vocabulary (linking/fuzzy.py). The
    oracle is the brute-force all-pairs definition, so a hash match proves
    the lossless-blocking recall claim on real data."""
    from chronographer_spark.linking.fuzzy import ed1_pairs

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
# Q: mutual-best trigram alignment between two vocabularies (KB alignment)
# ---------------------------------------------------------------------------


def q_kb_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-name vocabulary vs documents vocabulary, aligned by mutual
    best trigram-Jaccard match (linking/fuzzy.mutual_best_trigram_match).
    The oracle replays candidates, scoring, both arg-maxes, and the
    mutuality join in SQL."""
    from chronographer_spark.linking.fuzzy import mutual_best_trigram_match

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
    from chronographer_spark.linking.blocking import blocked_match_scores
    from chronographer_spark.linking.er_eval import threshold_curve

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

def q_fuse_attributes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-ER attribute fusion (linking/fusion.py): majority-vote truth
    discovery per canonical entity with a pinned tie-break (max votes, then
    smallest value) — the knowledge-consolidation step the reference leaves
    to driver-side dict update order (src/make_narrative_graph.py property
    dicts). Fixture: event assertions pooled through a mod-97 referent
    dictionary; two attributes (event type, value band) fused per canonical
    user. Two cascaded aggs, no windows; confidence is an exact integer
    quotient so DuckDB replays it bit-exactly."""
    from chronographer_spark.linking.fusion import fuse_attributes

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

# ---------------------------------------------------------------------------
# Q: iterative truth discovery (source-reliability fusion) over event claims
# ---------------------------------------------------------------------------


def q_truth_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sources are user buckets, each claiming a quantized daily value per
    event type; 2 rounds (majority vote, then reliability-weighted
    re-vote). The oracle unrolls the identical integer-exact rounds."""
    from chronographer_spark.linking.fusion import truth_discovery

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
# Q: sorted-neighborhood candidate pairs over a text-prefix order
# ---------------------------------------------------------------------------


def q_snm_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge/purge blocking over the 16-char text prefix (corpus is
    ASCII, so the two engines' string orders agree byte-for-byte);
    window 5 emits ~5n candidate pairs."""
    from chronographer_spark.linking.blocking import sorted_neighborhood_pairs

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
# Q: blocking quality of sorted-neighborhood vs exact-dup gold pairs
# ---------------------------------------------------------------------------


def q_blocking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does window-5 prefix blocking keep the true exact-duplicate pairs?
    Gold = pairs sharing the normalized-text md5; candidates = the gated
    snm_pairs set. Exact dups share their 16-char prefix, so PC should
    read high while RR stays near 1 — the combination that justifies the
    blocker. Runs one eager count (n_records), like tfidf's documented
    exception."""
    from chronographer_spark.linking.blocking import sorted_neighborhood_pairs
    from chronographer_spark.linking.er_eval import blocking_quality

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
# Q: Levenshtein-verified merge/purge candidate pairs
# ---------------------------------------------------------------------------


def q_snm_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-ER composition: window-5 sorted-neighborhood candidates
    over the 16-char prefix order, verified by edit distance on the
    64-char surface — exact/near duplicates in the corpus land at lev 0/
    small, prefix-coincidence pairs get filtered by max_dist=8."""
    from chronographer_spark.linking.blocking import blocked_levenshtein_pairs

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

def q_soundex_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable simplified-Soundex key per part (first p_name token) —
    the phonetic ER blocker rebuilt from codepoint arithmetic in BOTH
    engines (no builtin on either side), so the gate certifies the
    collapse/zero-drop/pad pipeline bit-for-bit on real word data."""
    from chronographer_spark.linking.blocking import soundex_key

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
    from chronographer_spark.linking.fs import fs_field_weights

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

    from chronographer_spark.linking.fs import fs_score_pairs

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

    from chronographer_spark.linking.matching import stable_matching

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

QUERIES = {
    "stable_match": q_stable_match,
    "fs_weights": q_fs_weights,
    "fs_match_scores": q_fs_match_scores,
    "soundex_portable": q_soundex_portable,
    "fuzzy_vocab_ed1": q_fuzzy_vocab_ed1,
    "kb_alignment_mutual": q_kb_alignment,
    "fuse_attributes": q_fuse_attributes,
    "er_threshold_curve": q_er_threshold_curve,
    "blocked_er_scores": q_blocked_er,
    "truth_discovery": q_truth_discovery,
    "snm_pairs": q_snm_pairs,
    "snm_levenshtein": q_snm_levenshtein,
    "blocking_quality": q_blocking_quality,
}

ORACLE_SQL = {
    "stable_match": STABLE_MATCH_SQL,
    "fs_weights": FS_WEIGHTS_SQL,
    "fs_match_scores": FS_MATCH_SCORES_SQL,
    "soundex_portable": SOUNDEX_PORTABLE_SQL,
    "fuzzy_vocab_ed1": FUZZY_ED1_SQL,
    "kb_alignment_mutual": KB_ALIGNMENT_SQL,
    "fuse_attributes": FUSE_ATTRIBUTES_SQL,
    "er_threshold_curve": ER_THRESHOLD_CURVE_SQL,
    "blocked_er_scores": BLOCKED_ER_SQL,
    "truth_discovery": TRUTH_DISCOVERY_SQL,
    "snm_pairs": SNM_PAIRS_SQL,
    "snm_levenshtein": SNM_LEVENSHTEIN_SQL,
    "blocking_quality": BLOCKING_QUALITY_SQL,
}
