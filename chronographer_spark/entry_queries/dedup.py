"""Dedup / similarity / sketch / clustering queries."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph

from ._shared import (
    MINHASH_LSH_SQL,
    NEAR_DUP_CLUSTERS_SQL,
    TX_SQL,
    _duck_msb16,
    _t,
)

# ---------------------------------------------------------------------------
# Dedup / similarity / text-analysis operator families
# ---------------------------------------------------------------------------


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.dedup import minhash_lsh_candidates

    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        docs, num_hashes=8, bands=2, shingle_n=1
    )

def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.dedup import embedding_near_dups

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
    from chronographer_spark.operators.similarity import lsh_topk

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
    from chronographer_spark.operators.similarity import ann_recall_report, lsh_topk, quantized_topk

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

def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.similarity import ivf_topk

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
    from chronographer_spark.operators.dedup import simhash_portable

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
    from chronographer_spark.operators.dedup import simhash_candidates, simhash_portable

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
    from chronographer_spark.operators.dedup import minhash_lsh_candidates, ngram_jaccard

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
    from chronographer_spark.operators.dedup import prefix_jaccard_join

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

def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: docs split by id into train (<250) and
    test; flag test docs sharing >= 50% of their bigram shingles with any
    train doc, under the df<=50 stopword-shingle skew guard."""
    from chronographer_spark.operators.dedup import cross_corpus_contamination

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
    from chronographer_spark.operators.dedup import near_dup_clusters_exact_first

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
    from chronographer_spark.operators.dedup import near_dup_clusters_exact_first

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
    from chronographer_spark.operators.dedup import exact_dedup_keep_best

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

# ---------------------------------------------------------------------------
# HLL sketch (portable md5 registers — oracle replays the estimate exactly)
# ---------------------------------------------------------------------------


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.sketches import hll_distinct

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
    from chronographer_spark.operators.sketches import cms_heavy_hitters

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
    from chronographer_spark.operators.sketches import hist_quantiles, hist_table

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

def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): train 8 sub-space
    codebooks (k=16, 2 Lloyd rounds, deterministic init + 1e-6 centroid
    snapping), encode the corpus to 8 code ids (map-only), then ADC top-5
    for 3 queries with integer-millionth sub-distances (order-free BIGINT
    sum). The oracle unrolls training, encoding, and ADC exactly."""
    from chronographer_spark.operators.pq import pq_topk, train_pq_codebooks

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
    from chronographer_spark.operators.dedup import repeated_ngram_spans

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
    from chronographer_spark.operators.dedup import remove_repeated_spans

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
    from chronographer_spark.operators.dedup import cdc_dedup_stats

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

def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level MinHash overlap (operators/sketches.py corpus_overlap):
    one 16-component vocabulary signature per source, pairwise component
    agreement as the Jaccard estimate. The oracle rebuilds the same salted
    md5 minima and the same pair counts."""
    from chronographer_spark.operators.sketches import corpus_overlap

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
    from chronographer_spark.operators.sketches import hll_estimate_by, hll_registers_by

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

def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-pass (operators/sketches.py
    bloom_build/bloom_maybe_contains): eval docs (doc_id % 10 == 0) set an
    m=65536-bit filter over their word bigrams; every training doc then
    counts how many of its bigrams the filter CANNOT rule out. n_maybe is
    one-sided: a bigram truly shared with the eval set always counts, plus
    the filter's replayable false positives; n_grams − n_maybe bigrams are
    PROVEN eval-free with no shuffle of the training corpus (the filter
    broadcasts — the shape that beats a shingle equi-join at 100 TB)."""
    from chronographer_spark.operators.sketches import bloom_build, bloom_maybe_contains

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

def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS inner-product join-cardinality estimate (operators/sketches.py
    cms_join_size_estimate) for the lineitem self-equi-join on l_partkey
    — a genuinely multi-multi key — next to the exact size (Σ cnt(k)²)
    so the one-sided guarantee is visible in the gate row: est >= true,
    both exact integers. The oracle replays both sketches bucket-for-
    bucket and the exact count."""
    from chronographer_spark.operators.sketches import cms_join_size_estimate

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

def q_kmeans_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (2 rounds, k=4) over the embeddings table;
    assign is map-only against broadcast centroid literals, update shuffles
    only k x dim cells. The oracle unrolls both rounds; centroid components
    are snapped to a 1e-6 grid in both engines so round 2 starts from
    identical centroids (operators/clustering.py docstring)."""
    from chronographer_spark.operators.clustering import kmeans

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
    from chronographer_spark.operators.dedup import semantic_dedup

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
    from chronographer_spark.operators.clustering import kmeans
    from chronographer_spark.operators.sampling import cluster_quota_sample

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

def q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (operators/similarity.py
    kcenter_greedy, k=3) over the int8-quantized embeddings: seed at the
    smallest vec_id, then twice promote the farthest point; emits the
    full nearest-center assignment in exact integer squared L2. The
    oracle unrolls both promotions with the identical argmax and
    tie-break rules."""
    from chronographer_spark.operators.similarity import kcenter_greedy

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
    from chronographer_spark.operators.similarity import quantized_topk

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

def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search (operators/retrieval.py rrf_fuse): BM25 top-20 for
    "fast join vector" fused with quantized-cosine top-20 for query vector 0
    by reciprocal-rank fusion (k_const=60) — the modern lexical+vector
    retrieval stack as one query. Integer per-list contributions, so the
    fused score hashes identically across engines."""
    from chronographer_spark.operators.retrieval import bm25_search, build_inverted_index, rrf_fuse
    from chronographer_spark.operators.similarity import quantized_topk

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
# Q: ANN eval harness over the PQ path (recall@5 vs exact L2)
# ---------------------------------------------------------------------------


def q_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall@k report for the PQ/ADC index against the exact integer
    L2 ranking (same metric family as the index, unlike the LSH harness's
    cosine baseline) — together the two reports cover both ANN families."""
    from chronographer_spark.operators.pq import pq_topk, train_pq_codebooks
    from chronographer_spark.operators.similarity import ann_recall_report

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

def q_transe_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TransE-style link-prediction eval (graph/link_prediction.py): learn
    the integer translation prototype of relation t = h+17 over the int8-
    quantized embeddings, then rank each test triple's true tail among ALL
    entities by the n²-scaled exact-integer distance (same argsort as the
    rational TransE distance, no float ever enters). Candidates scan is a
    map-only broadcast nested loop over the entity table; ranks, reciprocal
    ranks, and hits@10 are exact integers the oracle replays bit-for-bit."""
    from chronographer_spark.graph.link_prediction import transe_rank_eval
    from chronographer_spark.operators.similarity import quantize_vectors

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

# ---------------------------------------------------------------------------
# Q: fixed-point power-iteration PCA projection over the embeddings
# ---------------------------------------------------------------------------


def q_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-direction projection of every embedding, exact
    BIGINT end to end (quantize → scatter matrix → 2 rescaled power
    steps → projection); the oracle replays the identical fixed-point
    algebra, so the gate is a full bit-match with zero float discipline."""
    from chronographer_spark.operators.similarity import pca_power_scores

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
# Q: cross-source duplicate overlap matrix
# ---------------------------------------------------------------------------


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A deterministic 'mirror' feed re-serves every 20th document (and
    every 40th TWICE, populating the mirror's own diagonal), so the
    matrix shows exactly the cross-source and within-source duplicate
    mass the operator exists to expose."""
    from chronographer_spark.operators.dedup import source_overlap_matrix

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
# Q: per-label centroid shift between vec_id-parity snapshot halves
# ---------------------------------------------------------------------------


def q_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even vs odd vec_ids stand in for two snapshots: same distribution,
    so shifts are small sampling noise — the null calibration a monitor
    alerts against; exactness (not magnitude) is what the gate checks."""
    from chronographer_spark.operators.similarity import centroid_shift

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
# Q: bag-of-words duplicate groups over documents
# ---------------------------------------------------------------------------


def q_bow_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorder-duplicates are injected deterministically (every 20th doc
    gets a token-REVERSED twin at id+10^9 — same multiset, different
    surface), proving the bag key groups what exact dedup cannot; both
    engines replay the reversal."""
    from chronographer_spark.operators.dedup import bow_dup_groups

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
# Q: hard-negative mining over the embeddings table
# ---------------------------------------------------------------------------


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 cross-label neighbors from a 20-candidate window per anchor —
    the contrastive-training pair miner; the oracle replays the full n²
    quantized-cosine ranking, the candidate cut, the cross-label filter,
    and the re-rank."""
    from chronographer_spark.operators.similarity import hard_negatives

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
    from chronographer_spark.operators.dedup import exact_dedup
    from chronographer_spark.operators.sampling import group_kfold

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
# Q: label-noise report by quantized-cosine neighbor voting
# ---------------------------------------------------------------------------


def q_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood voting over the embeddings table (labels are random
    w.r.t. the vectors, so flagged rows are the chance 3-of-5 agreements
    — the null-calibration reading an auditor compares a REAL corpus
    against); exactness is the point: the oracle replays the full
    n² quantized-cosine vote bit-for-bit."""
    from chronographer_spark.operators.similarity import label_noise_report

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
# Q: label-centroid pooling over the embeddings table
# ---------------------------------------------------------------------------


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pool the 64-dim embeddings per label (10 centroids), then
    re-explode the assembled arrays so the gate compares exact integers
    row-wise — exercising quantization, the integer mean, AND the
    dim-ordered reassembly."""
    from chronographer_spark.operators.similarity import pool_vectors

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
# Q: perceptual-hash near-dup candidates over binary assets
# ---------------------------------------------------------------------------


def q_phash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asset near-dup via the banded Hamming join: each asset gets a
    one-bit-perturbed variant (id + 100000, phash XOR one bit keyed by
    id) — every (asset, variant) pair sits at Hamming 1 and MUST surface
    under the n_blocks-1 pigeonhole guarantee; unrelated assets collide
    only by chance. The multimodal dedup path over documents-derived
    payload bytes."""
    from chronographer_spark.operators.dedup import simhash_candidates
    from chronographer_spark.operators.multimodal import assets_from_documents, phash_signatures

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
# Q: KMV bottom-k distinct-user sketch per type
# ---------------------------------------------------------------------------


def q_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (bottom-k, k=64) distinct-user estimate per event type beside
    the exact count — at 150 distinct users per type the sketch is in
    estimation territory (n_kept = k) and the order-statistic estimator
    is an exact integer quotient both engines replay."""
    from chronographer_spark.operators.sketches import kmv_bottomk, kmv_estimate

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
# Q: grid-bucketed DBSCAN over a deterministic blob fixture
# ---------------------------------------------------------------------------


def q_dbscan_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six hash-jittered blobs (radius <= ~70, centers 1000 apart) plus a
    hash-scattered outlier sprinkle at (5000+, *) — DBSCAN(eps=200,
    min_pts=4) recovers each blob as one cluster labeled by its min id
    and reads the sprinkle as noise/micro-clusters, all pinned by the
    deterministic border rule."""
    from chronographer_spark.operators.clustering import dbscan_grid

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
    from chronographer_spark.operators.sketches import kmv_bottomk, kmv_jaccard

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
    from chronographer_spark.operators.sketches import bloom_build, bloom_maybe_contains

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
    from chronographer_spark.operators.sketches import bloom_build, bloom_maybe_contains

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

def q_incremental_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-append near-dup candidates: new docs (doc_id % 5 == 0) probe
    the stored LSH bucket index; old-old pairs are never enumerated. Must
    equal the FULL banded-LSH candidate set restricted to pairs touching a
    new doc — which is exactly what the oracle computes."""
    from chronographer_spark.operators.dedup import incremental_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return incremental_lsh_pairs(
        docs, F.col("doc_id") % 5 == 0,
        num_hashes=8, bands=2, shingle_n=1,
    )

INCREMENTAL_LSH_SQL = (
    "WITH pairs AS (" + MINHASH_LSH_SQL + ")\n"
    "SELECT id_a, id_b FROM pairs WHERE id_a % 5 = 0 OR id_b % 5 = 0"
)

# ---------------------------------------------------------------------------
# Q: AMS F2 sketch vs exact repeat rate over event user_ids
# ---------------------------------------------------------------------------


def q_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS second-moment sketch (k=16 sign estimators, pinned lower
    median) beside the exact F2 = sum of squared user frequencies — the
    self-join-size estimate a join planner consults, with the honest
    calibration readout in one row."""
    from chronographer_spark.operators.sketches import ams_f2

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

def q_knn_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN majority-vote label prediction over int8-quantized embeddings
    (similarity.knn_classify): signed-r² pure-integer cosine ordering,
    vec_id % 10 held out, packed-vote argmax with smallest-label
    tie-break. Brute-force exactness baseline; LSH/IVF candidate
    generation is the drop-in 100 TB path."""
    from chronographer_spark.operators.similarity import knn_classify

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
    from chronographer_spark.operators.dedup import (
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
    from chronographer_spark.operators.clustering import clustering_agreement, kmeans

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
       FROM (SELECT max(nij) AS mx FROM cells GROUP BY ci)),
d AS (SELECT n, s_ij, s_a, s_b, pure,
             CAST(n * (n - 1) // 2 AS HUGEINT) AS c2
      FROM tot, aa, bb, pp),
d2 AS (SELECT n, pure, c2,
             2 * (c2 * s_ij - CAST(s_a AS HUGEINT) * s_b) AS num,
             c2 * (s_a + s_b) - 2 * CAST(s_a AS HUGEINT) * s_b AS den,
             CAST(c2 + 2 * s_ij - s_a - s_b AS HUGEINT) * 1000000 AS rnum
      FROM d)
SELECT n,
       CAST(pure * 1000000 // n AS BIGINT) AS purity_x1e6,
       CAST(rnum // greatest(c2, 1) AS BIGINT) AS rand_x1e6,
       CAST(CASE WHEN den = 0 THEN 1000000
                 ELSE (num // den) * 1000000 + ((num % den) * 1000000) // den
            END AS BIGINT) AS ari_x1e6
FROM d2
"""

def q_pca_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the quantized embeddings
    (similarity.pca_top_component): dim² Gram cells, 3 signed integer
    power-iteration rounds, pinned sign — no float anywhere."""
    from chronographer_spark.operators.similarity import pca_top_component

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
# Q: sampled-quantile calibration + k-fold cross-validated NB
# ---------------------------------------------------------------------------


def q_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k-md5 sample quantiles with the exactness audit
    (sketches.sample_quantile_report): estimate, exact distributed
    quantile, and the estimate's true rank error per percentile."""
    from chronographer_spark.operators.sketches import sample_quantile_report

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

# ---------------------------------------------------------------------------
# Q: V-measure + two-proportion z² screen + Grubbs outlier screen
# ---------------------------------------------------------------------------


def q_vmeasure_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homogeneity/completeness/V-measure of the 2-round k-means
    clustering vs true labels (clustering.vmeasure): msb16-quantized
    entropies with the 320n offset cancelling in the ratios."""
    from chronographer_spark.operators.clustering import kmeans, vmeasure

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

def q_conv_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level near-duplicate candidates: chat_render
    serializes each conversation, the minhash blocker generates candidate
    pairs over the rendered text, exact 1-gram Jaccard verifies — the
    formatting + dedup stacks CHAINED (dedup templated conversations
    before SFT). Emits the top-20 most similar candidate pairs."""
    from chronographer_spark.operators.dedup import minhash_lsh_candidates, ngram_jaccard
    from chronographer_spark.operators.dialogue import chat_render

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

# ---------------------------------------------------------------------------
# Q: simplified silhouette of the k-means clustering
# ---------------------------------------------------------------------------


def q_silhouette_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified silhouette (clustering.simplified_silhouette) of the
    2-round k-means partition: int8-quantized centroid distances, exact
    integer squared-distance scores — the INTERNAL fit score beside the
    external clustering_agreement/vmeasure."""
    from chronographer_spark.operators.clustering import kmeans, simplified_silhouette

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

QUERIES = {
    "silhouette_kmeans": q_silhouette_kmeans,
    "conv_near_dups": q_conv_near_dups,
    "vmeasure_kmeans": q_vmeasure_kmeans,
    "sample_quantiles": q_sample_quantiles,
    "pca_component": q_pca_component,
    "clustering_agreement": q_clustering_agreement,
    "blocking_eval": q_blocking_eval,
    "knn_vote": q_knn_vote,
    "ams_f2": q_ams_f2,
    "kmeans_2iter": q_kmeans_2iter,
    "semantic_dedup": q_semantic_dedup,
    "cluster_quota_sample": q_cluster_quota_sample,
    "quantized_topk": q_quantized_topk,
    "hybrid_rrf_topk": q_hybrid_rrf_topk,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "embedding_near_dups": q_embedding_near_dups,
    "lsh_topk_portable": q_lsh_topk_portable,
    "ann_recall_lsh": q_ann_recall,
    "ivf_topk": q_ivf_topk,
    "simhash_portable": q_simhash_portable,
    "simhash_candidates": q_simhash_candidates,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
    "transe_link_pred": q_transe_link_pred,
    "kcenter_coreset": q_kcenter,
    "span_dedup_rewrite": q_span_dedup_rewrite,
    "cdc_dedup_profile": q_cdc_dedup,
    "join_size_estimate": q_join_size_estimate,
    "ann_recall_pq": q_ann_recall_pq,
    "hll_distinct_users": q_hll_distinct_users,
    "cms_heavy_tokens": q_cms_heavy_tokens,
    "bloom_decontaminate": q_bloom_decontaminate,
    "corpus_overlap": q_corpus_overlap,
    "hll_users_by_type": q_hll_users_by_type,
    "repeated_ngram_spans": q_repeated_ngram_spans,
    "pq_adc_topk": q_pq_adc_topk,
    "hist_quantiles": q_hist_quantiles,
    "dedup_keep_best": q_dedup_keep_best,
    "near_dup_clusters_fast": q_near_dup_clusters_fast,
    "contamination": q_contamination,
    "curation_pipeline": q_curation_pipeline,
    "pca_scores": q_pca_scores,
    "label_centroids": q_label_centroids,
    "label_noise": q_label_noise,
    "sft_pipeline": q_sft_pipeline,
    "hard_negatives": q_hard_negatives,
    "bow_dups": q_bow_dups,
    "centroid_shift": q_centroid_shift,
    "source_overlap": q_source_overlap,
    "phash_dups": q_phash_dups,
    "kmv_distinct_users": q_kmv_distinct_users,
    "dbscan_blobs": q_dbscan_blobs,
    "kmv_jaccard_types": q_kmv_jaccard_types,
    "bloom_fp_calibration": q_bloom_fp_calibration,
    "bloom_semijoin": q_bloom_semijoin,
    "incremental_lsh_pairs": q_incremental_lsh_pairs,
}

ORACLE_SQL = {
    "silhouette_kmeans": SILHOUETTE_KMEANS_SQL,
    "conv_near_dups": CONV_NEAR_DUPS_SQL,
    "vmeasure_kmeans": VMEASURE_KMEANS_SQL,
    "sample_quantiles": SAMPLE_QUANTILES_SQL,
    "pca_component": PCA_COMPONENT_SQL,
    "clustering_agreement": CLUSTERING_AGREEMENT_SQL,
    "blocking_eval": BLOCKING_EVAL_SQL,
    "knn_vote": KNN_VOTE_SQL,
    "ams_f2": AMS_F2_SQL,
    "kmeans_2iter": KMEANS_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "cluster_quota_sample": CLUSTER_QUOTA_SQL,
    "quantized_topk": QUANTIZED_TOPK_SQL,
    "hybrid_rrf_topk": HYBRID_RRF_SQL,
    "minhash_lsh_pairs": MINHASH_LSH_SQL,
    "embedding_near_dups": EMB_NEAR_DUP_SQL,
    "lsh_topk_portable": LSH_TOPK_SQL,
    "ann_recall_lsh": ANN_RECALL_SQL,
    "ivf_topk": IVF_SQL,
    "simhash_portable": SIMHASH_PORTABLE_SQL,
    "simhash_candidates": SIMHASH_CANDIDATES_SQL,
    "ngram_jaccard_pairs": NGRAM_JACCARD_SQL,
    "prefix_jaccard_pairs": PREFIX_JACCARD_SQL,
    "transe_link_pred": TRANSE_LINK_PRED_SQL,
    "kcenter_coreset": KCENTER_SQL,
    "span_dedup_rewrite": SPAN_DEDUP_SQL,
    "cdc_dedup_profile": CDC_DEDUP_SQL,
    "join_size_estimate": JOIN_SIZE_EST_SQL,
    "ann_recall_pq": ANN_RECALL_PQ_SQL,
    "hll_distinct_users": HLL_SQL,
    "cms_heavy_tokens": CMS_HEAVY_SQL,
    "bloom_decontaminate": BLOOM_DECONTAMINATE_SQL,
    "corpus_overlap": CORPUS_OVERLAP_SQL,
    "hll_users_by_type": HLL_BY_TYPE_SQL,
    "repeated_ngram_spans": REPEATED_NGRAM_SQL,
    "pq_adc_topk": PQ_ADC_SQL,
    "hist_quantiles": HIST_QUANTILES_SQL,
    "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
    "near_dup_clusters_fast": NEAR_DUP_CLUSTERS_SQL,
    "contamination": CONTAMINATION_SQL,
    "curation_pipeline": CURATION_SQL,
    "pca_scores": PCA_SCORES_SQL,
    "label_centroids": LABEL_CENTROIDS_SQL,
    "label_noise": LABEL_NOISE_SQL,
    "sft_pipeline": SFT_PIPELINE_SQL,
    "hard_negatives": HARD_NEGATIVES_SQL,
    "bow_dups": BOW_DUPS_SQL,
    "centroid_shift": CENTROID_SHIFT_SQL,
    "source_overlap": SOURCE_OVERLAP_SQL,
    "phash_dups": PHASH_DUPS_SQL,
    "kmv_distinct_users": KMV_DISTINCT_USERS_SQL,
    "dbscan_blobs": DBSCAN_BLOBS_SQL,
    "kmv_jaccard_types": KMV_JACCARD_TYPES_SQL,
    "bloom_fp_calibration": BLOOM_FP_CALIBRATION_SQL,
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "incremental_lsh_pairs": INCREMENTAL_LSH_SQL,
}
