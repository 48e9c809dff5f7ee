"""Statistical-test / classifier-eval queries."""

from __future__ import annotations
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from chronographer_spark.data.transcripts import transcripts_from_events
from chronographer_spark.extraction.mentions import extract_mentions
from chronographer_spark.graph.materialize import materialize_event_graph

from ._shared import (
    _duck_msb16,
    _hourly_series_sql,
    _t,
)

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

def q_classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-filter threshold tuning: band the affinity_classifier's doc
    scores to score_x1e6 DIV 10000 (<=100 bands, so linking/er_eval
    threshold_curve's single-partition cumulative window stays O(bands)
    at ANY corpus size) and report precision/recall per cutoff against
    the lang='en' truth. gold_total = all positive docs — unscored
    positives count against recall by contract (one eager scalar)."""
    from chronographer_spark.linking.er_eval import threshold_curve
    from chronographer_spark.operators.classifier import classify_documents

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

def q_affinity_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality/domain classifier (operators/classifier.py): train
    Laplace-smoothed token affinities on the lang='en' label over the
    documents corpus, score every document by exact-integer mean affinity
    of its model-known tokens. min_count=5 bounds the broadcast model."""
    from chronographer_spark.operators.classifier import classify_documents

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

# ---------------------------------------------------------------------------
# Q: quality-ranked token-budget planning curve
# ---------------------------------------------------------------------------


def q_budget_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Take the best-scoring documents until the token budget" as a
    planning table: per classifier-score band (descending), cumulative
    docs and whitespace tokens — the curve a data lead reads the budget
    off before launching the mixture job (budget_sample then executes
    it). Cumulative window runs over the ≤20 collapsed bands."""
    from chronographer_spark.operators.classifier import classify_documents

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
# Q: calibration table for the trained affinity classifier
# ---------------------------------------------------------------------------


def q_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the gated affinity classifier against its
    own training label (is_en): scores cluster around the base rate, so
    occupied bands sit near the diagonal — the calibration companion to
    classifier_pr_curve."""
    from chronographer_spark.operators.classifier import calibration_table, classify_documents

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
# Q: split conformal calibration on the event value column
# ---------------------------------------------------------------------------


def q_conformal_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal at alpha=0.10: calibrate qhat on even-event scores,
    audit coverage on odd-event scores — same-distribution halves, so the
    audited coverage lands at the >= 90% guarantee."""
    from chronographer_spark.operators.classifier import conformal_report

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
# Q: Cohen's kappa between two rule raters over documents
# ---------------------------------------------------------------------------


def q_kappa_raters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement between a char-length rater and a
    token-count rater labeling docs long/short — correlated rules, so
    kappa lands well above 0 (raw agreement alone would overstate it;
    kappa subtracts the chance floor)."""
    from chronographer_spark.operators.classifier import cohens_kappa

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
# Q: pass@k over event types as tasks
# ---------------------------------------------------------------------------


def q_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@1 / pass@5 per task (event type as the task id, value > 900
    as 'correct') — the sampled-generation eval metric; rare successes
    make pass@5 >> pass@1, exactly the rejection-sampling story."""
    from chronographer_spark.operators.classifier import pass_at_k

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
# Q: exact ROC AUC of order total price vs priority label
# ---------------------------------------------------------------------------


def q_auc_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the order total price (integer cents) as a
    predictor of urgent/high priority — the Mann-Whitney U identity over
    collapsed per-value counts with the KS family's two-phase prefix
    sum; ties contribute half. One row (n_pos, n_neg, u2, auc_x1e6),
    bit-exact in both engines."""
    from chronographer_spark.operators.classifier import auc_exact

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
# Q: decision-stump best splits predicting the error label
# ---------------------------------------------------------------------------


def q_decision_stump_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best single-feature splits for label = (event_type = 'error'),
    with a planted signal: every error event is appended once more with
    value/10, concentrating positive mass at low values — the
    value-cents stump should find a low threshold with a visibly lower
    Gini than the uninformative hour and user-bucket stumps."""
    from chronographer_spark.operators.classifier import decision_stump

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
    from chronographer_spark.operators.classifier import permutation_test

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
# Q: Brier decomposition of a synthetic forecaster with one bad bin
# ---------------------------------------------------------------------------


def q_brier_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition on a deterministic calibration fixture:
    forecast f in {100,300,500,700,900} by user bucket, outcome drawn
    by portable md5 bit at the TRUE rate calib(f) = f except the 900
    bin is overconfident (true rate 400) — reliability concentrates in
    that bin while resolution reads the genuine spread of the other
    four, the textbook decomposition readout."""
    from chronographer_spark.operators.classifier import brier_decomposition

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
# Q: uplift by day-part segment with a planted treated-only effect
# ---------------------------------------------------------------------------


def q_uplift_dayparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic A/B over events: treatment = portable md5 bit of the
    user (unit of randomization — all of a user's events share an arm),
    outcome drawn at base rate 300/1000 with a planted +200 uplift ONLY
    for treated rows in the night segment (dp = 0) — the report should
    read ~+200k x1e6 uplift there and ~0 elsewhere."""
    from chronographer_spark.operators.classifier import uplift_by_segment

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
    from chronographer_spark.operators.classifier import diff_in_diff

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
    from chronographer_spark.operators.classifier import cuped_adjustment

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
    from chronographer_spark.operators.classifier import uplift_by_segment

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

def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact isotonic calibration (PAVA) per event_type over a thinned
    deterministic fixture (event_id % 8 == 0; label = (event_id DIV 8 +
    score_cents) % 2): every row gets its block mean as an exact rational.
    The oracle carries the PAVA block stack as two LISTs in a recursive
    CTE; each insertion's merge cascade is replayed as a one-shot
    maximal-violating-suffix collapse (cross-multiplied means, no float),
    then rows are mapped to blocks by prefix-sum boundaries."""
    from chronographer_spark.operators.classifier import isotonic_calibrate

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
    from chronographer_spark.operators.classifier import sprt_decisions

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
    from chronographer_spark.operators.classifier import llr16

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
    from chronographer_spark.operators.classifier import bh_select
    from chronographer_spark.operators.sketches import _hash32

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
# Q: robust/forensic stats — trimmed means, Gini concentration, Benford
# ---------------------------------------------------------------------------


def q_robust_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% trimmed and winsorized means of event cents per type beside
    the raw mean — the heavy-tail-resistant location trio."""
    from chronographer_spark.operators.classifier import trimmed_stats

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
    from chronographer_spark.operators.classifier import gini_coefficient

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
    from chronographer_spark.operators.classifier import benford_profile

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
# Q: Welch's t-test per event type between user-parity groups
# ---------------------------------------------------------------------------


def q_welch_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample screen per event type: odd-user 'purchase'
    amounts carry a planted +20.00 shift; its t2_log2_x16 reads far
    above 31 (~16*log2(3.84)) while parity splits of untouched types
    calibrate the null — the one-pass parametric companion to the exact
    permutation test."""
    from chronographer_spark.operators.classifier import welch_t

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
    from chronographer_spark.operators.classifier import categorical_drift_kl

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
# Q: Bradley-Terry strengths from consecutive-event duels
# ---------------------------------------------------------------------------


def q_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arena-style BT leaderboard over event types: consecutive events
    of each user duel, the larger PLANTED-effective cents wins
    (purchase +30.00, click +15.00 — so the true dominance order is
    purchase > click > rest), exact ties skipped; strengths from 2
    pinned MM rounds, mean-normalized to 1e6."""
    from pyspark.sql import Window

    from chronographer_spark.operators.classifier import bradley_terry

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
# Q: classifier-eval family — multiclass report, naive Bayes, kNN, NDCG
# ---------------------------------------------------------------------------


def q_macro_f1_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-class P/R/F1 report (classifier.multiclass_report) for the
    stopword language-id heuristic against the documents table's true
    `lang` labels: per-class rows plus __macro__/__micro__ summaries, all
    exact integer quotients. The es/zh classes are never predicted (the
    heuristic only knows en/fr/de stopwords) — exactly the
    undefined-precision case the zero_division=0 convention pins."""
    from chronographer_spark.operators.classifier import multiclass_report
    from chronographer_spark.operators.text import language_id

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
    from chronographer_spark.operators.classifier import multinomial_nb

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
    from chronographer_spark.operators.classifier import mcnemar_test
    from chronographer_spark.operators.text import language_id

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
    from chronographer_spark.operators.classifier import mcc_binary
    from chronographer_spark.operators.text import language_id

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

def q_krippendorff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (classifier.krippendorff_alpha) across three
    deterministic raters of document language — the full stopword
    heuristic plus two single-marker raters that ABSTAIN when no marker
    hits (real missing data; units with <2 ratings drop out)."""
    from chronographer_spark.operators.classifier import krippendorff_alpha
    from chronographer_spark.operators.text import language_id

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
    from chronographer_spark.operators.classifier import wilcoxon_signed_rank

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
    from chronographer_spark.operators.classifier import kruskal_wallis

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
    from chronographer_spark.operators.classifier import anova_oneway

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
    from chronographer_spark.operators.classifier import brown_forsythe

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

# ---------------------------------------------------------------------------
# Q: Friedman repeated-measures test + MASE forecast evaluation
# ---------------------------------------------------------------------------


def q_friedman_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test (classifier.friedman_test): users as blocks, event
    types as treatments, per-(user, type) spend as the repeated measure
    — only users observed under every type count as complete blocks."""
    from chronographer_spark.operators.classifier import friedman_test

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

def q_nb_crossval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated NB accuracy
    (classifier.multinomial_nb_crossval): every fold model is the total
    count table minus that fold's counts — one corpus pass trains all
    five leave-fold-out models; out-of-fold accuracy per fold plus
    overall."""
    from chronographer_spark.operators.classifier import multinomial_nb_crossval

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

def q_prop_ztest_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z² per event type vs the rest
    (classifier.proportion_ztest_segments) on a deterministic cents-mod
    success flag — 128-bit cross-multiplied, no sqrt, no float."""
    from chronographer_spark.operators.classifier import proportion_ztest_segments

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
    from chronographer_spark.operators.classifier import grubbs_screen

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

def q_cronbach_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha across event types as 'items' with users as
    subjects (classifier.cronbach_alpha): do per-type spends co-vary as
    one construct; complete-case users only."""
    from chronographer_spark.operators.classifier import cronbach_alpha

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
    from chronographer_spark.operators.classifier import cohens_d_signed

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
    from chronographer_spark.operators.classifier import cochran_q

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
    from chronographer_spark.operators.classifier import jonckheere_trend

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

# ---------------------------------------------------------------------------
# Q: Mood's median test + Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


def q_moods_median_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mood's median test across event types on value cents
    (classifier.moods_median): 2×k above-pooled-median chi-square with
    128-bit cells — the assumption-free location screen."""
    from chronographer_spark.operators.classifier import moods_median

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
    from chronographer_spark.operators.classifier import runs_test
    from chronographer_spark.operators.temporal import ses_forecast

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

def q_l_moments_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact L-moments per event type on value cents
    (classifier.l_moments): L1/L2/τ3 from collapsed-run closed forms —
    the robust distribution-shape card."""
    from chronographer_spark.operators.classifier import l_moments

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
    from chronographer_spark.operators.classifier import by_select
    from chronographer_spark.operators.sketches import _hash32

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
    from chronographer_spark.operators.classifier import g_test

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
    from chronographer_spark.operators.classifier import cvm_two_sample

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

def q_kuiper_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kuiper V per event type, odd vs even users' cents
    (classifier.kuiper_two_sample): D⁺ + D⁻, the tail-sensitive sibling
    of the KS gap."""
    from chronographer_spark.operators.classifier import kuiper_two_sample

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
    from chronographer_spark.operators.classifier import vargha_delaney_a

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
    from chronographer_spark.operators.classifier import kendall_taub

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
# Q: 2×2 effect measures (odds ratio / risk ratio / risk difference)
# ---------------------------------------------------------------------------


def q_effect_measures_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR / RR / RD per event type between odd and even users on the
    cents-mod success flag (classifier.effect_measures_2x2) — how BIG
    beside prop_ztest's is-it-real."""
    from chronographer_spark.operators.classifier import effect_measures_2x2

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
    from chronographer_spark.operators.classifier import classify_documents, youden_cutpoint

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
    "vargha_delaney_types": q_vargha_delaney_types,
    "kendall_taub_types": q_kendall_taub_types,
    "kuiper_types": q_kuiper_types,
    "cvm_types": q_cvm_types,
    "by_fdr": q_by_fdr,
    "g_test_types": q_g_test_types,
    "l_moments_types": q_l_moments_types,
    "moods_median_types": q_moods_median_types,
    "runs_test_ses": q_runs_test_ses,
    "cochran_q_types": q_cochran_types,
    "jonckheere_types": q_jonckheere_types,
    "cronbach_types": q_cronbach_types,
    "cohens_d_types": q_cohens_d_types,
    "prop_ztest_types": q_prop_ztest_types,
    "grubbs_types": q_grubbs_types,
    "nb_crossval": q_nb_crossval,
    "friedman_events": q_friedman_events,
    "anova_events": q_anova_events,
    "brown_forsythe_events": q_brown_forsythe_events,
    "wilcoxon_paired": q_wilcoxon_paired,
    "kruskal_events": q_kruskal_events,
    "krippendorff_docs": q_krippendorff_docs,
    "mcnemar_langid": q_mcnemar_langid,
    "mcc_langid": q_mcc_langid,
    "macro_f1_langid": q_macro_f1_langid,
    "naive_bayes_lang": q_naive_bayes_lang,
    "bradley_terry": q_bradley_terry,
    "kl_drift": q_kl_drift,
    "welch_t": q_welch_t,
    "robust_means": q_robust_means,
    "gini_user_activity": q_gini_user_activity,
    "benford_screen": q_benford_screen,
    "bh_fdr": q_bh_fdr,
    "sprt_decisions": q_sprt_decisions,
    "entropy_rank_top1": q_entropy_rank_top1,
    "affinity_classifier": q_affinity_classifier,
    "classifier_pr_curve": q_classifier_pr_curve,
    "classifier_calibration": q_classifier_calibration,
    "budget_curve": q_budget_curve,
    "conformal_value": q_conformal_value,
    "kappa_raters": q_kappa_raters,
    "pass_at_k": q_pass_at_k,
    "perm_test_value": q_perm_test_value,
    "brier_forecast": q_brier_forecast,
    "uplift_dayparts": q_uplift_dayparts,
    "did_value": q_did_value,
    "cuped_value": q_cuped_value,
    "simpsons_trap": q_simpsons_trap,
    "decision_stump_error": q_decision_stump_error,
    "auc_priority": q_auc_priority,
    "isotonic_calibration": q_isotonic_calibration,
}

ORACLE_SQL = {
    "youden_cutpoint": YOUDEN_CUTPOINT_SQL,
    "effect_measures_types": EFFECT_MEASURES_SQL,
    "vargha_delaney_types": VARGHA_DELANEY_SQL,
    "kendall_taub_types": KENDALL_TAUB_SQL,
    "kuiper_types": KUIPER_TYPES_SQL,
    "cvm_types": CVM_TYPES_SQL,
    "by_fdr": BY_FDR_SQL,
    "g_test_types": G_TEST_SQL,
    "l_moments_types": L_MOMENTS_SQL,
    "moods_median_types": MOODS_MEDIAN_SQL,
    "runs_test_ses": RUNS_TEST_SQL,
    "cochran_q_types": COCHRAN_Q_SQL,
    "jonckheere_types": JONCKHEERE_SQL,
    "cronbach_types": CRONBACH_SQL,
    "cohens_d_types": COHENS_D_SQL,
    "prop_ztest_types": PROP_ZTEST_SQL,
    "grubbs_types": GRUBBS_TYPES_SQL,
    "nb_crossval": NB_CROSSVAL_SQL,
    "friedman_events": FRIEDMAN_EVENTS_SQL,
    "anova_events": ANOVA_EVENTS_SQL,
    "brown_forsythe_events": BROWN_FORSYTHE_SQL,
    "wilcoxon_paired": WILCOXON_PAIRED_SQL,
    "kruskal_events": KRUSKAL_EVENTS_SQL,
    "krippendorff_docs": KRIPPENDORFF_SQL,
    "mcnemar_langid": MCNEMAR_LANGID_SQL,
    "mcc_langid": MCC_LANGID_SQL,
    "macro_f1_langid": MACRO_F1_LANGID_SQL,
    "naive_bayes_lang": NB_LANG_SQL,
    "bradley_terry": BRADLEY_TERRY_SQL,
    "kl_drift": KL_DRIFT_SQL,
    "welch_t": WELCH_T_SQL,
    "robust_means": ROBUST_MEANS_SQL,
    "gini_user_activity": GINI_USER_ACTIVITY_SQL,
    "benford_screen": BENFORD_SCREEN_SQL,
    "bh_fdr": BH_FDR_SQL,
    "sprt_decisions": SPRT_DECISIONS_SQL,
    "entropy_rank_top1": ENTROPY_SQL,
    "affinity_classifier": AFFINITY_CLASSIFIER_SQL,
    "classifier_pr_curve": CLASSIFIER_PR_CURVE_SQL,
    "classifier_calibration": CLASSIFIER_CALIBRATION_SQL,
    "budget_curve": BUDGET_CURVE_SQL,
    "conformal_value": CONFORMAL_VALUE_SQL,
    "kappa_raters": KAPPA_RATERS_SQL,
    "pass_at_k": PASS_AT_K_SQL,
    "perm_test_value": PERM_TEST_VALUE_SQL,
    "brier_forecast": BRIER_FORECAST_SQL,
    "uplift_dayparts": UPLIFT_DAYPARTS_SQL,
    "did_value": DID_VALUE_SQL,
    "cuped_value": CUPED_VALUE_SQL,
    "simpsons_trap": SIMPSONS_TRAP_SQL,
    "decision_stump_error": DECISION_STUMP_ERROR_SQL,
    "auc_priority": AUC_PRIORITY_SQL,
    "isotonic_calibration": ISOTONIC_SQL,
}
