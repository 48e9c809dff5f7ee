"""Text-analysis / quality / tokenization queries."""

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

def q_lang_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.text import language_id

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
    from chronographer_spark.operators.text import token_counts

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

def q_np_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 analog (reference np_encoding.py): capitalized-run NP chunks with
    head + width, aggregated to (chunk, head, n_words, n_docs, n_mentions)."""
    from chronographer_spark.operators.text import np_chunks

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

def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (operators/text.py scrub_pii): every document gets a
    deterministic synthetic email, IPv4, and phone string appended (the
    corpus itself is word soup — the wiring makes the regexes fire on every
    row), then the map-only native-regex scrub counts and redacts them.
    The oracle replays the identical RE2/Java-portable patterns and
    fingerprints the scrubbed text."""
    from chronographer_spark.operators.text import scrub_pii

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

def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping retrieval chunking (operators/text.py chunk_documents):
    64-token windows every 32 tokens per document, map-only explode of
    stride offsets. The oracle rebuilds the same windows and fingerprints
    the joined chunk text."""
    from chronographer_spark.operators.text import chunk_documents

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
    from chronographer_spark.operators.text import boilerplate_removal

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

def q_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality metrics (operators/text.py
    repetition_metrics): per-doc fraction of characters covered by the top
    word bigram and by duplicated word trigrams, as x1e6 integers. The
    oracle rebuilds the same grams, the same deterministic tie-break, and
    the same count x length coverage definition."""
    from chronographer_spark.operators.text import repetition_metrics

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
    from chronographer_spark.operators.sampling import hash_rate_sample
    from chronographer_spark.operators.text import repetition_metrics

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

def q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keywords (operators/text.py textrank_keywords): window-2
    co-occurrence edges over the whole documents corpus, 2 PageRank
    iterations, top-20 tokens ordered by the SCALED rank (so tie order
    is engine-stable). The oracle rebuilds the edge set and unrolls both
    rank rounds with the hardened double constants."""
    from chronographer_spark.operators.text import textrank_keywords

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

def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms over the documents corpus
    (operators/text.py tfidf_top_terms): tf shuffle + broadcast of the
    vocabulary-sized df table, deterministic (score desc, term asc) ranks,
    1e6-scaled scores."""
    from chronographer_spark.operators.text import tfidf_top_terms

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

# ---------------------------------------------------------------------------
# Q: token co-occurrence lift (association mining, exact integer quotient)
# ---------------------------------------------------------------------------


def q_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_k=20 exercises the vocabulary cap and its deterministic
    (count desc, token asc) tie-break on the 31-token corpus."""
    from chronographer_spark.operators.text import cooccurrence_lift

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
# Q: bigram typicality (model-free LM-style quality score, exact integer)
# ---------------------------------------------------------------------------


def q_bigram_typicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chronographer_spark.operators.text import bigram_typicality

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
# Q: unified curation score (uniqueness + typicality + length band, integer)
# ---------------------------------------------------------------------------


def q_curation_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single number a curation pipeline sorts by, composed from three
    already-gated signals with integer weights: token uniqueness (40%),
    corpus-max-normalized bigram typicality (40%), and a length band
    (20%). Every division is integer DIV; the corpus max crosses the plan
    as a one-row broadcast, not a driver collect."""
    from chronographer_spark.operators.text import bigram_typicality

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

def q_template_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template induction over the transcript view (operators/text.py
    template_skeletons): digit runs mask to '#', identical skeletons
    group — the machine-boilerplate detector exact dedup misses because
    the numbers differ. Per skeleton: turn count, distinct conversations,
    pinned min-text example. One combinable shuffle."""
    from chronographer_spark.operators.text import template_skeletons

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

# ---------------------------------------------------------------------------
# Q: l-diversity of event_type within (day, value-band) classes
# ---------------------------------------------------------------------------


def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive attribute = event_type (5 values): l=2,4,6 spans both
    sides — every class is below l=6 by pigeonhole, few below l=2."""
    from chronographer_spark.operators.text import l_diversity_profile

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
# Q: t-closeness of event_type within (day, value-band) classes
# ---------------------------------------------------------------------------


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same (day, vband) classes as l_diversity so the two readouts
    compose into one governance report; thresholds straddle the observed
    per-class TVD range so classes_above is non-trivial at every t."""
    from chronographer_spark.operators.text import t_closeness_profile

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
# Q: unicode script-mix audit per source
# ---------------------------------------------------------------------------


def q_script_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus is ASCII by construction, so the confusable signal is
    injected deterministically in-query: docs with doc_id%7==0 get a
    Cyrillic suffix, doc_id%11==0 a CJK one — mixed_docs then counts
    exactly those, replayed by codepoint arithmetic in both engines."""
    from chronographer_spark.operators.text import script_profile

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
# Q: event-type distribution drift, first half vs shifted second half
# ---------------------------------------------------------------------------


def q_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The train/serve skew readout over the cusum fixture: first 15 days
    vs the rest with the injected click duplication — drift concentrates
    on 'click' (positive delta) and dilutes every other share."""
    from chronographer_spark.operators.text import distribution_drift

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
# Q: Benford first-digit forensics over order totals
# ---------------------------------------------------------------------------


def q_benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit profile of o_totalprice: TPC-H prices are synthetic
    sums of uniform draws, so the profile deviates from Benford with the
    characteristic mid-digit hump — exactly what the forensic exists to
    flag."""
    from chronographer_spark.operators.text import benford_profile

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
    from chronographer_spark.operators.text import ngram_novelty_curve

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
    from chronographer_spark.operators.text import completeness_profile

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
# Q: Gini concentration of per-user mass within event types
# ---------------------------------------------------------------------------


def q_gini_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-mass inequality per event type: Poisson thinning of a uniform
    assignment gives a small but non-zero Gini per key — the skew readout
    a partitioner consults before choosing hash vs salt."""
    from chronographer_spark.operators.text import gini_concentration

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
# Q: k-anonymity risk profile over event quasi-identifiers
# ---------------------------------------------------------------------------


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quasi-identifiers = (event_type, day, value decile bucket): coarse
    enough that most classes are large, fine enough that some day/type
    combinations fall below k — both branches of the risk agg exercise."""
    from chronographer_spark.operators.text import k_anonymity_profile

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
# Q: DP geometric-mechanism count release per event type
# ---------------------------------------------------------------------------


def q_dp_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided-geometric (discrete Laplace) DP release of the per-type
    event counts at epsilon = ln 2 — the perturbation mechanism beside
    the k-anon/l-div/t-closeness risk readouts; hash-seeded so the
    oracle replays the draw (see the operator's honesty note)."""
    from chronographer_spark.operators.text import dp_geometric_release

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
# Q: encoding-anomaly (mojibake) screen with injected corruption
# ---------------------------------------------------------------------------


def q_encoding_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-integrity screen over documents with deterministic
    injected corruption (doc_id residues get a mojibake 'é'-as-Latin-1,
    a U+FFFD, or a mis-decoded smart quote appended) — the clean corpus
    underneath calibrates the zero rows."""
    from chronographer_spark.operators.text import encoding_anomaly_report

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
# Q: dictionary-encoding advisor over orders columns
# ---------------------------------------------------------------------------


def q_dict_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column dictionary-vs-plain byte arithmetic over orders:
    o_orderstatus (3 values) wins big, o_orderkey (all-distinct) reads
    negative — keep it plain; the encoding half of the layout family."""
    from chronographer_spark.operators.text import dict_encoding_advisor

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
# Q: HHI concentration of user mass per type
# ---------------------------------------------------------------------------


def q_hhi_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl concentration of per-user event mass within each type,
    with a hub injection: 'error' events on user 0 are tripled, so the
    error key reads a higher HHI / lower effective-user count than the
    untouched near-uniform keys — the mergeable (no-sort) companion to
    gini_users on the identical fixture family."""
    from chronographer_spark.operators.text import hhi_concentration

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
# Q: joint-vs-marginals TVD independence screen (type x 4h day-part)
# ---------------------------------------------------------------------------


def q_contingency_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between event type and 4-hour day-part with a planted
    dependence: click events before 08:00 are duplicated, skewing click
    mass into the first two day-parts — the TVD reads well above the
    near-independent baseline of the untouched table."""
    from chronographer_spark.operators.text import contingency_tvd

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
# Q: chi-squared / Cramer's V association between event type and weekday
# ---------------------------------------------------------------------------


def q_chi2_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared + Cramér's V² between event type and engine-neutral
    weekday, with the same planted-dependence style as the TVD screen:
    error events on dow 0-1 are duplicated, so the association reads
    well above the near-independent baseline."""
    from chronographer_spark.operators.text import contingency_chi2

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
# Q: Zipf slope of the documents token distribution
# ---------------------------------------------------------------------------


def q_zipf_slope_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """msb-quantized Zipf slope over the documents corpus."""
    from chronographer_spark.operators.text import zipf_msb_slope

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

def q_bigram_nll_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style quality filter: per-document NLL under an add-1 bigram
    LM trained on the English subset, -log2 p per bigram quantized with
    the exact-integer msb16 device (no float log; constant +320 offset
    from the 2^20 fraction scale, identical in both engines). The score a
    CCNet-shaped pipeline buckets documents by."""
    from chronographer_spark.operators.text import bigram_nll

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

def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations over the documents corpus with a planted
    phrase: every doc_id % 7 == 0 document gets ' qq zz' appended, so the
    (qq, zz) bigram — whose slot marginals contain nothing else — reads
    the maximal PMI ~ log2(n2 / c2) while organic word-soup pairs
    calibrate the noise floor near 0. min_count=5 prunes the hapax tail
    before any marginal join (the corpus is word soup: without the
    threshold the top-k would be all count-1 accidents)."""
    from chronographer_spark.operators.text import pmi_collocations

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
    from chronographer_spark.operators.text import mutual_information

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

def q_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keywords over the documents corpus with a planted collocation:
    doc_id % 11 == 0 documents gain ' the deep learning the' — the
    stopword fence isolates (deep, learning) as a clean 2-word candidate
    whose exclusive words score degree/freq = 2 each. Word-soup runs are
    capped at max_len=3 and thresholded at n_occ >= 3, so the readout is
    the recurring-phrase vocabulary, not count-1 accidents."""
    from chronographer_spark.operators.text import rake_keywords

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

def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty in ingestion (doc_id) order: the
    corpus's exact-duplicate docs read 0 (every shingle first occurred
    in the earlier twin), template re-serves read low, fresh word-soup
    reads high — the self-referential redundancy screen beside dedup."""
    from chronographer_spark.operators.text import ngram_novelty

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
    from chronographer_spark.operators.text import rouge_n_scores

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
    from chronographer_spark.operators.text import bleu_log2

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
    from chronographer_spark.operators.text import normalize_urls

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
# Q: Good-Turing count-of-counts and unseen mass over the corpus vocab
# ---------------------------------------------------------------------------


def q_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing re-estimation over the documents vocabulary: the N_r
    table with adjusted r* = (r+1)·N_{r+1}/N_r and the unseen-mass
    N_1/N riding every row — the coverage caveat beside vocab_richness
    and zipf_slope."""
    from chronographer_spark.operators.text import good_turing

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

def q_heaps_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth at 8 ingestion checkpoints
    (text.heaps_profile): V(N) and the per-segment msb16 log-log growth
    exponent — the is-more-data-still-novel diagnostic beside
    zipf_slope/good_turing."""
    from chronographer_spark.operators.text import heaps_profile

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
    from chronographer_spark.operators.text import readability_scores

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

# ---------------------------------------------------------------------------
# Q: Chao1 richness + Cronbach alpha + signed Cohen's d²
# ---------------------------------------------------------------------------


def q_chao1_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness estimate of the documents vocabulary
    (text.chao1_richness): observed distinct + N1²/2N2 — the
    unseen-types ceiling beside good_turing's unseen mass."""
    from chronographer_spark.operators.text import chao1_richness

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

# ---------------------------------------------------------------------------
# Q: weighted-Jaccard source similarity + exact L-moments
# ---------------------------------------------------------------------------


def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-Jaccard similarity between sources' term-count vectors
    (text.source_similarity): Σmin/Σmax with Σmax never materialized —
    the which-corpora-overlap matrix for mixing decisions."""
    from chronographer_spark.operators.text import source_similarity

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

def q_simpson_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson language diversity per source (text.simpson_diversity):
    exact without-replacement collision probability, diversity index and
    effective language count — no logs at all."""
    from chronographer_spark.operators.text import simpson_diversity

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

QUERIES = {
    "simpson_sources": q_simpson_sources,
    "source_similarity": q_source_similarity,
    "chao1_docs": q_chao1_docs,
    "flesch_docs": q_flesch_docs,
    "heaps_profile": q_heaps_profile,
    "good_turing": q_good_turing,
    "url_dedup": q_url_dedup,
    "rouge2_pairs": q_rouge2_pairs,
    "bleu_pairs": q_bleu_pairs,
    "ngram_novelty": q_ngram_novelty,
    "rake_keywords": q_rake_keywords,
    "mutual_information": q_mutual_information,
    "pmi_collocations": q_pmi_collocations,
    "tfidf_top_terms": q_tfidf_top_terms,
    "lang_id_multi": q_lang_id_multi,
    "subword_tokens": q_subword_tokens,
    "cooccurrence_lift": q_cooccurrence_lift,
    "template_profile": q_template_profile,
    "textrank_keywords": q_textrank,
    "bigram_typicality": q_bigram_typicality,
    "curation_score": q_curation_score,
    "scrub_pii": q_scrub_pii,
    "repetition_metrics": q_repetition_metrics,
    "chunk_documents": q_chunk_documents,
    "boilerplate_clean": q_boilerplate_removal,
    "curation_gopher": q_curation_gopher,
    "np_chunks": q_np_chunks,
    "k_anonymity": q_k_anonymity,
    "l_diversity": q_l_diversity,
    "t_closeness": q_t_closeness,
    "gini_users": q_gini_users,
    "completeness_docs": q_completeness_docs,
    "benford_orders": q_benford_orders,
    "novelty_curve": q_novelty_curve,
    "type_drift": q_type_drift,
    "script_mix": q_script_mix,
    "dp_type_counts": q_dp_type_counts,
    "encoding_anomalies": q_encoding_anomalies,
    "dict_advisor": q_dict_advisor,
    "hhi_users": q_hhi_users,
    "contingency_type_hour": q_contingency_type_hour,
    "chi2_type_dow": q_chi2_type_dow,
    "zipf_slope_docs": q_zipf_slope_docs,
    "bigram_nll_docs": q_bigram_nll_docs,
}

ORACLE_SQL = {
    "simpson_sources": SIMPSON_SOURCES_SQL,
    "source_similarity": SOURCE_SIMILARITY_SQL,
    "chao1_docs": CHAO1_SQL,
    "flesch_docs": READABILITY_SQL,
    "heaps_profile": HEAPS_PROFILE_SQL,
    "good_turing": GOOD_TURING_SQL,
    "url_dedup": URL_DEDUP_SQL,
    "rouge2_pairs": ROUGE2_PAIRS_SQL,
    "bleu_pairs": BLEU_PAIRS_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "rake_keywords": RAKE_KEYWORDS_SQL,
    "mutual_information": MUTUAL_INFORMATION_SQL,
    "pmi_collocations": PMI_COLLOCATIONS_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "lang_id_multi": LANG_ID_MULTI_SQL,
    "subword_tokens": SUBWORD_SQL,
    "cooccurrence_lift": COOCCURRENCE_SQL,
    "template_profile": TEMPLATE_PROFILE_SQL,
    "textrank_keywords": TEXTRANK_SQL,
    "bigram_typicality": BIGRAM_TYPICALITY_SQL,
    "curation_score": CURATION_SCORE_SQL,
    "scrub_pii": SCRUB_PII_SQL,
    "repetition_metrics": REPETITION_SQL,
    "chunk_documents": CHUNK_DOCS_SQL,
    "boilerplate_clean": BOILERPLATE_SQL,
    "curation_gopher": CURATION_GOPHER_SQL,
    "np_chunks": NP_CHUNKS_SQL,
    "k_anonymity": K_ANONYMITY_SQL,
    "l_diversity": L_DIVERSITY_SQL,
    "t_closeness": T_CLOSENESS_SQL,
    "gini_users": GINI_USERS_SQL,
    "completeness_docs": COMPLETENESS_DOCS_SQL,
    "benford_orders": BENFORD_ORDERS_SQL,
    "novelty_curve": NOVELTY_CURVE_SQL,
    "type_drift": TYPE_DRIFT_SQL,
    "script_mix": SCRIPT_MIX_SQL,
    "dp_type_counts": DP_TYPE_COUNTS_SQL,
    "encoding_anomalies": ENCODING_ANOMALIES_SQL,
    "dict_advisor": DICT_ADVISOR_SQL,
    "hhi_users": HHI_USERS_SQL,
    "contingency_type_hour": CONTINGENCY_TYPE_HOUR_SQL,
    "chi2_type_dow": CHI2_TYPE_DOW_SQL,
    "zipf_slope_docs": ZIPF_SLOPE_DOCS_SQL,
    "bigram_nll_docs": BIGRAM_NLL_SQL,
}
