"""Text-analysis operators for training-data pipelines.

All pure native expressions (whole-stage codegen end-to-end):
- language id (stopword-hit-ratio heuristic over small per-language sets)
- quality scoring (length / distinct-token ratio / stopword density /
  punctuation ratio)
- token counting (whitespace + a BPE-ish subword regex estimate)
- document fingerprinting (md5 content hash + positional rolling fingerprint)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import normalize_text

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "dans", "est"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
}


def _stop_ratio(words_expr: str, stops: list[str]):
    in_list = ", ".join(f"'{s}'" for s in stops)
    return F.size(
        F.expr(f"filter({words_expr}, w -> w IN ({in_list}))")
    ).cast("double") / F.greatest(F.size(F.expr(words_expr)), F.lit(1))


def language_id(
    df: DataFrame, text_col: str = "text", langs: list[str] | None = None
) -> DataFrame:
    """Pick the language whose stopword set hits the most tokens.

    Deterministic tie-break: higher ratio, then lexicographic language code.
    """
    langs = langs or list(STOPWORDS)
    out = df.withColumn("__words", F.split(normalize_text(F.col(text_col)), " "))
    scores = [
        F.struct(
            _stop_ratio("__words", STOPWORDS[lang]).alias("ratio"),
            # invert code ordering inside max: lexicographically smaller code
            # must win ties -> embed a descending sort key
            F.lit(lang).alias("lang"),
        )
        for lang in sorted(langs, reverse=True)
    ]
    best = F.greatest(*scores) if len(scores) > 1 else scores[0]
    return out.withColumn("lang_pred", best["lang"]).withColumn(
        "lang_score", best["ratio"]
    ).drop("__words")


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach quality features + a composite [0,1] score."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    n_tokens = F.size(words)
    distinct_ratio = F.size(F.array_distinct(words)).cast("double") / F.greatest(
        n_tokens, F.lit(1)
    )
    n_chars = F.length(F.col(text_col))
    punct_ratio = (
        n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = _stop_ratio(
        f"split(regexp_replace(lower(trim({text_col})), '\\\\s+', ' '), ' ')",
        STOPWORDS["en"],
    )
    mean_word_len = (
        F.length(F.regexp_replace(normalize_text(F.col(text_col)), " ", ""))
        .cast("double") / F.greatest(n_tokens, F.lit(1))
    )
    length_ok = F.when((n_tokens >= 5) & (n_tokens <= 100000), 1.0).otherwise(0.3)
    composite = (
        0.4 * F.least(distinct_ratio * 2, F.lit(1.0))
        + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
        + 0.2 * (1 - F.least(punct_ratio * 4, F.lit(1.0)))
        + 0.2 * length_ok
    )
    return (
        df.withColumn("n_tokens", n_tokens)
        .withColumn("distinct_ratio", distinct_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("quality", composite)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate counts regex pieces (word chunks of <=4 chars,
    digits, punctuation) — a deterministic stand-in for a real tokenizer
    with the same plumbing shape (pure native regexp count).
    """
    ws = F.size(F.split(normalize_text(F.col(text_col)), " "))
    bpe_ish = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"([A-Za-z]{1,4}|\d|[^\sA-Za-z\d])"), 1
        )
    )
    return df.withColumn("n_ws_tokens", ws).withColumn("n_subword_est", bpe_ish)


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 of the normalized text + a rolling 8-gram
    min-fingerprint (robust to local edits — winnowing-style)."""
    normed = normalize_text(F.col(text_col))
    toks = F.split(normed, " ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - 8, F.lit(0)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, 8))))
    return df.withColumn("fp_md5", F.md5(normed)).withColumn(
        "fp_winnow", F.array_min(grams)
    )


def np_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_re: str | None = None,
) -> DataFrame:
    """Noun-phrase-like chunk extraction: maximal runs of capitalized words.

    Native-expression analog of the reference's NP structure encoding
    (reference src/build_ng/np_encoding.py:56-104 — spaCy noun_chunks with
    head/root extraction): each chunk row carries the surface form, its head
    (the run's last word, the usual NP head position in English), and the
    word count. One regexp pass + explode; no Python in the plan, so it
    whole-stage-codegens and the DuckDB oracle replays it exactly.
    """
    # default: capitalized runs (real prose). Lowercase corpora pass a
    # pattern fit to their shape, e.g. runs of content words by length —
    # keep patterns RE2-compatible (no lookaround) for oracle parity.
    chunk_re = chunk_re or r"[A-Z][a-z]+(?: [A-Z][a-z]+)*"
    chunks = F.regexp_extract_all(F.col(text_col), F.lit(f"({chunk_re})"), 1)
    out = df.select(F.col(id_col), F.explode(chunks).alias("chunk"))
    return out.select(
        id_col,
        "chunk",
        F.substring_index("chunk", " ", -1).alias("head"),
        F.size(F.split("chunk", " ")).cast("int").alias("n_words"),
    )


def tfidf_top_terms(
    df: DataFrame,
    top_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-N TF-IDF terms — the retrieval/keyword-extraction
    primitive of a curation pipeline (dedup keys, topic tags, BM25-ish
    relevance all start from these statistics).

    score(term, doc) = tf · (ln((N+1)/(df+1)) + 1)  (smoothed idf, so
    corpus-universal terms still score > 0). Tokenization is lowercase
    alpha runs. The tf table feeds BOTH the document-frequency aggregate
    and the scoring join; without a materialization barrier Catalyst
    re-executes the tokenize+groupBy subtree once per branch (the same
    shared-subtree re-execution measured 3.7x on minhash bands), so tf is
    localCheckpoint'ed eagerly — this operator runs jobs at call time (it
    also counts N), like the IVF probe path. After the barrier: one
    vocabulary-sized df aggregate broadcast back onto tf, one ranking
    window shuffle. Deterministic tie-break (score desc, term asc); scores
    emitted as 1e6-scaled BIGINTs for cross-engine value hashing.
    """
    n_docs = df.select(id_col).distinct().count()
    toks = (
        df.select(
            id_col,
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = (
        toks.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "score",
        F.col("tf")
        * (F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0)) + 1.0),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(
            id_col,
            "term",
            F.col("rn").alias("rank"),
            F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long").alias("score_x1e6"),
        )
    )


# Portable PII patterns: no lookarounds, no backrefs — identical semantics
# under Java regex (Spark) and RE2 (DuckDB), so the scrub is oracle-
# replayable byte-for-byte. Order matters: emails before phones (an email's
# digits must not be half-eaten by the phone pattern).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\- ]{7,}\d", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and phone-shaped digit runs.

    Adds per-category match counts (n_email, n_ip, n_phone) and replaces
    the matches in a new ``scrubbed`` column with typed placeholder tokens.
    Map-only: three regexp_count + three chained regexp_replace native
    expressions, one codegen stage, zero shuffles — the pass a 100 TB
    pretraining corpus can afford to run inline with ingest. The reference
    has no PII stage (its inputs are public KBs); this belongs to the
    training-data family in COVERAGE.md.
    """
    out = df
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)


def repetition_metrics(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality metrics (MassiveText, arXiv
    2112.11446 Table A1, simplified): per document, the fraction of
    characters covered by the single most frequent word bigram and the
    fraction covered by word trigrams that occur more than once — the
    signals behind "drop boilerplate / loop-generated text" curation rules.

    Coverage is count x gram length WITHOUT overlap correction — a
    deterministic definition both engines replay exactly; thresholds should
    be calibrated against it. Top-bigram ties break by the lexicographically
    largest gram. Fractions are emitted as x1e6 integers.

    Scale shape: tokenization runs ONCE (eager localCheckpoint — the
    shared-subtree rule from the tf/df and minhash families), then two
    explode -> groupBy(doc, gram) passes whose shuffles are keyed by
    (doc_id, gram): no global hotspots, partial aggregation does the heavy
    lifting map-side. Docs too short for a gram keep fraction 0.
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        toks.alias("w"),
    ).localCheckpoint(eager=True)

    def _grams(n: int):
        return F.when(
            F.size("w") >= n,
            F.transform(
                F.sequence(F.lit(n), F.size("w")),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("w", i - (n - 1 - j)) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

    bic = (
        base.select("doc_id", F.explode(_grams(2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bitop = bic.groupBy("doc_id").agg(F.max(F.struct("c", "g")).alias("m")).select(
        "doc_id", (F.col("m.c") * F.length("m.g")).alias("top_chars")
    )
    tridup = (
        base.select("doc_id", F.explode(_grams(3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("c") > 1, F.col("c") * F.length("g")).otherwise(0)
            ).alias("dup_chars")
        )
    )

    def _frac(col):
        return F.floor(
            F.lit(1000000.0) * F.coalesce(col, F.lit(0)) / F.col("n_chars")
            + F.lit(0.5)
        ).cast("long")

    return (
        base.select("doc_id", "n_chars")
        .join(bitop, "doc_id", "left")
        .join(tridup, "doc_id", "left")
        .select(
            "doc_id",
            _frac(F.col("top_chars")).alias("top_bigram_frac_x1e6"),
            _frac(F.col("dup_chars")).alias("dup_trigram_frac_x1e6"),
        )
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Overlapping retrieval-style chunking: windows of ``chunk_tokens``
    whitespace tokens starting every ``stride`` tokens (start positions are
    the multiples of stride below the token count, so trailing windows may
    be short — a deterministic rule both engines replay). Map-only: one
    explode of per-row start offsets, array slices, no shuffle; the pass
    that fans a 100 TB corpus out to its embedding/indexing units.

    Emits (id, chunk_idx, start_tok, n_tok, chunk_text).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col).alias("id"), toks.alias("w")).filter(
        F.size("w") > 0
    )
    starts = base.select(
        "id",
        "w",
        F.explode(
            F.sequence(F.lit(0), F.size("w") - 1, F.lit(stride))
        ).alias("s"),
    )
    chunk = F.slice("w", F.col("s") + 1, chunk_tokens)
    return starts.select(
        "id",
        (F.col("s") / stride).cast("long").alias("chunk_idx"),
        F.col("s").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def cooccurrence_lift(
    docs: DataFrame,
    top_k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document-level token co-occurrence with exact integer lift — the
    association statistic (lift = P(a,b) / (P(a)P(b))) an entity-linking
    prior or query-expansion table is built from. The reference carries no
    corpus-association stage; this serves the KG side: pairs with high
    lift over the mention corpus are candidate related-entity edges.

    Vocabulary is capped at the `top_k` most frequent tokens (ties broken
    by token asc) so the per-document pair fan-out is bounded by k^2
    regardless of corpus size — the knob that keeps the self-join linear
    at 100 TB. The capped vocab (k rows) is broadcast; the only large
    shuffle is the (doc, token) distinct + the pair count, both map-side
    combinable.

    lift is emitted as an exact integer: lift_x1e6 = (c_ab * N * 10^6)
    // (c_a * c_b) — integer multiply/divide only, no float summation
    order to reconcile cross-engine (CLAUDE.md float discipline).

    Returns (tok_a, tok_b, n_ab, n_a, n_b, lift_x1e6) with tok_a < tok_b.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    # doc_tok feeds the df count AND the capped posting list; kept feeds
    # both sides of the pair self-join (tf/df re-execution family)
    doc_tok = toks.dropDuplicates(["doc_id", "tok"]).localCheckpoint(eager=True)
    df_counts = doc_tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n_doc"))
    vocab = df_counts.orderBy(F.col("n_doc").desc(), F.col("tok").asc()).limit(top_k)
    n_docs = docs.select(id_col).distinct().count()  # one scalar, exact integer

    kept = doc_tok.join(F.broadcast(vocab.select("tok")), "tok").localCheckpoint(
        eager=True
    )
    left = kept.select("doc_id", F.col("tok").alias("tok_a"))
    right = kept.select("doc_id", F.col("tok").alias("tok_b"))
    pairs = (
        left.join(right, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    df_a = vocab.select(F.col("tok").alias("tok_a"), F.col("n_doc").alias("n_a"))
    df_b = vocab.select(F.col("tok").alias("tok_b"), F.col("n_doc").alias("n_b"))
    # integer DIV keeps the quotient exact (no float summation/rounding to
    # reconcile cross-engine). Overflow bound: n_ab * N * 1e6 must fit in
    # int64 — safe through ~10^6-document vocab-capped corpora per partition
    # of the corpus; beyond that, compute lift per corpus shard or widen to
    # DECIMAL(38,0) on both engines.
    return (
        pairs.join(F.broadcast(df_a), "tok_a")
        .join(F.broadcast(df_b), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(
                f"CAST((n_ab * CAST({int(n_docs)} AS BIGINT) * 1000000)"
                " DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_x1e6"),
        )
    )


def bigram_typicality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Statistical language-model quality signal without a model: score
    each document by the mean corpus frequency of its token bigrams —
    low-typicality documents are gibberish/boilerplate-shuffled outliers,
    the cheap first gate before an actual LM perplexity pass. The score is
    an exact integer (sum_of_counts * 10^6 DIV n_bigrams), so the oracle
    replays it with no float discipline.

    Plan shape: bigrams are built map-only with zip_with over the token
    array (whole-stage codegen, no explode-join for construction); the
    corpus count is one map-side-combinable groupBy; the per-doc score is
    one join keyed by bigram (vocabulary-bounded; hot bigrams are exactly
    AQE's skew-join case) plus one doc-keyed aggregation. The bigram table
    feeds both the counting and the scoring side — eager localCheckpoint
    executes the tokenize+zip subtree once.

    Returns (doc_id, n_bigrams, typ_x1e6); single-token docs score 0.
    """
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    bigrams = (
        docs.withColumn("__t", toks)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.expr(
                    "zip_with(slice(__t, 1, greatest(size(__t) - 1, 0)),"
                    " slice(__t, 2, greatest(size(__t) - 1, 0)),"
                    " (a, b) -> concat(a, ' ', b))"
                )
            ).alias("bg"),
        )
        .localCheckpoint(eager=True)
    )
    counts = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("bg_count"))
    return (
        bigrams.join(counts, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.expr("CAST(sum(bg_count) * 1000000 DIV count(*) AS BIGINT)").alias(
                "typ_x1e6"
            ),
        )
        .unionByName(
            docs.select(F.col(id_col).alias("doc_id"))
            .join(bigrams.select("doc_id").distinct(), "doc_id", "left_anti")
            .select(
                "doc_id",
                F.lit(0).cast("long").alias("n_bigrams"),
                F.lit(0).cast("long").alias("typ_x1e6"),
            )
        )
    )


def boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_tokens: int = 8,
    max_doc_frac: float = 0.01,
    min_docs: int = 2,
) -> DataFrame:
    """CCNet/C4-style corpus-level boilerplate removal (Wenzek et al. 2020
    §2: drop lines whose normalized form repeats across many documents —
    nav bars, cookie banners, license footers). The corpus here has no
    newlines, so a "line" is each consecutive non-overlapping block of
    ``line_tokens`` lowercase whitespace tokens — the same deterministic
    segmentation rule both engines replay (trailing blocks may be short).

    A line is boilerplate when it appears in at least
    ``max(min_docs, ceil(max_doc_frac * n_docs))`` DISTINCT documents.
    Kept lines are re-joined in original order.

    Scale shape: one map-side explode to (doc, line_idx, line); the
    doc-frequency pass is a (line → distinct doc) agg with map-side
    partials; the boilerplate set is by construction tiny (heavy hitters
    only), so the flagging join back to the line table is AQE-broadcast;
    reassembly is one groupBy(doc) of sorted (idx, line) structs. Two
    shuffles total at any corpus size. ``n_docs`` is one exact scalar
    (same convention as tfidf_top_terms); a production variant could
    swap the exact df pass for a CMS heavy-hitter pass (sketches.py) to
    skip the line-table shuffle entirely.

    Emits (id, n_lines, n_dropped, clean_text).
    """
    import math

    n_docs = df.select(id_col).distinct().count()  # one scalar, exact integer
    threshold = max(min_docs, math.ceil(max_doc_frac * n_docs))

    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col).alias("id"), toks.alias("w")).filter(
        F.size("w") > 0
    )
    lines = base.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("w") - 1, F.lit(line_tokens)),
                lambda s: F.concat_ws(" ", F.slice("w", s + 1, line_tokens)),
            )
        ).alias("line_idx", "line"),
    )
    boiler = (
        lines.groupBy("line")
        .agg(F.countDistinct("id").alias("doc_df"))
        .filter(F.col("doc_df") >= threshold)
        .select("line")
        .withColumn("_drop", F.lit(True))
    )
    flagged = lines.join(boiler, "line", "left")
    return (
        flagged.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("_drop"), 1).otherwise(0)).alias("n_dropped"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_drop").isNull(),
                                F.struct(
                                    F.col("line_idx").alias("i"),
                                    F.col("line").alias("l"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["l"],
                ),
            ).alias("clean_text"),
        )
        .select(
            "id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_dropped").cast("long").alias("n_dropped"),
            "clean_text",
        )
    )


def textrank_keywords(
    df: DataFrame,
    text_col: str = "text",
    iterations: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004): adjacent-
    token co-occurrence edges (window 2, the paper's default) over the
    whole corpus, symmetrized and deduplicated, ranked by the same
    fixed-iteration PageRank the graph gates pin — keywords are the
    tokens random walks keep landing on, a model-free complement to
    tf-idf (which scores per-doc; TextRank scores corpus-global
    centrality). Top-k by (rank, token) with ranks scaled to exact-
    comparable integers.

    Scale shape: the vocabulary graph is tiny next to the corpus — the
    explode dominates, the distinct edge set then rides the pagerank
    loop's dimension-table economics. Returns (token, rank_x1e6, rnk).
    """
    from pyspark.sql.window import Window

    from .dedup import normalize_text
    from .graph_algos import pagerank

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    base = df.select(toks.alias("w")).filter(F.size("w") >= 2)
    pairs = base.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - 1),
                lambda i: F.struct(
                    F.element_at("w", i).alias("src"),
                    F.element_at("w", i + 1).alias("dst"),
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst").filter(F.col("src") != F.col("dst"))
    edges = (
        pairs.unionByName(
            pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    ranks = pagerank(edges, iterations=iterations)
    scaled = ranks.select(
        F.col("node").alias("token"),
        F.floor(F.col("rank") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("rank_x1e6"),
    )
    w = Window.orderBy(F.desc("rank_x1e6"), F.asc("token"))
    return (
        scaled.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= top_k)
    )


def template_skeletons(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    min_count: int = 2,
) -> DataFrame:
    """Template induction: mask every digit run to '#', group identical
    skeletons, report the frequent ones — the detector for machine-
    generated boilerplate ("Order 1234 shipped on 2024-01-02") that exact
    dedup misses because the numbers differ. A curation pipeline drops or
    downweights high-frequency templates; on agent transcripts the same
    profile surfaces templated tool outputs worth collapsing before KG
    extraction (the reference normalizes per-turn text before extraction,
    src/corpus_processing.py — this is the corpus-level view of that).

    ONE combinable groupBy shuffle on the skeleton string; the mask is a
    map-side regexp. `id_col` (e.g. conv_id) additionally reports how many
    distinct containers share the template. Example is min(text) — pinned.

    Returns (skeleton, n_rows[, n_groups], example) for skeletons with
    n_rows >= min_count.
    """
    skel = F.regexp_replace(F.col(text_col), "[0-9]+", "#").alias("skeleton")
    base = df.select(
        skel, F.col(text_col).alias("__t"),
        *([F.col(id_col).alias("__g")] if id_col else []),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        *([F.countDistinct("__g").alias("n_groups")] if id_col else []),
        F.min("__t").alias("example"),
    ]
    return base.groupBy("skeleton").agg(*aggs).filter(
        F.col("n_rows") >= min_count
    )


def k_anonymity_profile(
    df: DataFrame, quasi_cols: list, k_thresholds: list = (2, 5, 10)
) -> DataFrame:
    """k-anonymity risk profile (Sweeney 2002): group rows into
    equivalence classes over the quasi-identifier columns and report, per
    candidate k, how exposed the dataset is — the privacy-governance
    readout a transcript corpus needs BEFORE release (scrub_pii removes
    surface PII; this measures re-identification risk from the columns
    that remain).

    Returns one row per k in ``k_thresholds``: k, n_classes (total
    equivalence classes), classes_below (classes smaller than k),
    rows_at_risk (rows in those classes), risk_x1e6 = rows_at_risk · 10^6
    DIV total rows (exact integer; 0 means the table IS k-anonymous).

    Scale shape: ONE groupBy over the quasi columns (map-side combined,
    hot classes are ordinary agg skew), then the threshold fan-out runs
    on the class-size table — already collapsed to one row per class —
    via explode, never re-scanning the input; the final agg is
    |k_thresholds| rows.
    """
    classes = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("sz")
    )
    ks = F.array(*[F.lit(int(k)) for k in k_thresholds])
    fan = classes.select(
        "sz", F.explode(ks).alias("k")
    )
    per_k = fan.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("sz") < F.col("k"), 1).otherwise(0))
        .cast("long")
        .alias("classes_below"),
        F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum("sz").alias("_total"),
    )
    return per_k.select(
        "k",
        "n_classes",
        "classes_below",
        "rows_at_risk",
        F.expr("CAST(rows_at_risk * 1000000 DIV _total AS BIGINT)").alias(
            "risk_x1e6"
        ),
    )


def l_diversity_profile(
    df: DataFrame, quasi_cols: list, sensitive_col: str,
    l_thresholds: list = (2, 3, 5),
) -> DataFrame:
    """l-diversity profile (Machanavajjhala 2006): k-anonymity's blind
    spot is a large equivalence class whose SENSITIVE attribute is
    uniform — re-identification isn't needed to learn the secret. Per
    candidate l, report classes whose distinct-sensitive-value count is
    below l and the rows exposed in them.

    Returns one row per l: l, n_classes, classes_below, rows_at_risk,
    risk_x1e6 (exact integer quotient of exposed rows).

    Scale shape: groupBy(quasi, sensitive) collapses duplicates first
    (map-side combinable), then a per-class agg counts distinct values
    WITHOUT countDistinct's expand — two combinable shuffles; the
    threshold fan explodes the collapsed class table like
    k_anonymity_profile, never re-scanning input.
    """
    per_value = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count(F.lit(1)).alias("n"))
    classes = per_value.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("n").alias("sz"),
    )
    ls = F.array(*[F.lit(int(x)) for x in l_thresholds])
    fan = classes.select("n_distinct", "sz", F.explode(ls).alias("l"))
    per_l = fan.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("n_distinct") < F.col("l"), 1).otherwise(0))
        .cast("long")
        .alias("classes_below"),
        F.sum(F.when(F.col("n_distinct") < F.col("l"), F.col("sz")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.sum("sz").alias("_total"),
    )
    return per_l.select(
        "l",
        "n_classes",
        "classes_below",
        "rows_at_risk",
        F.expr("CAST(rows_at_risk * 1000000 DIV _total AS BIGINT)").alias(
            "risk_x1e6"
        ),
    )


def t_closeness_profile(
    df: DataFrame, quasi_cols: list, sensitive_col: str,
    t_thresholds_x1e6: list = (100000, 200000, 350000),
) -> DataFrame:
    """t-closeness profile (Li 2007) — the third privacy readout beside
    k_anonymity_profile and l_diversity_profile: l-diversity's blind spot
    is a class whose sensitive values are distinct but SKEWED relative to
    the corpus (99% 'flu' in a class vs 1% globally leaks plenty).
    Per class, the distance between the class's sensitive-value
    distribution and the global one is the Earth Mover's Distance, which
    for categorical values under uniform ground distance is the total
    variation distance ½·Σ|p_i − q_i| — computed here as an EXACT integer:
    emd_num = Σ_{i∈class} |n_ci·total − gn_i·sz| + sz·(total − Σ_{i∈class} gn_i)
    (the second term folds in every value ABSENT from the class without
    fanning classes × vocabulary), and
    t_class_x1e6 = emd_num·10^6 DIV (2·sz·total).

    Returns one row per threshold t in ``t_thresholds_x1e6``: t_x1e6,
    n_classes, classes_above (classes whose distance exceeds t),
    rows_at_risk (rows in those classes), risk_x1e6 (exact quotient).

    Scale shape: groupBy(quasi, sensitive) collapses the input once
    (map-side combined) and is eagerly checkpointed — it feeds the global
    value marginal (vocabulary-sized, BROADCAST back), the class-size
    rollup, and the distance agg, so the input is scanned exactly once;
    the threshold fan explodes the collapsed per-class table. Exactness
    bound: n_ci·total must fit a BIGINT, i.e. total ≲ 3·10^9 rows — the
    governance readout runs on a release candidate or a sample, not the
    raw crawl; beyond that, profile a hash-sample per class.
    """
    qc = [F.col(c) for c in quasi_cols]
    per_value = (
        df.groupBy(*qc, F.col(sensitive_col).alias("__v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    global_v = per_value.groupBy("__v").agg(F.sum("n").alias("gn"))
    total_t = global_v.agg(F.sum("gn").alias("total"))
    # class size via a window over the already-collapsed per-value table:
    # partitioned by the quasi columns, no second shuffle of the input
    w = Window.partitionBy(*quasi_cols)
    joined = (
        per_value.join(F.broadcast(global_v), "__v")
        .crossJoin(F.broadcast(total_t))
        .withColumn("sz", F.sum("n").over(w))
    )
    classes = joined.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.sum(F.abs(F.col("n") * F.col("total") - F.col("gn") * F.col("sz")))
        .alias("present"),
        F.sum("gn").alias("covered"),
        F.max("sz").alias("sz"),
        F.max("total").alias("total"),
    )
    dist = classes.select(
        "sz", "total",
        F.expr(
            "CAST((present + sz * (total - covered)) * 1000000"
            " DIV (2 * sz * total) AS BIGINT)"
        ).alias("t_class_x1e6"),
    )
    ts = F.array(*[F.lit(int(t)) for t in t_thresholds_x1e6])
    fan = dist.select("sz", "total", "t_class_x1e6", F.explode(ts).alias("t_x1e6"))
    per_t = fan.groupBy("t_x1e6").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(F.when(F.col("t_class_x1e6") > F.col("t_x1e6"), 1).otherwise(0))
        .cast("long")
        .alias("classes_above"),
        F.sum(
            F.when(F.col("t_class_x1e6") > F.col("t_x1e6"), F.col("sz")).otherwise(0)
        )
        .cast("long")
        .alias("rows_at_risk"),
        F.max("total").alias("_total"),
    )
    return per_t.select(
        "t_x1e6",
        "n_classes",
        "classes_above",
        "rows_at_risk",
        F.expr("CAST(rows_at_risk * 1000000 DIV _total AS BIGINT)").alias(
            "risk_x1e6"
        ),
    )


def gini_concentration(
    df: DataFrame,
    key: str = "event_type",
    unit_col: str = "user_id",
) -> DataFrame:
    """Gini coefficient of per-unit mass within each key — the
    concentration/skew readout a pipeline operator consults before
    choosing a partitioning strategy (a key whose mass Gini approaches 1
    is hub-dominated: salt it; near 0 is uniform: hash it) and the
    standard inequality profile for corpus governance (author/source
    concentration).

    Exact integers via the sorted-rank identity
    G = (2·Σ r·x_(r) − (B+1)·Σx) / (B·Σx), ranks assigned by the PINNED
    order (count, unit) so ties replay identically cross-engine (any total
    order among equal counts yields the same Σ r·x, the pin is for the
    hash gate). gini_x1e6 is the (B·Σx)-denominator integer quotient.
    Bound (documented, n-independent per modularity's precedent): needs
    B·T < 2^63/2e6 per key — units-per-key up to ~1e6 with totals up to
    ~4e9, or any mix with B·T ≲ 4.6e12·1e6; beyond that, pre-aggregate
    units into quantile bands.

    Plan shape: one (key, unit) combinable count collapses the input; the
    rank window and BOTH rollup aggs run on the collapsed table sharing
    its (key) exchange. No driver collect.

    Returns (key, n_units, total, gini_x1e6); single-unit keys read 0.
    """
    counts = df.groupBy(key, unit_col).agg(F.count(F.lit(1)).alias("__x"))
    w = Window.partitionBy(key).orderBy(F.col("__x").asc(), F.col(unit_col).asc())
    ranked = counts.withColumn("__r", F.row_number().over(w))
    return (
        ranked.groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_units"),
            F.sum("__x").alias("total"),
            F.sum(F.col("__r") * F.col("__x")).alias("__rx"),
        )
        .select(
            key,
            F.col("n_units").cast("long").alias("n_units"),
            F.col("total").cast("long").alias("total"),
            F.expr(
                "(2 * __rx - (n_units + 1) * total) * 1000000"
                " DIV (n_units * total)"
            )
            .cast("long")
            .alias("gini_x1e6"),
        )
    )


def completeness_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Column completeness/cardinality profile — the first page of a data
    card and the pass that decides which columns are usable as ER keys or
    KG attributes before FD/IND/λ profiling runs: per column, row count,
    nulls, empty-after-trim strings, distinct non-null values, and the
    top value with its count (pinned tie-break: max count then LARGEST
    value string — the struct-max order both engines replay).

    Scale shape: ONE explode fans each row into |cols| (col, value)
    structs over a single scan (the fd-profile pattern); a (col, value)
    combinable count collapses the input, and every readout — including
    n_distinct and the argmax value — comes from ONE rollup over that
    collapsed table (max_by with a pinned tie-break struct). Null/empty
    counts ride the same collapsed table (null encodes as a sentinel
    struct field, never a sentinel VALUE that could collide with data).
    """
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(c).cast("string").alias("v"),
            F.col(c).isNull().cast("int").alias("is_null"),
        )
        for c in cols
    ]
    p = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    vc = p.groupBy("col", "v", "is_null").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        vc.groupBy("col")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(F.when(F.col("is_null") == 1, F.col("cnt")).otherwise(0))
            .alias("n_null"),
            F.sum(
                F.when(
                    (F.col("is_null") == 0) & (F.trim(F.col("v")) == ""),
                    F.col("cnt"),
                ).otherwise(0)
            ).alias("n_empty"),
            F.count(F.when(F.col("is_null") == 0, F.lit(1))).alias("n_distinct"),
            F.max_by(
                F.col("v"),
                F.when(
                    F.col("is_null") == 0,
                    F.struct(
                        F.col("cnt").alias("c"),
                        # negate lexicographic order via a paired struct is
                        # not expressible; pin ties by max (cnt, v) instead:
                        # max count wins, then LARGEST value string — the
                        # pin just has to be total and replayable
                        F.col("v").alias("tv"),
                    ),
                ),
            ).alias("top_value"),
            F.max(
                F.when(F.col("is_null") == 0, F.col("cnt")).otherwise(
                    F.lit(None).cast("long")
                )
            ).alias("top_count"),
        )
        .select(
            "col",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_null").cast("long").alias("n_null"),
            F.col("n_empty").cast("long").alias("n_empty"),
            F.col("n_distinct").cast("long").alias("n_distinct"),
            "top_value",
            F.coalesce(F.col("top_count"), F.lit(0)).cast("long").alias("top_count"),
        )
    )


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law expected shares
# as exact integer literals, so neither engine evaluates a log at runtime.
BENFORD_X1E6 = (301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757)


def benford_profile(
    df: DataFrame,
    value_col: str = "value",
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the synthetic-
    data / fabricated-metrics forensic: naturally-occurring multiplicative
    quantities follow P(d) = log10(1 + 1/d); uniform generators (like this
    fixture's) deviate with a signature excess on high digits. Emits exact
    observed shares beside the expected constants plus the per-digit
    deviation, all integers (the log10 constants are baked literals, never
    runtime floats).

    Rows with value <= 0 or NULL are excluded (first significant digit is
    undefined); the first digit is extracted LEXICALLY from the plain
    decimal rendering of floor(abs(value) * 1e6) — pure integer string
    logic both engines share, no float formatting drift.

    Scale shape: map-side digit extraction, ONE 9-key combinable groupBy,
    expected table joined as a 9-row broadcast. Returns (digit, n,
    share_x1e6, benford_x1e6, dev_x1e6 = share − expected).
    """
    spark = df.sparkSession
    exp_rows = [(i + 1, v) for i, v in enumerate(BENFORD_X1E6)]
    expected = spark.createDataFrame(exp_rows, "digit int, benford_x1e6 long")
    scaled = df.select(
        F.floor(F.abs(F.col(value_col)) * 1000000).cast("long").alias("__s")
    ).filter(F.col("__s") > 0)
    digits = scaled.select(
        F.substring(F.col("__s").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(expected), "digit")
        .select(
            "digit",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 DIV __t").cast("long").alias("share_x1e6"),
            "benford_x1e6",
            (F.expr("n * 1000000 DIV __t") - F.col("benford_x1e6"))
            .cast("long")
            .alias("dev_x1e6"),
        )
    )


def ngram_novelty_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bucket_size: int = 100,
) -> DataFrame:
    """Corpus saturation curve: cumulative distinct word n-grams as the
    corpus grows in ``id_col`` order, bucketed every ``bucket_size`` docs —
    the dedup-ROI estimator (a curve that flattens early says new documents
    add little novel text; the slope at the tail prices further crawling).

    Exact semantics: an n-gram's FIRST occurrence is the minimum doc bucket
    containing it; per-bucket first-occurrence counts then a cumulative
    window over the ≤ (n_docs/bucket_size)-row bucket table. share_x1e6 is
    cumulative novel grams ·1e6 DIV cumulative total grams (both exact).

    Scale shape: the gram explode is the only corpus-scale stage (same
    shape as every shingle pipeline here); min-bucket per gram and per-
    bucket totals are combinable aggs; the cumulative window runs on the
    collapsed bucket table, never the grams. The gram table is consumed
    by BOTH rollups — eagerly checkpointed (tf/df rule).
    """
    toks = F.split(F.col(text_col), " ")
    grams = (
        df.select(
            (F.col(id_col).cast("long") / bucket_size).cast("long").alias("__bkt"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
                )
            ).alias("__g"),
        )
        .filter(F.size(toks) >= n)
        .localCheckpoint(eager=True)
    )
    first = grams.groupBy("__g").agg(F.min("__bkt").alias("__bkt"))
    novel = first.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n_novel"))
    totals = grams.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n_grams"))
    w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        totals.join(novel, "__bkt", "left")
        .select(
            F.col("__bkt").cast("long").alias("bucket"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
        )
        .withColumn("cum_novel", F.sum("n_novel").over(w).cast("long"))
        .withColumn("cum_grams", F.sum("n_grams").over(w).cast("long"))
        .withColumn(
            "novelty_x1e6",
            F.expr("cum_novel * 1000000 DIV cum_grams").cast("long"),
        )
    )


def distribution_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    suffix_a: str = "a",
    suffix_b: str = "b",
) -> DataFrame:
    """Categorical distribution drift between two snapshots — the
    train/serve skew monitor (PSI's job without PSI's logarithms): total
    variation distance between the two corpora's category shares, with
    per-category contributions so the drifting categories are named, not
    just scored. Complements t_closeness (class-vs-global TVD within ONE
    corpus) with the corpus-vs-corpus comparison.

    Exact integers: with totals Na, Nb, the per-category share delta is
    |n_a·Nb − n_b·Na| · 1e6 DIV (Na·Nb) and tvd_x1e6 is the same sum DIV
    (2·Na·Nb) — no float share ever materializes. Bound (documented):
    needs Na·Nb < 2^63/1e6, i.e. snapshots up to ~3e6 rows each compared
    raw; beyond that pre-aggregate to category counts first (the operator
    only ever sees counts, so callers can feed pre-collapsed tables by
    passing them straight in).

    Categories absent from one side count with n = 0 (full outer join).

    Scale shape: one combinable count per side, a category-keyed full
    outer join on the two COLLAPSED tables, totals broadcast back, and
    the TVD total attached to every row from a window over the ≤
    |categories| result (the er_threshold_curve collapsed-window rule).

    Returns (cat, n_a, n_b, share_a_x1e6, share_b_x1e6, delta_x1e6,
    tvd_x1e6) — tvd repeated per row for single-readout consumers.
    """
    # each side's collapsed count table feeds the join AND its total —
    # checkpoint both (≤|categories| rows) so each corpus is scanned once
    ca = (
        df_a.groupBy(F.col(col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("n_a"))
        .localCheckpoint(eager=True)
    )
    cb = (
        df_b.groupBy(F.col(col).alias("cat"))
        .agg(F.count(F.lit(1)).alias("n_b"))
        .localCheckpoint(eager=True)
    )
    ta = ca.agg(F.sum("n_a").alias("__ta"))
    tb = cb.agg(F.sum("n_b").alias("__tb"))
    joined = (
        ca.join(cb, "cat", "full_outer")
        .na.fill({"n_a": 0, "n_b": 0})
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
    )
    w = Window.partitionBy()
    delta_raw = F.abs(
        F.col("n_a") * F.col("__tb") - F.col("n_b") * F.col("__ta")
    )
    return (
        joined.withColumn("__d", delta_raw)
        .withColumn("__dsum", F.sum("__d").over(w))
        .select(
            "cat",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.expr("n_a * 1000000 DIV __ta").cast("long").alias("share_a_x1e6"),
            F.expr("n_b * 1000000 DIV __tb").cast("long").alias("share_b_x1e6"),
            F.expr("__d * 1000000 DIV (__ta * __tb)")
            .cast("long")
            .alias("delta_x1e6"),
            F.expr("__dsum * 1000000 DIV (2 * __ta * __tb)")
            .cast("long")
            .alias("tvd_x1e6"),
        )
    )


def script_profile(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Unicode script-mix audit per group — the multilingual-integrity /
    spoofing screen (mixed-script tokens are the confusable-attack and
    mojibake signature; a 'latin' corpus with creeping CJK or Cyrillic
    mass has an ingestion bug). NO regex: characters classify by CODEPOINT
    arithmetic (transform(split(text,''), c -> ascii(c)) gives identical
    codepoint arrays in both engines — measured), so there is no
    regex-dialect hazard at all.

    Classes: latin letters, digits, whitespace (space/tab/newline),
    Cyrillic (U+0400-04FF), CJK unified (U+4E00-9FFF), other.
    mixed_docs counts documents carrying BOTH latin and (cyrillic|cjk)
    letters — the confusable signal.

    Scale shape: the per-char explode-free classification happens inside
    array expressions (size(filter(...)) — whole-stage codegen, no
    Generate); one combinable group rollup.

    Returns (group, n_docs, n_chars, n_latin, n_digit, n_space,
    n_cyrillic, n_cjk, n_other, mixed_docs).
    """
    cps = f"transform(split({text_col}, ''), c -> ascii(c))"

    def cnt(cond: str):
        return F.expr(f"size(filter({cps}, p -> {cond}))").cast("long")

    latin = cnt("(p >= 65 AND p <= 90) OR (p >= 97 AND p <= 122)")
    digit = cnt("p >= 48 AND p <= 57")
    space = cnt("p = 32 OR p = 9 OR p = 10 OR p = 13")
    cyr = cnt("p >= 1024 AND p <= 1279")
    cjk = cnt("p >= 19968 AND p <= 40959")
    per_doc = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(
        F.col(group_col).alias("grp"),
        F.length(text_col).cast("long").alias("__len"),
        latin.alias("__lat"),
        digit.alias("__dig"),
        space.alias("__spc"),
        cyr.alias("__cyr"),
        cjk.alias("__cjk"),
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").alias("n_chars"),
            F.sum("__lat").alias("n_latin"),
            F.sum("__dig").alias("n_digit"),
            F.sum("__spc").alias("n_space"),
            F.sum("__cyr").alias("n_cyrillic"),
            F.sum("__cjk").alias("n_cjk"),
            F.sum(
                F.when(
                    (F.col("__lat") > 0)
                    & ((F.col("__cyr") > 0) | (F.col("__cjk") > 0)),
                    1,
                ).otherwise(0)
            ).alias("mixed_docs"),
        )
        .select(
            F.col("grp").alias(group_col),
            *[
                F.col(c).cast("long").alias(c)
                for c in (
                    "n_docs", "n_chars", "n_latin", "n_digit", "n_space",
                    "n_cyrillic", "n_cjk", "mixed_docs",
                )
            ],
            (
                F.col("n_chars") - F.col("n_latin") - F.col("n_digit")
                - F.col("n_space") - F.col("n_cyrillic") - F.col("n_cjk")
            ).cast("long").alias("n_other"),
        )
    )


def dp_geometric_release(
    df: DataFrame,
    key_col: str,
    eps_log2: int = 1,
    seed: str = "dp",
) -> DataFrame:
    """Differentially-private count release via the two-sided geometric
    mechanism (Ghosh, Roughgarden & Sundararajan 2009) — the MECHANISM
    completing the privacy readout trio (k-anonymity / l-diversity /
    t-closeness measure risk; this one actually perturbs the release).
    Per key the true count n is published as n + (G1 - G2) where each Gi
    is geometric with ratio alpha = 2^-eps_log2, i.e. discrete Laplace
    with epsilon = eps_log2 * ln 2 for the count query's sensitivity 1.

    Exact-integer noise, no float log anywhere: a md5-derived 60-bit
    uniform h has trailing-zero count tz = bit_count((h & -h) - 1)
    distributed Geometric(1/2) (P(tz >= k) = 2^-k), and tz DIV j is
    exactly Geometric(2^-j) — so the whole draw is hash + bit arithmetic
    that DuckDB replays bit-for-bit (both engines have bit_count, &, -).
    tz is clamped at 40 to bound the astronomically-rare all-zero tail
    identically in both engines.

    HONESTY NOTE (same contract as the multimodal codec stub): the draw
    is seeded from (seed, key), which makes runs reproducible and the
    oracle replayable, but a DETERMINISTIC draw is pseudo-randomness, not
    privacy — an adversary who knows the seed can subtract the noise.
    Production swaps `_tz` for a CSPRNG geometric draw; every other line
    (sensitivity, alpha, the G1-G2 composition, the release shape) is the
    real mechanism. Supported epsilon grid is {j*ln 2}: ratios off the
    2^-j grid need rational-arithmetic inverse-CDF sampling, which no
    longer replays in integer SQL.

    One map-side-combinable count + map-only noise: scales trivially.
    Negative releases are kept (the unbiased estimator convention).
    """
    if eps_log2 < 1:
        raise ValueError("eps_log2 must be >= 1 (epsilon = eps_log2 * ln 2)")

    def _tz(tag: str):
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws("#", F.lit(seed), F.lit(tag), F.col(key_col))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        raw = F.bit_count((h.bitwiseAND(-h)) - F.lit(1)).cast("long")
        tz = F.least(raw, F.lit(40).cast("long"))
        # tz DIV j: both non-negative and tiny, so the double quotient
        # never crosses an integer boundary — floor() is exact here and
        # matches DuckDB's integer // bit-for-bit
        return F.floor(tz / F.lit(eps_log2)).cast("long")

    g1 = _tz("a")
    g2 = _tz("b")
    counts = df.groupBy(F.col(key_col)).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    return counts.select(
        F.col(key_col),
        (F.col("_n") + g1 - g2).cast("long").alias("n_released"),
    )


# UTF-8-decoded-as-Latin-1 signatures + hard corruption markers. Each entry
# is (anomaly_name, marker substring), spelled as escapes so the source
# stays ASCII-clean.
_ENCODING_MARKERS = [
    ("mojibake_a_tilde", "\u00c3"),   # UTF-8 2-byte lead read as Latin-1
    ("mojibake_smartq", "\u00e2\u0080"),  # smart-quote family mis-decode
    ("mojibake_a_caret", "\u00c2"),   # NBSP/degree-sign mis-decode
    ("replacement_char", "\ufffd"),   # decoder already gave up
    ("bom_in_body", "\u00ef\u00bb\u00bf"),  # UTF-8 BOM mis-decoded mid-text
    ("nul_byte", "\u0000"),
]


def encoding_anomaly_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus encoding-integrity screen: per anomaly class, how many
    documents carry a mojibake / corruption signature — the double-decode
    detector (UTF-8 bytes re-read as Latin-1 leave U+00C3 / U+00E2,U+0080 /
    U+00C2 fingerprints) plus U+FFFD, in-body BOM, and NUL. The
    data-cleaning readout a crawl pipeline runs BEFORE tokenization:
    script_mix sees legitimate multilingual text, this sees text that was
    never decoded correctly at all.

    Substring markers only (instr/strpos — identical semantics in both
    engines), no regex dialect exposure. One explode fans each doc into
    |markers| (anomaly, hit) pairs — single scan, no per-marker UNION —
    then one combinable rollup. The total crosses the driver as one
    integer (same contract as the assortativity scalars).

    Returns (anomaly, n_docs, n_total, share_x1e6).
    """
    total = df.count()
    structs = [
        F.struct(
            F.lit(name).alias("anomaly"),
            F.when(
                F.instr(F.col(text_col), marker) > 0, F.lit(1)
            ).otherwise(F.lit(0)).alias("hit"),
        )
        for name, marker in _ENCODING_MARKERS
    ]
    fan = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    return fan.groupBy("anomaly").agg(
        F.sum("hit").cast("long").alias("n_docs"),
        F.lit(total).cast("long").alias("n_total"),
        F.expr(f"CAST(sum(hit) * 1000000 DIV {max(total, 1)} AS BIGINT)").alias(
            "share_x1e6"
        ),
    )


def dict_encoding_advisor(df: DataFrame, cols: list) -> DataFrame:
    """Storage-layout advisor for dictionary encoding: per string column,
    the exact byte arithmetic Parquet's encoder faces — plain size
    (sum of value lengths) vs dictionary size (sum of DISTINCT value
    lengths + a 4-byte index per row) — and the integer savings share.
    The companion readout to the Z-order layout keys: zorder decides row
    ORDER, this decides per-column ENCODING, both before a 100 TB
    rewrite. Columns whose savings_x1e6 <= 0 (high-cardinality, long
    tails) should stay plain — dictionary pages would bloat.

    One explode fans each row into |cols| (col, value) pairs — single
    scan, no per-column UNION — then a (col, value) collapse and a
    |cols|-row rollup; NULLs count 0 bytes plain and are excluded from
    the dictionary (Parquet stores them in def-levels either way).

    Returns (col, n_rows, n_distinct, plain_bytes, dict_bytes,
    savings_x1e6).
    """
    structs = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(c).cast("string").alias("val"),
        )
        for c in cols
    ]
    fan = df.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
    vc = fan.groupBy("col", "val").agg(F.count(F.lit(1)).alias("n"))
    return vc.groupBy("col").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("val").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_distinct"),
        F.sum(F.coalesce(F.length("val"), F.lit(0)) * F.col("n"))
        .cast("long")
        .alias("plain_bytes"),
        (
            F.sum(F.coalesce(F.length("val"), F.lit(0)))
            + F.sum("n") * F.lit(4)
        ).cast("long").alias("dict_bytes"),
        F.expr(
            "CAST((sum(coalesce(length(val), 0) * n) "
            " - (sum(coalesce(length(val), 0)) + sum(n) * 4)) * 1000000 "
            "DIV greatest(sum(coalesce(length(val), 0) * n), 1) AS BIGINT)"
        ).alias("savings_x1e6"),
    )


def hhi_concentration(
    df: DataFrame,
    key: str = "event_type",
    unit_col: str = "user_id",
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per key — Σ share² over
    per-unit mass — plus its reciprocal, the EFFECTIVE number of units.
    The pair complements `gini_concentration` on the same (key, unit)
    collapsed table: Gini reads inequality of the distribution's shape,
    HHI reads how few units dominate (the number a corpus governance
    report quotes as "effectively N sources"), and unlike Gini the HHI
    is mergeable from (Σc², Σc) partials alone — no global sort, no
    rank window, ONE combinable aggregate end to end.

    Exact integers: hhi_x1e6 = Σc²·1e6 / N² as a twice-staged truncated
    quotient (floor-composition identity keeps it exact); eff_x1e3 =
    N²·1e3 DIV Σc². Bounds (documented, same family as gini's): needs
    N²·1e3 < 2^63 — totals up to ~3e6 per key exactly; beyond that,
    drop eff or lift to DECIMAL(38).

    Returns (key, n_units, total, s2, hhi_x1e6, eff_x1e3); a single
    dominating unit reads hhi = 1e6, a uniform spread over u units
    reads ≈ 1e6/u and eff ≈ u·1e3.
    """
    counts = df.groupBy(key, unit_col).agg(F.count(F.lit(1)).alias("__x"))
    return (
        counts.groupBy(key)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_units"),
            F.sum("__x").cast("long").alias("total"),
            F.sum(F.col("__x") * F.col("__x")).cast("long").alias("s2"),
        )
        .select(
            key,
            "n_units",
            "total",
            "s2",
            F.expr(
                "CAST((s2 DIV total * CAST(1000000 AS BIGINT)"
                " + s2 % total * CAST(1000000 AS BIGINT) DIV total)"
                " DIV total AS BIGINT)"
            ).alias("hhi_x1e6"),
            F.expr(
                "CAST(total * total * 1000 DIV s2 AS BIGINT)"
            ).alias("eff_x1e3"),
        )
    )


def contingency_tvd(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Total-variation distance between the JOINT distribution of two
    categoricals and the PRODUCT of their marginals — the exact-integer
    independence screen (the role a chi-square test plays, without
    chi-square's float sums): 0 iff the columns are independent on this
    data, 1 at maximal association. The readout a feature audit runs
    before trusting "column A adds signal beyond column B", and the
    leakage screen between a label and a supposedly-neutral attribute.

    TVD = ½ Σ_cells |P(r,c) − P(r)P(c)| over ALL marginal combinations;
    unobserved cells contribute P(r)P(c), folded in without enumerating
    them: Σ_all |O·N − r·c| = Σ_obs |O·N − r·c| + (N² − Σ_obs r·c).
    tvd_x1e6 is the twice-staged truncated quotient of S·1e6/(2N²)
    (floor-composition exact; every term BIGINT). Bound: S ≤ 2N² needs
    N ≲ 3e6 for the staged ×1e6 — beyond, lift to DECIMAL(38).

    Shape: ONE combinable (row, col) count collapses the input; both
    marginals and the final fold are rollups over that collapsed table
    (≤ |R|·|C| rows), broadcast-joined back. No second scan of the
    input.

    Returns one row (n, n_row_cats, n_col_cats, s_abs, tvd_x1e6).
    """
    cells = (
        df.select(F.col(row_col).alias("__r"), F.col(col_col).alias("__c"))
        .groupBy("__r", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint(eager=True)  # marginals + fold share it
    )
    rm = cells.groupBy("__r").agg(F.sum("__o").alias("__rt"))
    cm = cells.groupBy("__c").agg(F.sum("__o").alias("__ct"))
    # the fold needs N inside per-cell terms: one broadcast single-row
    # aggregate, then one pass over the collapsed cell table.
    tot = cells.agg(F.sum("__o").cast("long").alias("__n"))
    folded = (
        cells.join(F.broadcast(rm), "__r")
        .join(F.broadcast(cm), "__c")
        .join(F.broadcast(tot))
        .agg(
            F.max("__n").alias("n"),
            F.countDistinct("__r").cast("long").alias("n_row_cats"),
            F.countDistinct("__c").cast("long").alias("n_col_cats"),
            (
                F.sum(F.abs(F.col("__o") * F.col("__n") - F.col("__rt") * F.col("__ct")))
                + F.max(F.col("__n") * F.col("__n"))
                - F.sum(F.col("__rt") * F.col("__ct"))
            )
            .cast("long")
            .alias("s_abs"),
        )
        .select(
            "n",
            "n_row_cats",
            "n_col_cats",
            "s_abs",
            F.expr(
                "CAST((s_abs DIV n * CAST(1000000 AS BIGINT) "
                "+ s_abs % n * CAST(1000000 AS BIGINT) DIV n) "
                "DIV (2 * n) AS BIGINT)"
            ).alias("tvd_x1e6"),
        )
    )
    return folded


def contingency_chi2(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-squared independence statistic plus Cramér's V² over
    two categoricals — the classical effect-size companion to
    `contingency_tvd` (TVD answers "how far from independent on THIS
    data"; V² normalizes by table size so thresholds transfer across
    tables, the number a feature-selection pass actually ranks by).

    Exact-integer core via the algebraic identity χ² = N·Σ_obs O²/(r·c)
    − N (unobserved cells drop out of the sum entirely — no enumeration
    of the full marginal cross product needed, unlike TVD's fold).
    Each per-cell term t = O²·1e6 staged-DIV (r·c) is BOUNDED: O ≤ r and
    O ≤ c imply O² ≤ r·c, so t ≤ 1e6 regardless of N — truncation is
    replayed identically by the oracle (the quantized-statistic
    contract). Then chi2_x1e6 = N·(Σt − 1e6) and cramers_v2_x1e6 =
    (Σt − 1e6) DIV (min(R,C) − 1), both clamped at 0 (per-cell
    truncation can push Σt one ulp under 1e6 on an exactly-independent
    table). Headroom: O² needs O ≲ 3e9 per cell and N·Σt needs
    N·cells·1e6 ≲ 9e18 — beyond, lift to DECIMAL(38).

    Shape: identical to contingency_tvd — ONE combinable (row, col)
    count collapses the input; marginals are rollups of the collapsed
    table broadcast back; the statistic is one pass over ≤ |R|·|C|
    rows. Degenerate 1×K / K×1 tables return v² = 0 (min − 1 = 0 is
    guarded to divide by 1: χ² is identically 0 there anyway).

    Returns one row (n, n_row_cats, n_col_cats, sum_t_x1e6, chi2_x1e6,
    cramers_v2_x1e6).
    """
    cells = (
        df.select(F.col(row_col).alias("__r"), F.col(col_col).alias("__c"))
        .groupBy("__r", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint(eager=True)  # marginals + fold share it
    )
    rm = cells.groupBy("__r").agg(F.sum("__o").alias("__rt"))
    cm = cells.groupBy("__c").agg(F.sum("__o").alias("__ct"))
    return (
        cells.join(F.broadcast(rm), "__r")
        .join(F.broadcast(cm), "__c")
        .agg(
            F.sum("__o").cast("long").alias("n"),
            F.countDistinct("__r").cast("long").alias("n_row_cats"),
            F.countDistinct("__c").cast("long").alias("n_col_cats"),
            F.sum(
                F.expr(
                    "__o * __o DIV (__rt * __ct) * CAST(1000000 AS BIGINT)"
                    " + __o * __o % (__rt * __ct)"
                    "   * CAST(1000000 AS BIGINT) DIV (__rt * __ct)"
                )
            )
            .cast("long")
            .alias("sum_t_x1e6"),
        )
        .select(
            "n",
            "n_row_cats",
            "n_col_cats",
            "sum_t_x1e6",
            F.expr(
                "greatest(CAST(0 AS BIGINT),"
                " n * (sum_t_x1e6 - CAST(1000000 AS BIGINT)))"
            ).alias("chi2_x1e6"),
            F.expr(
                "greatest(CAST(0 AS BIGINT),"
                " (sum_t_x1e6 - CAST(1000000 AS BIGINT))"
                " DIV greatest(least(n_row_cats, n_col_cats) - 1,"
                "              CAST(1 AS BIGINT)))"
            ).alias("cramers_v2_x1e6"),
        )
    )


def zipf_msb_slope(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Zipf-law fit of the corpus token-frequency distribution — the
    vocabulary-health fingerprint (natural text reads slope ≈ −1 in
    log-log; template/boilerplate corpora flatten, spam steepens): OLS
    slope of log2(freq) against log2(rank) with BOTH logs quantized to
    the integer msb (length(bin(v)) − 1 = floor(log2), the same
    bin()-length device as Adamic-Adar's 1/log), so every moment is
    BIGINT-exact and the oracle replays the identical quantization —
    no float log anywhere.

    Shape: one explode+count collapses the corpus to the (token, freq)
    vocabulary; rank is one window over the VOCABULARY (|V| rows, desc
    freq, token-pinned ties); the four OLS moments are one rollup.
    Moment bound: Σ(lx·lx) ≤ |V|·log2(|V|)² — safe far beyond any real
    vocabulary.

    Returns one row (n_vocab, n_tokens, num, den, slope_x1e6) with
    slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) as the signed staged
    quotient.
    """
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: t != F.lit("")
    )
    vocab = (
        df.select(F.explode(toks).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("__f"))
    )
    ranked = vocab.select(
        "__f",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("__f").desc(), F.col("__t")))
        .cast("long")
        .alias("__r"),
    ).select(
        F.expr("length(bin(__r)) - 1").cast("long").alias("__x"),
        F.expr("length(bin(__f)) - 1").cast("long").alias("__y"),
        "__f",
    )
    return (
        ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n_vocab"),
            F.sum("__f").cast("long").alias("n_tokens"),
            F.sum("__x").cast("long").alias("__sx"),
            F.sum("__y").cast("long").alias("__sy"),
            F.sum(F.col("__x") * F.col("__y")).cast("long").alias("__sxy"),
            F.sum(F.col("__x") * F.col("__x")).cast("long").alias("__sxx"),
        )
        .select(
            "n_vocab",
            "n_tokens",
            (F.col("n_vocab") * F.col("__sxy") - F.col("__sx") * F.col("__sy"))
            .cast("long")
            .alias("num"),
            (F.col("n_vocab") * F.col("__sxx") - F.col("__sx") * F.col("__sx"))
            .cast("long")
            .alias("den"),
        )
        .select(
            "n_vocab",
            "n_tokens",
            "num",
            "den",
            F.expr(
                "CASE WHEN den = 0 THEN CAST(0 AS BIGINT) ELSE "
                "CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) * "
                "(abs(num) DIV den * CAST(1000000 AS BIGINT) "
                " + abs(num) % den * CAST(1000000 AS BIGINT) DIV den) "
                "AS BIGINT) END"
            ).alias("slope_x1e6"),
        )
    )


def bigram_nll(
    df: DataFrame,
    target: "F.Column",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document negative log-likelihood under an add-1-smoothed bigram
    language model trained on the TARGET subset — the KenLM-style
    perplexity filter of a CCNet-shaped pipeline (score every document by
    how surprising it is to a clean-corpus LM; filter or bucket on the
    score), with the float-log problem solved the engine's way: each
    bigram's -log2 p(b|a) = log2((c1(a)+V) / (c2(a,b)+1)) is quantized with
    the exact-integer msb16 device (16 sub-octave steps, operators/
    sampling._msb16_sql), so scores are BIGINT-exact and the DuckDB oracle
    replays them bit-for-bit.

    Shape: training collapses the target corpus to bigram counts (one
    shuffle on the bigram key, map-side combined; Zipf-small output) +
    unigram counts + a 1-row vocab size broadcast; scoring joins every doc
    bigram against the two count tables (shuffle on the bigram/unigram
    keys — broadcastable when the trained LM is small) and sums per doc.

    Returns (doc_id, n_pairs, nll_s16, avg_nll_permille): total quantized
    NLL and its per-pair mean in permille units (exact integer quotient
    total*1000 DIV n_pairs). Documents with < 2 tokens are dropped."""
    from .sampling import _msb16_sql

    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        ),
        lambda t: t != F.lit(""),
    )
    base = df.select(
        F.col(id_col).alias("__id"), target.alias("__is_t"), toks.alias("__t")
    ).filter(F.size("__t") >= 2)
    pairs = base.select(
        "__id",
        "__is_t",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1),"
                " i -> struct(element_at(__t, i) AS a,"
                "             element_at(__t, i + 1) AS b))"
            )
        ).alias("__p"),
    ).select("__id", "__is_t", F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))

    train = pairs.filter(F.col("__is_t"))
    # ONE pass over the training corpus: the Zipf-small bigram-count table
    # is eagerly checkpointed and c1 / vocab are derived FROM it — computing
    # them from `train` directly would re-execute the corpus explode per
    # aggregate (the tf/df re-execution family; measured 3.7x on minhash
    # bands)
    c2 = (
        train.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .localCheckpoint(eager=True)
    )
    c1 = c2.groupBy("a").agg(F.sum("c2").cast("long").alias("c1"))
    # vocab = distinct tokens in the training corpus (both pair slots)
    v = (
        c2.select(F.col("a").alias("t"))
        .unionByName(c2.select(F.col("b").alias("t")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )
    scored = (
        pairs.join(c2, ["a", "b"], "left")
        .join(c1, ["a"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "__id",
            F.expr(
                "CAST("
                + _msb16_sql(
                    "(coalesce(c1, CAST(0 AS BIGINT)) + v)"
                    " * CAST(1048576 AS BIGINT)"
                    " DIV (coalesce(c2, CAST(0 AS BIGINT)) + 1)"
                )
                + " AS BIGINT)"
            ).alias("__s"),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("__s").cast("long").alias("nll_s16"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_pairs",
            "nll_s16",
            F.expr("nll_s16 * CAST(1000 AS BIGINT) DIV n_pairs").alias(
                "avg_nll_permille"
            ),
        )
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-bigram collocations by pointwise mutual information —
    the phrase-mining pass of a word2vec/tokenizer pipeline (Mikolov et
    al. 2013 §4 learn phrases from exactly this statistic; the reference
    pipeline has no phrase stage — LLM-pipeline surface beyond
    /root/reference). PMI is computed over the BIGRAM event space with
    slot marginals, so every quantity is a count off one collapsed table:
    PMI(a,b) = log2( c2(a,b)·n2 / (ca(a)·cb(b)) ) with ca = a's
    first-slot count, cb = b's second-slot count, n2 = total bigrams.

    Exact-integer cross-engine contract: the ratio is the twice-staged
    truncated quotient q = (c2·2^20 DIV ca)·n2 DIV cb (c2 <= ca keeps the
    first stage <= 2^20, so the second fits while n2 < 2^42 — ~4e12
    bigrams, the 10^12-turn scale), then pmi_s16 = msb16(q) − 320 in
    1/16-bit units — no float log anywhere, the DuckDB oracle replays
    bin()/shift/DIV bit-for-bit.

    Shape at 100 TB: one corpus explode collapses to the Zipf-small
    (a, b, c2) table (map-side combine), eagerly checkpointed so the slot
    marginals and n2 derive from IT, not from a re-executed corpus scan
    (the tf/df re-execution family); the min_count filter prunes the
    hapax tail BEFORE the marginal joins; the final top-k window runs
    over the thresholded vocabulary-sized table, never the corpus.

    Returns (a, b, c2, ca, cb, pmi_s16, rnk), rnk 1..k by
    (pmi_s16 desc, c2 desc, a, b).
    """
    from .sampling import _msb16_sql

    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    base = df.select(toks.alias("__t")).filter(F.size("__t") >= 2)
    pairs = base.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(__t) - 1),"
                " i -> struct(element_at(__t, i) AS a,"
                "             element_at(__t, i + 1) AS b))"
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
    c2 = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c2"))
        .localCheckpoint(eager=True)
    )
    ca = c2.groupBy("a").agg(F.sum("c2").cast("long").alias("ca"))
    cb = c2.groupBy("b").agg(F.sum("c2").cast("long").alias("cb"))
    n2 = c2.agg(F.sum("c2").cast("long").alias("n2"))
    q = "(c2 * CAST(1048576 AS BIGINT) DIV ca) * n2 DIV cb"
    scored = (
        c2.filter(F.col("c2") >= min_count)
        .join(ca, ["a"])
        .join(cb, ["b"])
        .crossJoin(F.broadcast(n2))
        .select(
            "a",
            "b",
            "c2",
            "ca",
            "cb",
            F.expr(f"CAST({_msb16_sql(q)} - 320 AS BIGINT)").alias("pmi_s16"),
        )
    )
    w = Window.partitionBy().orderBy(
        F.col("pmi_s16").desc(), F.col("c2").desc(), F.col("a"), F.col("b")
    )
    return scored.select(
        "*", F.row_number().over(w).cast("long").alias("rnk")
    ).filter(F.col("rnk") <= k)


def mutual_information(
    df: DataFrame,
    row_col: str = "event_type",
    col_col: str = "dow",
) -> DataFrame:
    """Mutual information between two categorical columns in exact integer
    units — the information-gain readout beside `contingency_chi2`
    (effect-size significance) and `contingency_tvd` (mass distance) on
    the identical collapsed contingency table: MI = Σ_cells p_xy·
    log2(N·c_xy / (r·c)), the feature-selection statistic a curation
    pipeline ranks metadata columns with before training a quality
    classifier.

    Exact-integer cross-engine contract: per cell the ratio is the
    twice-staged truncated quotient q = (c_xy·2^20 DIV r)·N DIV c
    (c_xy <= r keeps stage 1 <= 2^20; stage 2 fits while N < 2^42), the
    log is the msb16 device (pmi_s16 = msb16(q) − 320, 1/16-bit steps),
    and the cell's contribution is c_xy·pmi_s16 — so the total is BIGINT
    exact (|Σ| <= N·16·log2 N) and the DuckDB oracle replays it
    bit-for-bit. Unobserved cells contribute 0 by definition (c_xy = 0),
    so only the observed-cell table is ever touched.

    Shape: ONE groupBy collapses to the observed-cell table (map-side
    combined, output bounded by |X|·|Y| categories, never rows); the
    marginals are two broadcast-sized aggregates OF the checkpointed cell
    table; one scalar rollup ends it.

    Returns one row (n, n_row_cats, n_col_cats, mi_x16n,
    mi_bits_x1e6) with mi_bits_x1e6 = mi_x16n·62500 DIV n (1e6/16 per
    count unit). Independent columns read ~0 (small positive bias);
    perfectly dependent read ~1e6·min(H(X), H(Y)) bits.
    """
    from .sampling import _msb16_sql

    cells = (
        df.select(
            F.col(row_col).alias("__r"), F.col(col_col).alias("__c")
        )
        .groupBy("__r", "__c")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
        .localCheckpoint(eager=True)
    )
    rm = cells.groupBy("__r").agg(F.sum("__o").cast("long").alias("__rt"))
    cm = cells.groupBy("__c").agg(F.sum("__o").cast("long").alias("__ct"))
    nn = cells.agg(F.sum("__o").cast("long").alias("__n"))
    q = "(__o * CAST(1048576 AS BIGINT) DIV __rt) * __n DIV __ct"
    return (
        cells.join(F.broadcast(rm), "__r")
        .join(F.broadcast(cm), "__c")
        .crossJoin(F.broadcast(nn))
        .agg(
            F.max("__n").cast("long").alias("n"),
            F.countDistinct("__r").cast("long").alias("n_row_cats"),
            F.countDistinct("__c").cast("long").alias("n_col_cats"),
            F.sum(F.expr(f"__o * ({_msb16_sql(q)} - 320)"))
            .cast("long")
            .alias("mi_x16n"),
        )
        .select(
            "n",
            "n_row_cats",
            "n_col_cats",
            "mi_x16n",
            F.expr(
                "CASE WHEN mi_x16n >= 0"
                " THEN mi_x16n * CAST(62500 AS BIGINT) DIV n"
                " ELSE -((-mi_x16n) * CAST(62500 AS BIGINT) DIV n) END"
            ).alias("mi_bits_x1e6"),
        )
    )


RAKE_DEFAULT_STOPWORDS = (
    "the", "a", "an", "of", "and", "or", "to", "in", "on", "for",
    "is", "are", "was", "at", "by", "with", "as", "it", "this", "that",
)


def rake_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: "tuple[str, ...]" = RAKE_DEFAULT_STOPWORDS,
    max_len: int = 3,
    min_count: int = 1,
    k: int = 50,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    the maximal stopword-free token runs, each word is scored
    degree/frequency over the phrase corpus (degree = Σ length of the
    phrases it occurs in, itself included — so glue words that only ever
    appear alone score 1, words living in long collocations score up to
    max_len), and a phrase's score is the sum of its words' scores — the
    unsupervised keyword pass of a document-tagging pipeline (the
    reference has no keyword stage; LLM-pipeline surface).

    Exact integers: word_score_x1e6 = degree·1e6 DIV freq (bounded by
    max_len·1e6); phrase score = Σ word scores — BIGINT throughout, no
    tf-idf floats. Phrases longer than max_len are DISCARDED (the
    practical RAKE cap): it bounds the per-row explode fan-out AND keeps
    a stopword-free run in degenerate corpora from producing
    document-sized phrases.

    Shape: one posexplode fan per token (positions are needed for the
    run split); phrase ids are a per-doc prefix sum of the stopword
    flags — ONE (doc) window; phrase assembly is a per-(doc, phrase)
    sorted collect; word stats and phrase scores are groupBys over the
    Zipf-small phrase-word table. The final top-k window runs over the
    thresholded distinct-phrase table only.

    Returns (phrase, n_words, n_occ, score_x1e6, rnk), rnk 1..k by
    (score desc, n_occ desc, phrase)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    sw = F.array(*[F.lit(s) for s in stopwords])
    pos = (
        df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
        .select("__id", F.posexplode("__t").alias("__p", "__w"))
        .select(
            "__id",
            "__p",
            "__w",
            F.array_contains(sw, F.col("__w")).alias("__stop"),
        )
    )
    w_doc = Window.partitionBy("__id").orderBy("__p")
    runs = pos.select(
        "__id",
        "__p",
        "__w",
        "__stop",
        F.sum(F.when(F.col("__stop"), 1).otherwise(0))
        .over(w_doc)
        .alias("__run"),
    ).filter(~F.col("__stop"))
    phrases = (
        runs.groupBy("__id", "__run")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__p"), F.col("__w")))
                    ),
                    lambda s: s["__w"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).cast("long").alias("__len"),
        )
        .filter(F.col("__len") <= max_len)
        .localCheckpoint(eager=True)
    )
    words = phrases.select(
        "__len", F.explode(F.split(F.col("phrase"), " ")).alias("__w")
    )
    wstats = words.groupBy("__w").agg(
        F.count(F.lit(1)).cast("long").alias("__freq"),
        F.sum("__len").cast("long").alias("__deg"),
    )
    wscore = wstats.select(
        "__w",
        F.expr("__deg * CAST(1000000 AS BIGINT) DIV __freq").alias("__ws"),
    )
    dphrase = phrases.groupBy("phrase").agg(
        F.max("__len").cast("long").alias("n_words"),
        F.count(F.lit(1)).cast("long").alias("n_occ"),
    )
    scored = (
        dphrase.filter(F.col("n_occ") >= min_count)
        .select(
            "phrase",
            "n_words",
            "n_occ",
            F.explode(F.split(F.col("phrase"), " ")).alias("__w"),
        )
        .join(wscore, ["__w"])
        .groupBy("phrase", "n_words", "n_occ")
        .agg(F.sum("__ws").cast("long").alias("score_x1e6"))
    )
    w_pick = Window.partitionBy().orderBy(
        F.col("score_x1e6").desc(), F.col("n_occ").desc(), F.col("phrase")
    )
    return scored.select(
        "*", F.row_number().over(w_pick).cast("long").alias("rnk")
    ).filter(F.col("rnk") <= k)


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty — the share of the document's distinct
    word n-grams whose FIRST corpus occurrence (minimum doc id =
    ingestion order) is this document. The memorization/redundancy
    screen beside the dedup family: exact duplicates of earlier docs
    read 0, template re-serves read low, genuinely new content reads
    high — and a training-curriculum pass orders or prunes on exactly
    this number (Lee et al. 2022 measure the same statistic to motivate
    dedup). Differs from `contamination` (cross-corpus overlap) in being
    self-referential over one corpus with an explicit ingestion order.

    Exact integers: novelty_x1e6 = n_new·1e6 DIV n_shingles.

    Shape: one explode produces (doc, shingle) DISTINCT rows — the
    shared subtree feeding BOTH the min-owner collapse and the per-doc
    rollup, so it is eagerly checkpointed (the tf/df re-execution rule);
    the owner join and both aggregates are keyed on the shingle / doc —
    bounded fan-out, no pairs. Docs with < n tokens emit nothing.

    Returns (doc_id, n_shingles, n_new, novelty_x1e6)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != F.lit(""))
    sh = (
        df.select(F.col(id_col).alias("__id"), toks.alias("__t"))
        .filter(F.size("__t") >= n)
        .select(
            "__id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(__t) - {n - 1}),"
                    f" i -> concat_ws(' ', slice(__t, i, {n})))"
                )
            ).alias("__s"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    owner = sh.groupBy("__s").agg(F.min("__id").alias("__own"))
    return (
        sh.join(owner, ["__s"])
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("__own") == F.col("__id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_new"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_shingles",
            "n_new",
            F.expr(
                "n_new * CAST(1000000 AS BIGINT) DIV n_shingles"
            ).alias("novelty_x1e6"),
        )
    )


def _word_grams(col: str, n: int):
    """Array of word n-grams of a token-array column expression. Guarded:
    Spark's sequence(1, 0) DESCENDS ([1, 0]), so short arrays must short-
    circuit to an empty array instead of relying on greatest()."""
    return F.expr(
        f"CASE WHEN size({col}) < {n} THEN array()"
        f" ELSE transform(sequence(1, size({col}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({col}, i, {n}))) END"
    )


def rouge_n_scores(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    cand_col: str,
    n: int = 2,
) -> DataFrame:
    """ROUGE-N per pair (Lin 2004) with CLIPPED counts — the standard
    summarization/generation overlap eval: overlap = sum over grams of
    min(count_ref, count_cand), precision = overlap/|cand grams|, recall
    = overlap/|ref grams|, and F1 collapses to the single exact rational
    2*overlap/(|ref|+|cand|) (since P = ov/c, R = ov/r). All three are
    staged 1e6 integer quotients — no float.

    Shape: one tokenize+gram explode per side, (id, gram) count collapse,
    one (id, gram)-keyed inner join for the clipped overlap, one id
    rollup — cost is grams, never pairs-of-grams. Pairs whose REF has
    fewer than n tokens emit nothing (undefined recall); an empty CAND
    side scores 0.

    Returns (id, ref_grams, cand_grams, overlap, p_x1e6, r_x1e6,
    f1_x1e6).
    """
    toks_r = F.filter(F.split(F.col(ref_col), " "), lambda t: t != F.lit(""))
    toks_c = F.filter(F.split(F.col(cand_col), " "), lambda t: t != F.lit(""))
    base = df.select(
        F.col(id_col).alias("__id"), toks_r.alias("__tr"), toks_c.alias("__tc")
    ).filter(F.size("__tr") >= n)
    rg = (
        base.select("__id", F.explode(_word_grams("__tr", n)).alias("__g"))
        .groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__cr"))
    )
    cg = (
        base.select("__id", F.explode(_word_grams("__tc", n)).alias("__g"))
        .groupBy("__id", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__cc"))
    )
    ov = (
        rg.join(cg, ["__id", "__g"])
        .groupBy("__id")
        .agg(
            F.sum(F.least("__cr", "__cc")).cast("long").alias("overlap")
        )
    )
    tot = (
        rg.groupBy("__id")
        .agg(F.sum("__cr").cast("long").alias("ref_grams"))
        .join(
            cg.groupBy("__id").agg(
                F.sum("__cc").cast("long").alias("cand_grams")
            ),
            "__id",
            "left",
        )
    )
    return (
        tot.join(ov, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "ref_grams",
            F.coalesce("cand_grams", F.lit(0)).cast("long").alias("cand_grams"),
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
        )
        .withColumn(
            "p_x1e6",
            F.expr(
                "CASE WHEN cand_grams > 0 THEN overlap * 1000000 DIV cand_grams"
                " ELSE CAST(0 AS BIGINT) END"
            ),
        )
        .withColumn(
            "r_x1e6", F.expr("overlap * 1000000 DIV ref_grams")
        )
        .withColumn(
            "f1_x1e6",
            F.expr("2 * overlap * 1000000 DIV (ref_grams + cand_grams)"),
        )
    )


def bleu_log2(
    df: DataFrame,
    id_col: str,
    ref_col: str,
    cand_col: str,
    max_n: int = 4,
) -> DataFrame:
    """BLEU per pair (Papineni et al. 2002) in exact 16*log2 units: the
    geometric mean of clipped 1..max_n-gram precisions becomes an
    ARITHMETIC mean of msb16 log-precisions, and the brevity penalty
    exp(1 - r/c) contributes bp_x16 = -((r - c) * 23 DIV c) when the
    candidate is short (23 ~ 16*log2(e), the documented quantization) —
    no float, no underflow, and a zero n-gram precision floors at the
    msb16 device's -320 instead of collapsing the whole score to
    log(0). Compare scores, don't exponentiate: ranking and deltas are
    what an eval pipeline consumes.

    Shape: ONE explode fans each pair into (n, gram) rows for all n
    (the minhash-band fan-out rule — never one pass per n), per-side
    (id, n, gram) collapses, one keyed join, per-(id, n) clipped
    precision, id rollup. Pairs with ref shorter than max_n tokens emit
    nothing.

    Returns (id, ref_len, cand_len, bleu_log2_x16).
    """
    toks_r = F.filter(F.split(F.col(ref_col), " "), lambda t: t != F.lit(""))
    toks_c = F.filter(F.split(F.col(cand_col), " "), lambda t: t != F.lit(""))
    base = (
        df.select(
            F.col(id_col).alias("__id"),
            toks_r.alias("__tr"),
            toks_c.alias("__tc"),
        )
        .filter(F.size("__tr") >= max_n)
        .localCheckpoint(eager=True)
    )
    ns = list(range(1, max_n + 1))

    def _fan(col: str):
        arrs = F.array(
            *[
                F.expr(
                    f"transform({_gram_sql(col, n)}, g -> struct({n} AS n,"
                    " g AS g))"
                )
                for n in ns
            ]
        )
        return F.explode(F.flatten(arrs))

    def _gram_sql(col: str, n: int) -> str:
        return (
            f"CASE WHEN size({col}) < {n} THEN array()"
            f" ELSE transform(sequence(1, size({col}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({col}, i, {n}))) END"
        )

    rg = (
        base.select("__id", _fan("__tr").alias("__s"))
        .select("__id", F.col("__s.n").alias("__n"), F.col("__s.g").alias("__g"))
        .groupBy("__id", "__n", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__cr"))
    )
    cg = (
        base.select("__id", _fan("__tc").alias("__s"))
        .select("__id", F.col("__s.n").alias("__n"), F.col("__s.g").alias("__g"))
        .groupBy("__id", "__n", "__g")
        .agg(F.count(F.lit(1)).cast("long").alias("__cc"))
    )
    per_n = (
        cg.join(rg, ["__id", "__n", "__g"], "left")
        .groupBy("__id", "__n")
        .agg(
            F.sum(F.least(F.coalesce("__cr", F.lit(0)), F.col("__cc")))
            .cast("long")
            .alias("__clip"),
            F.sum("__cc").cast("long").alias("__tot"),
        )
    )
    from .sampling import _msb16_sql

    logp = F.expr(
        "CAST("
        + _msb16_sql("__clip * 1048576 DIV greatest(__tot, CAST(1 AS BIGINT))")
        + " - 320 AS BIGINT)"
    )
    lens = base.select(
        "__id",
        F.size("__tr").cast("long").alias("ref_len"),
        F.size("__tc").cast("long").alias("cand_len"),
    )
    agg = (
        per_n.withColumn("__lp", logp)
        .groupBy("__id")
        .agg(F.sum("__lp").cast("long").alias("__lpsum"),
             F.count(F.lit(1)).cast("long").alias("__nn"))
    )
    return (
        lens.join(agg, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "ref_len",
            "cand_len",
            F.expr(
                f"CAST(coalesce(__lpsum, {-320 * max_n})"
                f" DIV coalesce(__nn, {max_n})"
                " + CASE WHEN cand_len >= ref_len OR cand_len = 0 THEN 0"
                " ELSE -((ref_len - cand_len) * 23 DIV cand_len) END"
                " AS BIGINT)"
            ).alias("bleu_log2_x16"),
        )
    )


#: query-param prefixes dropped by URL normalization (tracking noise)
TRACKING_PARAM_PREFIXES = ("utm_", "fbclid", "gclid", "ref")


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """RFC-3986-lite URL canonicalization — the first pass of any crawl
    curation pipeline, where the SAME page hides behind case, default
    ports, fragments, tracking params, param order and trailing slashes,
    and exact dedup under-counts until they collapse. Steps (documented
    contract, applied in order):

      1. lowercase scheme and host;
      2. strip the fragment;
      3. strip default ports (:80 for http, :443 for https);
      4. drop tracking query params (prefixes in
         TRACKING_PARAM_PREFIXES), SORT the rest, rejoin;
      5. strip one trailing slash from a non-root path; empty path
         becomes '/'.

    Engine-neutral by construction: split / lower / substring / sorted
    array rejoin only — no regex classes, no URL library (DuckDB has
    none; the oracle replays the identical steps). Rows without '://'
    pass through unchanged with is_url = false. Map-only (zero
    exchanges); whole-stage codegen keeps it scan-speed.

    Adds (url_norm, is_url, scheme, host, domain, path_depth, n_params)
    — `domain` is the last-two-labels heuristic (a public-suffix list is
    the production upgrade, same column contract).
    """
    has = F.expr(f"instr({url_col}, '://') > 0")
    scheme = F.expr(f"lower(element_at(split({url_col}, '://'), 1))")
    rest = F.expr(f"try_element_at(split({url_col}, '://'), 2)")
    return (
        df.withColumn("is_url", has)
        .withColumn("__scheme", F.when(has, scheme))
        .withColumn("__rest0", rest)
        .withColumn("__defrag", F.when(has, F.expr("element_at(split(__rest0, '#'), 1)")))
        .withColumn("__hostport", F.expr("lower(element_at(split(__defrag, '/'), 1))"))
        .withColumn(
            "__host",
            F.expr(
                "CASE WHEN __scheme = 'http' AND substring(__hostport,"
                " length(__hostport) - 2, 3) = ':80'"
                " THEN substring(__hostport, 1, length(__hostport) - 3)"
                " WHEN __scheme = 'https' AND substring(__hostport,"
                " length(__hostport) - 3, 4) = ':443'"
                " THEN substring(__hostport, 1, length(__hostport) - 4)"
                " ELSE __hostport END"
            ),
        )
        .withColumn(
            "__pathq",
            F.expr(
                "substring(__defrag, length(element_at(split(__defrag, '/'), 1))"
                " + 1)"
            ),
        )
        .withColumn("__path0", F.expr("element_at(split(__pathq, '[?]'), 1)"))
        .withColumn(
            "__path",
            F.expr(
                "CASE WHEN __path0 = '' OR __path0 IS NULL THEN '/'"
                " WHEN length(__path0) > 1 AND substring(__path0,"
                " length(__path0), 1) = '/'"
                " THEN substring(__path0, 1, length(__path0) - 1)"
                " ELSE __path0 END"
            ),
        )
        .withColumn(
            "__params",
            F.expr(
                "array_sort(filter(split(coalesce(try_element_at(split(__pathq,"
                " '[?]'), 2), ''), '&'), p -> p != '' AND NOT ("
                + " OR ".join(
                    f"substring(p, 1, {len(pre)}) = '{pre}'"
                    for pre in TRACKING_PARAM_PREFIXES
                )
                + ")))"
            ),
        )
        .withColumn(
            "url_norm",
            F.when(
                has,
                F.expr(
                    "concat(__scheme, '://', __host, __path,"
                    " CASE WHEN size(__params) > 0"
                    " THEN concat('?', array_join(__params, '&'))"
                    " ELSE '' END)"
                ),
            ).otherwise(F.col(url_col)),
        )
        .withColumn("scheme", F.col("__scheme"))
        .withColumn("host", F.col("__host"))
        .withColumn(
            "domain",
            F.expr(
                "CASE WHEN host IS NULL THEN NULL ELSE array_join(slice("
                "split(host, '[.]'), greatest(size(split(host, '[.]')) - 1, 1),"
                " 2), '.') END"
            ),
        )
        .withColumn(
            "path_depth",
            F.expr(
                "CASE WHEN __path = '/' THEN CAST(0 AS BIGINT)"
                " ELSE CAST(size(split(__path, '/')) - 1 AS BIGINT) END"
            ),
        )
        .withColumn("n_params", F.expr("CAST(size(__params) AS BIGINT)"))
        .drop(
            "__scheme", "__rest0", "__defrag", "__hostport", "__host",
            "__pathq", "__path0", "__path", "__params",
        )
    )


def good_turing(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Good-Turing frequency re-estimation over the corpus vocabulary
    (Good 1953; the Gale-Sampson workhorse): the count-of-counts table
    N_r with the adjusted count r* = (r+1) * N_{r+1} / N_r and the
    headline unseen-mass estimate P(unseen) = N_1 / N — what a
    vocabulary-coverage pipeline quotes before claiming a tokenizer or
    gazetteer 'covers' a corpus, and the smoothing behind every
    add-discount LM. r* is emitted as the exact staged 1e6 quotient
    (empty next class -> NULL r*, the standard smoothing-cutoff
    signal); the unseen mass rides every row as unseen_x1e6 for the
    one-pass readout.

    Shape: one tokenize explode -> vocabulary collapse (Zipf-small) ->
    count-of-counts collapse (tiny) + one scalar total — nothing past
    the first shuffle is data-sized. Returns (r, n_r, r_star_x1e6,
    unseen_x1e6) ordered by frequency class.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "),
        lambda t: t != F.lit(""),
    )
    vocab = (
        df.select(F.explode(toks).alias("__t"))
        .groupBy("__t")
        .agg(F.count(F.lit(1)).cast("long").alias("r"))
    )
    coc = vocab.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("n_r"))
    tot = vocab.agg(F.sum("r").cast("long").alias("n_tokens"))
    n1 = coc.filter(F.col("r") == 1).agg(
        F.coalesce(F.sum("n_r"), F.lit(0)).cast("long").alias("n_1")
    )
    from pyspark.sql.window import Window

    w = Window.orderBy("r")
    nxt = coc.withColumn(
        "__next_nr",
        F.when(F.lead("r").over(w) == F.col("r") + 1, F.lead("n_r").over(w)),
    )
    return (
        nxt.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n1))
        .select(
            "r",
            "n_r",
            F.expr(
                "CASE WHEN __next_nr IS NOT NULL THEN"
                " (r + 1) * __next_nr * CAST(1000000 AS BIGINT) DIV n_r"
                " ELSE NULL END"
            ).alias("r_star_x1e6"),
            F.expr(
                "n_1 * CAST(1000000 AS BIGINT) DIV n_tokens"
            ).alias("unseen_x1e6"),
        )
    )


def heaps_profile(
    docs: DataFrame,
    n_checkpoints: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Heaps'-law vocabulary-growth profile: V(N) ≈ K·N^β sampled at
    deterministic ingestion checkpoints, with the growth exponent β
    estimated per segment as an exact integer ratio of msb16 log2 deltas
    — the companion diagnostic to zipf_slope/vocab_richness (vocabulary
    still growing ⇒ more data still adds new tokens; β collapsing to 0 ⇒
    the corpus is saturating/duplicated).

    Checkpoints are doc-id thresholds c_i = max_id·i DIV n (id order =
    ingestion order, the convention ngram_novelty pins); V(c) = tokens
    whose FIRST document is <= c, N(c) = token occurrences in docs <= c.
    No global sort or window anywhere: one pass collapses the corpus to
    (token, first_doc, per-doc counts); checkpoints are an n-row
    broadcast; β_x1e6 = Δmsb16(V)·1e6 DIV Δmsb16(N) between consecutive
    checkpoints (NULL on the first row and wherever ΔN's quantized log
    is 0).

    Emits one row per checkpoint: (cp, n_docs, n_tokens, vocab,
    beta_x1e6).
    """
    from .dedup import normalize_text

    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    ).localCheckpoint(eager=True)
    first_doc = toks.groupBy("tok").agg(F.min("id").alias("fd"))
    per_doc = toks.groupBy("id").agg(F.count(F.lit(1)).alias("ntok"))
    mx = docs.agg(F.max(F.col(id_col)).alias("mx"))
    cps = (
        mx.select(
            F.explode(F.sequence(F.lit(1), F.lit(n_checkpoints))).alias("i"),
            "mx",
        )
        .select(F.expr(f"mx * i DIV {n_checkpoints}").alias("cp"))
        .distinct()
    )
    vocab = (
        first_doc.crossJoin(F.broadcast(cps))
        .filter(F.col("fd") <= F.col("cp"))
        .groupBy("cp")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    sizes = (
        per_doc.crossJoin(F.broadcast(cps))
        .filter(F.col("id") <= F.col("cp"))
        .groupBy("cp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )
    from .sampling import _msb16_sql

    prof = sizes.join(vocab, "cp", "left").select(
        "cp",
        "n_docs",
        "n_tokens",
        F.coalesce("vocab", F.lit(0)).cast("long").alias("vocab"),
    )
    w = Window.orderBy("cp")
    lv = F.lag(F.col("vocab")).over(w)
    ln = F.lag(F.col("n_tokens")).over(w)
    return (
        prof.withColumn("pv", lv)
        .withColumn("pn", ln)
        .withColumn(
            "beta_x1e6",
            F.when(
                F.col("pv").isNotNull(),
                F.expr(
                    f"CAST(({_msb16_sql('vocab')} - {_msb16_sql('pv')}) * 1000000 "
                    f"DIV nullif({_msb16_sql('n_tokens')} - {_msb16_sql('pn')}, 0) AS BIGINT)"
                ),
            ),
        )
        .select("cp", "n_docs", "n_tokens", "vocab", "beta_x1e6")
    )


def readability_scores(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document with a deterministic integer
    contract: syllables are estimated as vowel-group runs ([aeiouy]+ on
    the lowercased text — the standard cheap proxy), sentences as
    [.!?]+ runs (min 1), words as whitespace tokens (min 1), and the
    score is emitted ×1e3 with truncating integer quotients:
    flesch_x1e3 = 206835 − 1015·W DIV S − 84600·Syl DIV W. Both engines
    replay the identical regexp counts and DIVs — no floats. Map-only
    (whole-stage codegen); the quality-gate sibling of quality_score.

    Emits (doc_id, n_words, n_sentences, n_syllables, flesch_x1e3).
    """
    words = F.greatest(
        F.size(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            )
        ).cast("long"),
        F.lit(1).cast("long"),
    )
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[.!?]+"), 0))
        .cast("long"),
        F.lit(1).cast("long"),
    )
    syllables = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"[aeiouy]+"), 0)
    ).cast("long")
    return (
        docs.select(
            id_col,
            words.alias("n_words"),
            sentences.alias("n_sentences"),
            syllables.alias("n_syllables"),
        )
        .withColumn(
            "flesch_x1e3",
            F.expr(
                "206835 - 1015 * n_words DIV n_sentences"
                " - 84600 * n_syllables DIV n_words"
            ).cast("long"),
        )
    )


def chao1_richness(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Chao1 species-richness estimate of the vocabulary (Chao 1984):
    how many types the corpus would show with infinite sampling —
    observed distinct D plus N₁²/(2N₂) from the singleton/doubleton
    counts (bias-corrected N₁(N₁−1)/(2(N₂+1)) when no doubletons). The
    how-much-vocabulary-is-still-unseen companion to good_turing's
    unseen MASS and heaps_profile's growth CURVE, all off the same
    Zipf-small vocab table. Exact staged 1e6 quotients; one explode +
    vocab collapse + count-of-counts, nothing data-sized after the
    first shuffle.

    Emits one row: (d_obs, n1, n2, chao1_x1e6) with chao1 scaled 1e6
    (so chao1_x1e6 DIV 1e6 >= d_obs always).
    """
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    return vocab.agg(
        F.count(F.lit(1)).alias("d_obs"),
        F.sum(F.when(F.col("r") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("r") == 2, 1).otherwise(0)).alias("n2"),
    ).select(
        F.col("d_obs").cast("long").alias("d_obs"),
        F.col("n1").cast("long").alias("n1"),
        F.col("n2").cast("long").alias("n2"),
        F.expr(
            "CASE WHEN n2 > 0 THEN d_obs * 1000000 + n1 * n1 * 1000000"
            " DIV (2 * n2)"
            " ELSE d_obs * 1000000 + n1 * (n1 - 1) * 1000000"
            " DIV (2 * (n2 + 1)) END"
        ).cast("long").alias("chao1_x1e6"),
    )


def source_similarity(
    docs: DataFrame, source_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Weighted-Jaccard similarity between SOURCES' term-count vectors:
    Σ min(c_a, c_b) / Σ max(c_a, c_b) — the which-corpora-overlap matrix
    a data-mixing decision reads (plain set Jaccard ignores how OFTEN
    terms appear; weighted Jaccard is the multiset version). The max sum
    never materializes: Σmax = total_a + total_b − Σmin, so one inner
    self-join on term over the (source, term) count table (Σmin only
    needs COMMON terms — absent terms contribute min 0) plus broadcast
    totals covers it. Pairs are source-level (dimension-sized); the only
    corpus-scale work is the one (source, term) collapse.

    Emits per ordered pair (src_a < src_b): (src_a, src_b, n_common,
    wj_x1e6).
    """
    toks = docs.select(
        F.col(source_col).alias("src"),
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda t: t != F.lit(""),
            )
        ).alias("tok"),
    )
    cnt = toks.groupBy("src", "tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    inter = (
        cnt.alias("a")
        .join(cnt.alias("b"), "tok")
        .filter(F.col("a.src") < F.col("b.src"))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.least(F.col("a.c"), F.col("b.c"))).alias("smin"),
        )
    )
    return (
        inter.join(
            F.broadcast(tot.select(F.col("src").alias("src_a"),
                                   F.col("t").alias("ta"))), "src_a"
        )
        .join(
            F.broadcast(tot.select(F.col("src").alias("src_b"),
                                   F.col("t").alias("tb"))), "src_b"
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.expr("smin * 1000000 DIV greatest(ta + tb - smin, 1)")
            .cast("long")
            .alias("wj_x1e6"),
        )
    )


def simpson_diversity(
    df: DataFrame, key_col: str, cat_col: str
) -> DataFrame:
    """Simpson diversity per key as an EXACT rational: λ = Σ n_i(n_i−1)
    / (n(n−1)) is the probability two draws without replacement share a
    category; 1−λ is the Simpson diversity index and 1/λ the effective
    category count — the concentration card beside entropy-based
    vocab_richness (no logs, no quantization at all here). Emitted:
    lambda_x1e6 (exact DIV), diversity_x1e6 = 1e6 − λ, and
    eff_cats_x1e3 = n(n−1)·1e3 DIV Σn_i(n_i−1) (NULL when every
    category is a singleton). 128-bit squares past ~3e9 rows/key.

    One (key, cat) collapse + key rollup. Emits (key, n, n_cats,
    lambda_x1e6, diversity_x1e6, eff_cats_x1e3).
    """
    per = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(cat_col).cast("string").alias("cat"),
        )
        .groupBy("key", "cat")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per.groupBy("key").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_cats"),
        F.expr(
            "CAST(sum(CAST(c AS DECIMAL(38,0)) * (c - 1)) AS DECIMAL(38,0))"
        ).alias("rep"),
    )
    return agg.select(
        "key",
        F.col("n").cast("long").alias("n"),
        F.col("n_cats").cast("long").alias("n_cats"),
        F.expr(
            "CASE WHEN n < 2 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST(rep * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) END"
        ).alias("lambda_x1e6"),
        F.expr(
            "CASE WHEN n < 2 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST(1000000 - rep * 1000000"
            " DIV (CAST(n AS DECIMAL(38,0)) * (n - 1)) AS BIGINT) END"
        ).alias("diversity_x1e6"),
        F.expr(
            "CASE WHEN n < 2 OR rep = 0 THEN CAST(NULL AS BIGINT) ELSE"
            " CAST(CAST(n AS DECIMAL(38,0)) * (n - 1) * 1000"
            " DIV rep AS BIGINT) END"
        ).alias("eff_cats_x1e3"),
    )
