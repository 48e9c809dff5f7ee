"""Inverted index + positional phrase search.

The retrieval leg of a training-data pipeline: corpus-scale term lookup
(which documents contain X, where) without re-scanning raw text per query.

Index layout is one row per (term, doc) with the in-document position list
— NOT one giant postings array per term: a stopword's term-level posting
row would hold millions of entries (the same skew trap as the 1-gram LSH
degeneracy, BENCH/BASELINE.md "scale trap"), while per-(term, doc) rows are
bounded by document length. Production layout: write the index bucketed by
`term` (io/catalog.py `write_bucketed`) so per-term lookups are
partition-pruned and the phrase join is co-located on doc_id after one
bucket read per phrase term.

Phrase search joins adjacent terms' postings per doc and intersects
position lists shifted by one — k-1 equi-joins for a k-term phrase, no
Python, no regex over raw text. Positions are raw offsets into the
`[^a-z]+` split array; consecutive words always occupy consecutive slots
(delimiter runs collapse), so adjacency is split-representation-invariant
and the emitted match COUNT is identical under 0- or 1-based indexing —
the DuckDB oracle uses the same token algebra.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, positions array<int> sorted, tf)."""
    toks = docs.select(
        id_col,
        F.posexplode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", id_col).agg(
        F.array_sort(F.collect_list("pos")).alias("positions"),
        F.count("*").alias("tf"),
    )


def phrase_search(
    index: DataFrame, phrase: str, id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing `phrase` as a consecutive token sequence ->
    (doc_id, n_matches). Raises on an empty phrase."""
    terms = [t for t in re.split(r"[^a-z]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase must contain at least one alphabetic token")
    cur = index.filter(F.col("term") == terms[0]).select(
        id_col, F.col("positions").alias("p")
    )
    for t in terms[1:]:
        nxt = index.filter(F.col("term") == t).select(
            id_col, F.col("positions").alias("np")
        )
        cur = (
            cur.join(nxt, id_col)
            .select(
                id_col,
                F.array_intersect(
                    F.transform("p", lambda x: x + 1), F.col("np")
                ).alias("p"),
            )
            .filter(F.size("p") > 0)
        )
    return cur.select(id_col, F.size("p").cast("long").alias("n_matches"))


def bm25_search(
    index: DataFrame,
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25-ranked top-k documents for a bag-of-words query ->
    (doc_id, rank, score_x1e6).

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avglen)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1)  (the Lucene-style floor —
    never negative). Document length = token count from the same `[^a-z]+`
    tokenization as the index.

    Shape: the query's ≤|q| index rows are filtered by an isin() pushdown,
    the per-term df aggregate is vocabulary-sized and broadcast, document
    lengths come from one tf-sum over the index (no raw-text re-scan), and
    the final top-k is a rank window over only the docs containing ≥1 query
    term. Deterministic (score desc, doc_id asc) tie-break; 1e6-scaled
    scores for cross-engine hashing.
    """
    terms = sorted({t for t in re.split(r"[^a-z]+", query.lower()) if t})
    if not terms:
        raise ValueError("query must contain at least one alphabetic token")
    n_docs = docs.select(id_col).distinct().count()

    doc_len = index.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # snapped to the 1e-6 grid so the oracle's avg (different summation
    # order, same integers) lands on the identical double
    import math

    raw_avg = doc_len.agg(F.avg("dl")).first()[0]
    if raw_avg is None:
        raise ValueError("bm25_search requires a non-empty index")
    avg_len = math.floor(raw_avg * 1000000 + 0.5) / 1000000

    dfreq = (
        index.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    hits = (
        index.filter(F.col("term").isin(terms))
        .join(F.broadcast(dfreq), "term")
        .join(doc_len, id_col)
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avg_len)))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = hits.groupBy(id_col).agg(F.sum(contrib).alias("score"))

    from pyspark.sql.window import Window

    # orderBy+limit compiles to TakeOrderedAndProject (per-partition heap +
    # driver merge); the rank window then runs over only the k winners — no
    # single-partition global window over the full match set
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return (
        topk.withColumn("rank", F.row_number().over(w))
        .select(
            id_col,
            "rank",
            F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long").alias("score_x1e6"),
        )
    )


def rrf_fuse(
    rankings: list,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009) of N ranked
    lists -> (id_col, rrf_x1e6, rank).

    The hybrid-search combiner: BM25 sees exact lexical matches, ANN sees
    semantic neighbors; RRF merges them with no score calibration at all —
    each list contributes floor(1e6 / (k_const + rank)) for an item,
    missing items contribute 0. The floor-per-list-then-integer-sum
    contract makes the fused score a BIGINT, deterministic under any
    execution or summation order (same discipline as the PQ ADC scores).

    Shape: rankings are already top-k-sized (tiny); a unionByName and one
    groupBy-sum, then an orderBy-limit. The expensive work happened inside
    the rankers — fusion is O(N·k) rows regardless of corpus size.
    """
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    contribs = [
        r.select(
            F.col(id_col),
            F.floor(F.lit(1000000.0) / (F.lit(k_const) + F.col(rank_col)))
            .cast("long")
            .alias("__c"),
        )
        for r in rankings
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    fused = allc.groupBy(id_col).agg(F.sum("__c").alias("rrf_x1e6"))
    from pyspark.sql.window import Window

    topk = fused.orderBy(F.desc("rrf_x1e6"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("rrf_x1e6"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        id_col, "rrf_x1e6", "rank"
    )


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """IR effectiveness report per query — reciprocal rank, precision@k,
    recall@k of a ranking against a relevance set, the tuning loop for the
    retrieval family the way ann_recall_report is for ANN. `ranked` is any
    (query_id, doc_id, rank) table (bm25_search / rrf_fuse output tagged
    with a query id); `relevant` is (query_id, doc_id) ground truth or
    pseudo-relevance labels (e.g. phrase_search hits).

    All-integer outputs (no float discipline needed): rr_x1e6 =
    1e6 DIV first-hit rank (MRR@k convention: 0 when no relevant doc is
    ranked in the top k), p_at_k_x1e6 = hits*1e6 DIV k, recall_at_k_x1e6 =
    hits*1e6 DIV n_rel (0 when the relevance set is empty).

    Shape: rankings are top-k-sized per query, so the relevance join is
    keyed by (query_id, doc_id) and carries O(queries * k) rows; n_rel is
    one count per query. Nothing here touches the corpus — the expensive
    work happened inside the rankers. One output row per query present in
    `ranked`.
    """
    r = ranked.filter(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query_id"),
        F.col(id_col).alias("doc_id"),
        F.col(rank_col).alias("rank"),
    )
    rel = relevant.select(
        F.col(query_col).alias("query_id"), F.col(id_col).alias("doc_id")
    ).dropDuplicates()
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hits = r.join(rel, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits"), F.min("rank").alias("_first")
    )
    base = r.select("query_id").dropDuplicates()
    return (
        base.join(n_rel, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.coalesce(
                F.expr("CAST(1000000 AS BIGINT) DIV _first"), F.lit(0)
            ).cast("long").alias("rr_x1e6"),
            F.expr(f"CAST(coalesce(n_hits, 0) * 1000000 AS BIGINT) DIV {int(k)}")
            .alias("p_at_k_x1e6"),
            F.coalesce(
                F.expr("CAST(coalesce(n_hits, 0) * 1000000 AS BIGINT) DIV n_rel"),
                F.lit(0),
            ).cast("long").alias("recall_at_k_x1e6"),
        )
    )


def bm25_search_many(
    index: DataFrame,
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    max_df: int | None = None,
) -> DataFrame:
    """Batched BM25: rank the corpus for EVERY query in a (query_id, qtext)
    table at once -> (query_id, doc_id, rank, score_x1e6). The production
    dataflow — a retrieval service scores thousands of queries per batch,
    and per-query isin() scans (bm25_search) would rescan the index per
    query; here ALL queries join the index in one term-keyed pass.

    Shape: queries explode to distinct (query_id, term); the distinct term
    set (queries x |q| rows — small even for 10k-query batches) broadcasts
    into the df aggregate and the postings join, so the index shuffles
    ONCE on term. Term-keyed skew is the real hazard: a stopword term
    matches every document — `max_df` drops terms with document frequency
    above the cap BEFORE the postings join (the same df-cap lever as
    contamination and comention; stopword idf is near zero anyway, so the
    ranking impact is bounded and a production deployment sets it).
    Per-query top-k runs through the salted two-phase top-n
    (sampling.top_n_per_group), never a single global window. Same
    Lucene-style idf, 1e-6-grid avglen, and integer 1e6-scaled scores as
    bm25_search; n_docs and avglen are the two driver-side scalars.
    """
    import math

    from pyspark.sql.window import Window

    from .sampling import top_n_per_group

    tokens = F.array_distinct(
        F.filter(
            F.split(F.lower(F.col(query_text_col)), r"[^a-z]+"),
            lambda t: t != F.lit(""),
        )
    )
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"), F.explode(tokens).alias("term")
    ).dropDuplicates()

    n_docs = docs.select(id_col).distinct().count()
    doc_len = index.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    raw_avg = doc_len.agg(F.avg("dl")).first()[0]
    if raw_avg is None:
        raise ValueError("bm25_search_many requires a non-empty index")
    avg_len = math.floor(raw_avg * 1000000 + 0.5) / 1000000

    dfreq = (
        index.join(F.broadcast(qterms.select("term").dropDuplicates()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df") <= int(max_df))
    hits = (
        index.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .join(doc_len, id_col)
    )
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avg_len)))
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    scored = (
        hits.groupBy("query_id", id_col)
        .agg(F.sum(contrib).alias("score"))
    )
    topk = top_n_per_group(
        scored,
        group_cols=["query_id"],
        order_cols=[F.desc("score"), F.asc(id_col)],
        n=k,
        salt_key=id_col,
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "query_id",
        id_col,
        "rank",
        F.floor(F.col("score") * 1000000 + F.lit(0.5)).cast("long").alias("score_x1e6"),
    )


def merge_inverted_index(
    stored: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Upsert a document batch into a STORED inverted index — the
    retrieval member of the incremental-maintenance family (beside
    incremental_components, pagerank warm-start, incremental_lsh_pairs):
    daily appends re-index only the batch, never the corpus.

    Semantics: postings of re-ingested doc_ids are dropped (one broadcast
    anti-join on the batch's ids — the MERGE INTO delete leg), then the
    batch's freshly built postings are appended. The result is
    row-identical to ``build_inverted_index`` over the post-merge corpus,
    which is exactly what the oracle checks — so downstream BM25/phrase
    scoring over the merged index equals a full rebuild bit-for-bit
    (df/doc-length/N statistics all derive from the index itself).

    Scale shape: cost is O(batch postings) + one anti-join against the
    stored index; with the index stored bucketed by term (io/catalog.py
    bucketing), the append preserves bucketing and the anti-join is the
    only stored-side scan. No counterpart in the reference (its
    src/expansion.py re-reads the full HDT per run).
    """
    ids = new_docs.select(F.col(id_col)).distinct()
    fresh = build_inverted_index(new_docs, id_col=id_col, text_col=text_col)
    kept = stored.join(F.broadcast(ids), id_col, "left_anti")
    return kept.select(fresh.columns).unionByName(fresh)


def ndcg_at_k(
    ranked: DataFrame,
    grades: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """NDCG@k with exact-integer quantized discounts: DCG = Σ grade ·
    2^24 DIV msb16(rank+1), where msb16 is the 16-steps-per-octave integer
    log2 (operators/sampling._msb16_sql — so the discount for rank 1 is
    exactly 2^20, and every discount is the SAME integer in Spark and
    DuckDB; no float log, no cross-engine drift). IDCG uses the top-k
    grades corpus-wide under the identical discount, so ndcg_x1e6 =
    dcg·1e6 DIV idcg is an exact integer quotient.

    Inputs: `ranked` (id_col, rank 1..k) — a retrieval run; `grades`
    (id_col, grade >= 1 int) — graded relevance judgments (docs absent
    from `grades` count as grade 0). Both sides are top-k/judged-size
    tables, so every join here is broadcast-small; the only corpus-scale
    work is whatever produced them. Emits ONE row: (k, dcg_x, idcg_x,
    ndcg_x1e6).
    """
    from pyspark.sql.window import Window

    from .sampling import _msb16_sql

    g = F.coalesce(F.col("grade"), F.lit(0)).cast("long")
    dcg = (
        ranked.filter(F.col("rank") <= k)
        .join(F.broadcast(grades), id_col, "left")
        .select(
            F.expr(
                f"CAST({_msb16_sql('rank + 1')} AS BIGINT)"
            ).alias("disc"),
            g.alias("g"),
        )
        .agg(F.sum(F.expr("g * 16777216 DIV disc")).alias("dcg_x"))
    )
    w = Window.orderBy(F.desc("grade"), F.asc(id_col))
    ideal = (
        grades.orderBy(F.desc("grade"), F.asc(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.expr(f"CAST({_msb16_sql('rank + 1')} AS BIGINT)").alias("disc"),
            F.col("grade").cast("long").alias("g"),
        )
        .agg(F.sum(F.expr("g * 16777216 DIV disc")).alias("idcg_x"))
    )
    return (
        dcg.crossJoin(ideal)
        .select(
            F.lit(k).cast("long").alias("k"),
            F.coalesce("dcg_x", F.lit(0)).cast("long").alias("dcg_x"),
            F.coalesce("idcg_x", F.lit(0)).cast("long").alias("idcg_x"),
            F.expr(
                "coalesce(dcg_x, 0) * 1000000 DIV greatest(coalesce(idcg_x, 0), 1)"
            ).cast("long").alias("ndcg_x1e6"),
        )
    )


def average_precision(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Average Precision @k per query plus the `__map__` summary row —
    the rank-weighted completion of retrieval_eval (MRR sees the first
    hit, P@k the count, AP how EARLY every hit lands; MAP is the
    leaderboard standard). Exact pinned-quantized contract: AP_x1e6 =
    Σ_{hits at rank r} (prefix_hits·1e6 DIV r) DIV min(n_rel, k), the
    standard AP@k denominator; queries with no relevant docs emit 0.
    MAP = Σ AP DIV n_queries (pinned).

    Same O(queries·k) shape as retrieval_eval — one (query, doc) hit
    join, one query-ordered prefix window, one rollup. Emits
    (query_id, n_rel, ap_x1e6) per query plus ('__map__', total_rel,
    map value).
    """
    from pyspark.sql.window import Window

    hits = (
        ranked.filter(F.col(rank_col) <= k)
        .join(
            relevant.select(
                F.col(query_col).alias("q"), F.col(id_col).alias("d"),
                F.lit(1).alias("rel"),
            ),
            (F.col(query_col) == F.col("q")) & (F.col(id_col) == F.col("d")),
            "left",
        )
        .select(
            query_col,
            rank_col,
            F.coalesce("rel", F.lit(0)).alias("rel"),
        )
    )
    nrel = relevant.groupBy(F.col(query_col).alias("qq")).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    w = Window.partitionBy(query_col).orderBy(rank_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    terms = hits.withColumn("cum", F.sum("rel").over(w)).withColumn(
        "term",
        F.expr(f"CASE WHEN rel = 1 THEN cum * 1000000 DIV {rank_col}"
               " ELSE 0 END"),
    )
    per = (
        terms.groupBy(query_col)
        .agg(F.sum("term").alias("tsum"))
        .join(nrel, F.col(query_col) == F.col("qq"), "left")
        .select(
            F.col(query_col).alias("query_id"),
            F.coalesce("n_rel", F.lit(0)).cast("long").alias("n_rel"),
            F.expr(
                f"CASE WHEN coalesce(n_rel, 0) = 0 THEN CAST(0 AS BIGINT)"
                f" ELSE tsum DIV least(n_rel, {k}) END"
            ).cast("long").alias("ap_x1e6"),
        )
        .localCheckpoint(eager=True)
    )
    overall = per.agg(
        F.lit("__map__").alias("query_id"),
        F.sum("n_rel").cast("long").alias("n_rel"),
        F.expr("sum(ap_x1e6) DIV count(1)").cast("long").alias("ap_x1e6"),
    )
    return per.unionByName(overall)


def rank_biased_precision(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-Biased Precision at persistence p = 1/2 (Moffat & Zobel
    2008) — the user-model retrieval metric (the reader flips a coin to
    continue down the list; RBP = expected fraction of viewed docs that
    are relevant). p = 1/2 makes the geometric weights EXACT BIT
    SHIFTS: rbp_x1e6 = Σ rel_r · (1e6 DIV 2^r) — a pinned integer
    contract with no quantized log anywhere (the contribution of rank r
    is exactly (1−p)·p^(r−1)·1e6 = 1e6/2^r). Also emits the residual
    (1e6 DIV 2^k) — RBP's uncertainty from the unseen tail, part of the
    metric's definition.

    Same O(queries·k) shape as average_precision. Emits per query plus
    `__mean__`: (query_id, n_hits, rbp_x1e6, residual_x1e6).
    """
    hits = (
        ranked.filter(F.col(rank_col) <= k)
        .join(
            relevant.select(
                F.col(query_col).alias("q"), F.col(id_col).alias("d"),
                F.lit(1).alias("rel"),
            ),
            (F.col(query_col) == F.col("q")) & (F.col(id_col) == F.col("d")),
            "left",
        )
        .select(
            query_col, rank_col, F.coalesce("rel", F.lit(0)).alias("rel")
        )
    )
    per = hits.groupBy(query_col).agg(
        F.sum("rel").cast("long").alias("n_hits"),
        F.sum(
            F.expr(f"rel * (1000000 DIV shiftleft(CAST(1 AS BIGINT), {rank_col}))")
        ).cast("long").alias("rbp_x1e6"),
    ).select(
        F.col(query_col).alias("query_id"),
        "n_hits",
        "rbp_x1e6",
        F.lit(1000000 >> k if k < 20 else 0).cast("long").alias("residual_x1e6"),
    ).localCheckpoint(eager=True)
    overall = per.agg(
        F.lit("__mean__").alias("query_id"),
        F.sum("n_hits").cast("long").alias("n_hits"),
        F.expr("sum(rbp_x1e6) DIV count(1)").cast("long").alias("rbp_x1e6"),
        F.max("residual_x1e6").cast("long").alias("residual_x1e6"),
    )
    return per.unionByName(overall)
