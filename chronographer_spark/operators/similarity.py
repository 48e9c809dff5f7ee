"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k of query vectors vs the corpus.
  Queries are broadcast (small side); the corpus is never shuffled; top-k
  per query via window over the (tiny) query partition count, or global
  TakeOrdered for a single query.
- lsh_topk: random-hyperplane LSH bucketing as the 100TB path — hyperplanes
  are generated with a seeded hash (deterministic, no driver-side matrix
  shipping), candidates come from colliding buckets (multi-probe over
  `n_tables` independent tables), and only candidates get exact cosine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(c: str):
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank)."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("qv")
    )
    sims = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        (_dot("v", "qv") / (_norm("v") * _norm("qv"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def portable_hyperplanes(
    n_tables: int, n_planes: int, dim: int, prefix: str = "h"
) -> list[list[list[float]]]:
    """Deterministic ±1 hyperplane matrix derived from md5 — identical on any
    engine (DuckDB replays `md5('h|t|p|d')` bit-for-bit, unlike xxhash64).

    Component (t, p, d) = +1 if the first 8 hex chars of md5("h|t|p|d"),
    read as an integer, are even; -1 otherwise. The matrix is tiny
    (n_tables x n_planes x dim) and is baked into the plan as array
    literals, so per-row work is pure arithmetic inside codegen — no
    per-row hashing at all (cheaper than the xxhash64 path)."""
    import hashlib

    return [
        [
            [
                1.0
                if int(
                    hashlib.md5(f"{prefix}|{t}|{p}|{d}".encode()).hexdigest()[:8], 16
                )
                % 2
                == 0
                else -1.0
                for d in range(dim)
            ]
            for p in range(n_planes)
        ]
        for t in range(n_tables)
    ]


def _portable_sign(vec_col: str, plane: list[float]):
    """'1'/'0' sign bit of <v, plane> for a literal ±1 hyperplane."""
    lit_plane = F.array(*[F.lit(x) for x in plane])
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), lit_plane, lambda x, h: x * h),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    """Vector dimensionality from the first row.

    EAGER: runs a Spark job (limit-1 over `df`'s full plan) at
    plan-CONSTRUCTION time, breaking the operator's laziness — if `df` is a
    derived pipeline, producing even one row can be expensive. Callers in
    perf-sensitive paths should pass `dim` explicitly instead (all
    portable-LSH entry points take it)."""
    row = df.select(F.col(vec_col).alias("v")).limit(1).first()
    if row is None or row["v"] is None:
        return 0
    return len(row["v"])


def _hyperplane_sign(vec_col: str, table: int, plane: int):
    """Sign of <v, h> for a pseudo-random hyperplane h derived from
    xxhash64(table, plane, dim) — deterministic on any cluster, no data
    shipping. Components are mapped to {-1, +1}."""
    return F.when(
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.transform(
                    F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1),
                    lambda i: F.when(
                        F.xxhash64(F.lit(table), F.lit(plane), i) % 2 == 0, F.lit(1.0)
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        >= 0,
        F.lit("1"),
    ).otherwise(F.lit("0"))


def lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 2,
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Attach (table, bucket) rows per vector — random-hyperplane LSH.

    portable=True derives the hyperplanes from md5 (portable_hyperplanes) as
    plan literals — cross-engine verifiable AND hash-free per row; the
    default xxhash64 path re-derives components per row and needs no `dim`.

    NOTE: portable=True with dim=None runs ONE eager limit-1 Spark job here
    (see _infer_dim) to discover the vector width — pass `dim` explicitly to
    keep the operator fully lazy.
    """
    v = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
    planes = None
    if portable:
        planes = portable_hyperplanes(n_tables, n_planes, dim or _infer_dim(df, vec_col))
    out = None
    for t in range(n_tables):
        if portable:
            signs = [_portable_sign("__v", planes[t][p]) for p in range(n_planes)]
        else:
            signs = [_hyperplane_sign("__v", t, p) for p in range(n_planes)]
        part = v.withColumn("table", F.lit(t)).withColumn(
            "bucket", F.concat(*signs)
        )
        out = part if out is None else out.unionByName(part)
    return out.drop("__v")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 2,
    portable: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: only bucket-colliding candidates get exact cosine.

    portable=True with dim=None triggers one eager limit-1 job on `corpus`
    at call time (see _infer_dim) — pass `dim` in perf-sensitive paths."""
    if portable and dim is None:
        dim = _infer_dim(corpus, vec_col)
    cb = lsh_bucket(
        corpus.select(id_col, vec_col), vec_col, n_planes, n_tables, portable, dim
    )
    qb = lsh_bucket(
        queries.select(query_id_col, vec_col), vec_col, n_planes, n_tables, portable, dim
    )
    cand = (
        cb.select(id_col, "table", "bucket", F.col(vec_col).alias("__cv"))
        .join(
            qb.select(query_id_col, "table", "bucket", F.col(vec_col).alias("__qv")),
            ["table", "bucket"],
        )
        .select(
            query_id_col,
            id_col,
            F.col("__cv").cast("array<double>").alias("v"),
            F.col("__qv").cast("array<double>").alias("qv"),
        )
        .dropDuplicates([query_id_col, id_col])
    )
    sims = cand.select(
        query_id_col,
        id_col,
        (_dot("v", "qv") / (_norm("v") * _norm("qv"))).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return sims.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-pruned scale path
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid pick: the `n_centroids` corpus vectors first in
    md5(id) order (a portable seeded sample — same rows on any engine or
    partitioning; SURVEY.md §4 determinism rule). K-means refinement would
    drop in here; centroid *choice* is not the contract, cell routing is."""
    return (
        corpus.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_vec"))
        .orderBy(F.md5(F.col("cent_id").cast("string")), F.col("cent_id"))
        .limit(n_centroids)
    )


def _cosine_expr(v, c):
    dot = F.aggregate(
        F.zip_with(v, c, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    nc = F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (nv * nc)


def ivf_assign(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach `cell` = nearest centroid id (cosine; ties -> lowest cent_id).

    `centroids` is a driver-side list of (cent_id, vector) — tiny — baked
    into the plan as an array literal, so assignment is MAP-ONLY: no shuffle,
    no join, scales linearly with corpus size. At 100TB the assigned table is
    written partitioned by `cell`, making probe-time reads partition-pruned.
    The argmax is a single `aggregate` fold with an explicit
    (sim desc, cent_id asc) comparison — deterministic under any order.
    """
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
            )
            for cid, vec in centroids
        ]
    )
    v = F.col("__v")
    sims = F.transform(
        cent_lit,
        lambda c: F.struct(_cosine_expr(v, c["cv"]).alias("sim"), c["cid"].alias("cid")),
    )
    best = F.aggregate(
        sims,
        F.struct(
            F.lit(-2.0).alias("sim"), F.lit(None).cast("integer").alias("cid")
        ),
        lambda acc, x: F.when(
            (x["sim"] > acc["sim"])
            | ((x["sim"] == acc["sim"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )
    return (
        corpus.withColumn("__v", F.col(vec_col).cast("array<double>"))
        # single-element explode = a Generate barrier: `cell` becomes an
        # opaque generator output instead of an alias of the argmax lambda
        # expression. Without it, Catalyst's constraint inference expands the
        # alias through the join condition and pushes a filter referencing
        # the dropped `__v` onto the probe side — an invalid plan that fails
        # at runtime (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). Cost: none (no
        # shuffle, one extra codegen stage boundary).
        .withColumn("cell", F.explode(F.array(best["cid"])))
        .drop("__v")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: list | None = None,
) -> DataFrame:
    """IVF approximate top-k: route every corpus vector to its nearest
    centroid cell once, probe only the `n_probe` cells nearest each query,
    exact cosine within the probed cells.

    Candidate set shrinks from |corpus| to ~(n_probe/n_centroids)·|corpus|;
    with the assigned table partitioned by cell this is a partition-pruned
    scan, not a filter. Returns (query_id, vec_id, rank) — rank is the
    value contract (floats never leave the plan), pinned by
    (cosine desc, vec_id asc).

    `centroids` overrides the deterministic pick with trained cells —
    pass `clustering.kmeans(corpus)[1]` for Lloyd-trained centroids with
    better-balanced cells (centroid choice is routing policy, not the
    result contract).
    """
    if centroids is None:
        cent_df = ivf_centroids(corpus, n_centroids, id_col, vec_col)
        centroids = [
            (r["cent_id"], list(r["cent_vec"])) for r in cent_df.collect()
        ]
    centroids = sorted(centroids)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    cent_rows = F.array(
        *[
            F.struct(
                F.lit(int(cid)).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cv"),
            )
            for cid, vec in centroids
        ]
    )
    qv = F.col("__qv")
    q = (
        queries.withColumn("__qv", F.col(vec_col).cast("array<double>"))
        .withColumn(
            "__cells",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.transform(
                            cent_rows,
                            lambda c: F.struct(
                                (-_cosine_expr(qv, c["cv"])).alias("neg_sim"),
                                c["cid"].alias("cid"),
                            ),
                        )
                    ),
                    lambda s: s["cid"],
                ),
                1,
                n_probe,
            ),
        )
        .select(
            query_id_col, F.col("__qv").alias("qv"), F.explode("__cells").alias("__qcell")
        )
    )
    # queries usually derive from the corpus DataFrame (query-by-example), so
    # the probe side would share scan lineage with `assigned`; Spark's
    # relation-deduplication mis-binds the two sides' computed columns under
    # that sharing (observed INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND at runtime).
    # localCheckpoint materializes the probe side EXECUTOR-side (cached RDD
    # blocks) and gives it fresh lineage — same bug-break as a driver
    # collect/re-create, but no driver round-trip: with a 10M-row query set
    # nothing funnels through the driver, and the broadcast below still
    # ships only the materialized rows.
    q = q.localCheckpoint(eager=True)
    cand = assigned.join(
        F.broadcast(q), F.col("cell") == F.col("__qcell")
    ).select(
        query_id_col,
        id_col,
        _cosine_expr(F.col(vec_col).cast("array<double>"), F.col("qv")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank")
    )


def quantize_vectors(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = floor(x_i·127/maxabs
    + 0.5), stored as array<int> plus the double `scale` (maxabs/127) for
    approximate-distance reconstruction.

    At 10^11-vector scale the embedding column dominates shuffle and scan
    bytes; int8 cuts them 4x while quantized-cosine recall stays high for
    normalized embeddings. Zero vectors quantize to all-zero with scale 0.
    Map-only (no shuffle); every step is exact integer/double arithmetic,
    so the DuckDB oracle replays bit-identically — no float-hash hazard.
    """
    v = F.col(vec_col).cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    q = F.when(maxabs == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor(x * 127.0 / maxabs + 0.5).cast("int"))
    )
    return df.withColumn(out_col, q).withColumn("scale", maxabs / 127.0)


def int_dot(a, b):
    """Exact integer dot product of two int arrays as a LONG column."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_cosine(a, b):
    """Cosine over int8 code arrays: integer dots/norms, one double division
    and sqrt of exactly-representable longs (int8 dots fit well under 2^53)
    — bit-identical across engines under any execution order. NULL when
    either norm is zero (a zero vector has no direction)."""
    na, nb = int_dot(a, a), int_dot(b, b)
    return F.when(
        (na > 0) & (nb > 0),
        int_dot(a, b).cast("double") / F.sqrt((na * nb).cast("double")),
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k by QUANTIZED cosine: the per-vector scales cancel in the
    cosine ratio, so the score is sum(qa·qb)/(‖qa‖·‖qb‖) over int8 codes —
    integer dot products and integer norms, deterministic under any
    execution order. Same broadcast crossJoin shape as brute_force_topk but
    moving 1/4 of the bytes; emits (query_id, vec_id, rank, cos_x1e6)."""
    c = quantize_vectors(
        corpus.select(id_col, vec_col), vec_col
    ).select(id_col, F.col("qvec").alias("cq"))
    q = quantize_vectors(
        queries.select(query_id_col, vec_col), vec_col
    ).select(query_id_col, F.col("qvec").alias("qq"))

    sims = c.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        quantized_cosine(F.col("cq"), F.col("qq")).alias("qcos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("qcos"), F.asc(id_col))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            "rank",
            F.floor(F.col("qcos") * 1000000 + F.lit(0.5)).cast("long").alias("cos_x1e6"),
        )
    )


def ann_recall_report(
    exact_topk: DataFrame,
    approx_topk: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-query quality report of an approximate ANN ranking against an
    exact one: recall@k plus where the exact top-1 landed in the approx
    list. The eval harness every ANN deployment needs before trading the
    brute-force path for LSH/IVF/PQ — run it on a sampled query set, read
    recall, then tune (n_tables/n_planes, probes, codebooks) against it.

    Both inputs are (query_id, vec_id, rank) rankings (the shape every
    topk operator here emits). Pure set/rank algebra on integers — one
    left join on (query, id), one aggregate:

    - n_hits:      |exact_topk ∩ approx_topk| per query
    - recall_x1e6: n_hits·1e6 div k (integer division, engine-exact)
    - top1_rank:   approx rank of the exact #1 neighbor, 0 if the approx
                   list missed it entirely (the MRR numerator)
    """
    e = exact_topk.select(
        query_id_col, id_col, F.col("rank").alias("__erank")
    )
    a = approx_topk.select(
        query_id_col, id_col, F.col("rank").alias("__arank")
    )
    return (
        e.join(a, [query_id_col, id_col], "left")
        .groupBy(query_id_col)
        .agg(
            F.sum(F.when(F.col("__arank").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
            F.max(
                F.when(F.col("__erank") == 1, F.coalesce("__arank", F.lit(0)))
            )
            .cast("long")
            .alias("top1_rank"),
        )
        .withColumn("recall_x1e6", F.expr(f"(n_hits * 1000000) div {int(k)}"))
    )


def int_sqdist(a, b):
    """Exact integer squared L2 distance of two int arrays as a LONG."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: ((x - y).cast("long") * (x - y).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kcenter_greedy(
    df: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center / farthest-point coreset selection (Gonzalez 1985,
    the classic 2-approximation): seed with the smallest id, then k−1
    times promote the point FARTHEST from its nearest chosen center —
    the standard diversity-sampling pass over an embedded corpus
    (coreset picking, dedup-aware eval-set selection, cluster seeding).

    All arithmetic is exact: int8 quantization (quantize_vectors) +
    integer squared L2, ties broken by smallest id — deterministic at
    any parallelism, and a DuckDB oracle replays it bit-for-bit (no
    grid snapping needed, per the round-3 integer-oracle rule).

    Scale shape: each of the k rounds is ONE map-only pass (distance to
    the single newest center, a literal int8 array riding the closure —
    no join) + one TakeOrderedAndProject(1); the running nearest-center
    assignment is carried forward with eager localCheckpoint, so the
    whole selection is k linear scans however large the corpus. Only k
    (id, qvec) rows ever cross the driver — same contract as the
    k-means centroid collect the kmeans gate pins.

    Returns the full assignment (id, center_id, dist_sq): every point
    labeled with its nearest chosen center (smallest center id on
    distance ties); chosen centers are the rows with center_id == id
    and dist_sq == 0.
    """
    qdf = (
        quantize_vectors(df.select(id_col, vec_col), vec_col)
        .select(F.col(id_col).alias("id"), "qvec")
        .localCheckpoint(eager=True)
    )
    seed = qdf.orderBy("id").limit(1).collect()[0]

    def lit_vec(v):
        return F.array([F.lit(int(x)) for x in v])

    best = qdf.select(
        "id",
        "qvec",
        F.lit(seed["id"]).alias("center_id"),
        int_sqdist(F.col("qvec"), lit_vec(seed["qvec"])).alias("dist_sq"),
    ).localCheckpoint(eager=True)
    for _ in range(k - 1):
        far = best.orderBy(F.desc("dist_sq"), F.asc("id")).limit(1).collect()[0]
        d_new = int_sqdist(F.col("qvec"), lit_vec(far["qvec"]))
        closer = (d_new < F.col("dist_sq")) | (
            (d_new == F.col("dist_sq")) & (F.lit(far["id"]) < F.col("center_id"))
        )
        best = best.select(
            "id",
            "qvec",
            F.when(closer, F.lit(far["id"])).otherwise(F.col("center_id")).alias(
                "center_id"
            ),
            F.when(closer, d_new).otherwise(F.col("dist_sq")).alias("dist_sq"),
        ).localCheckpoint(eager=True)
    return best.select("id", "center_id", "dist_sq")


def pca_power_scores(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    precision_bits: int = 16,
) -> DataFrame:
    """Projection of every vector onto the corpus's top principal
    direction, computed ENTIRELY in exact fixed-point integers — the
    embedding-analytics pass (whitening axis, outlier screening,
    split-by-dominant-direction) a curation pipeline wants before
    clustering. Method: int8-quantize (quantize_vectors), accumulate the
    scatter matrix in sum form M = n·Σqqᵀ − (Σq)(Σq)ᵀ (centered
    covariance times n², exact BIGINT), then two unnormalized power
    steps v₂ = M·(M·1) with data-adaptive rescales (M is capped at
    max|M| ≤ 2^30 and each matvec result at 2^precision_bits via
    greatest(1, max|·| DIV 2^k) truncating divides — bit-identical in
    DuckDB) so no intermediate exceeds dim · 2^30 · 2^(bits+1) ≲ 2^53
    at ANY corpus size. Score = qᵀv₂′, an exact
    BIGINT whose ORDER equals the true PC1 projection order up to
    quantization+truncation (deterministic, replayable — the
    integer-quotient oracle rule; no grid snapping anywhere).

    Scale shape: one posexplode to (id, i, v) — eagerly checkpointed
    once, it feeds the marginal sums, the scatter self-join, and the
    projection; the scatter agg groups on (i, j) (dim²-bounded,
    map-side combined — the ONLY corpus-scale shuffle); matvecs run on
    the dim²-row M table (checkpointed, two consumers); rescale divisors
    are 1-row aggregates collected driver-side (O(1) traffic, the IVF
    centroid exception); the final projection is a broadcast join +
    per-id agg. Power iteration from the all-ones vector is
    deterministic including sign; a spectrum needing more than 2 steps
    to separate merely yields a mixed-but-deterministic axis (documented
    contract, like fixed-iteration pagerank).

    Returns (id_col, pc1_score BIGINT).
    """
    q = quantize_vectors(df, vec_col)
    qi = (
        q.select(F.col(id_col), F.posexplode("qvec").alias("i", "v"))
        .withColumn("v", F.col("v").cast("long"))
        .localCheckpoint(eager=True)
    )
    n = qi.select(id_col).distinct().count()
    s1 = qi.groupBy("i").agg(F.sum("v").alias("s1"))
    a = qi.select(F.col(id_col).alias("__id"), F.col("i"), F.col("v"))
    b = qi.select(
        F.col(id_col).alias("__id"), F.col("i").alias("j"), F.col("v").alias("w")
    )
    s2 = (
        a.join(b, "__id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s2"))
    )
    m_raw = (
        s2.join(s1, "i")
        .join(
            s1.select(F.col("i").alias("j"), F.col("s1").alias("s1j")), "j"
        )
        .select(
            "i", "j",
            (F.lit(n).cast("long") * F.col("s2") - F.col("s1") * F.col("s1j"))
            .alias("m"),
        )
        .localCheckpoint(eager=True)
    )
    # cap max|M| at 2^30 so every later bound is n-INDEPENDENT:
    # matvec magnitude <= dim · 2^30 · 2^(bits+1) << 2^63 at any corpus size
    dm = m_raw.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"CAST(max(abs(m)) DIV {1 << 30} AS BIGINT)"),
        )
    ).first()[0]
    m = m_raw.select(
        "i", "j", F.expr(f"CAST(m DIV {dm} AS BIGINT)").alias("m")
    ).localCheckpoint(eager=True)

    def _matvec(vec: DataFrame) -> DataFrame:
        # vec: (j, w) -> returns rescaled (j, w) for the next consumer
        out = (
            m.join(vec.select(F.col("j"), F.col("w")), "j")
            .groupBy("i")
            .agg(F.sum(F.col("m") * F.col("w")).alias("raw"))
        )
        d = out.agg(
            F.greatest(
                F.lit(1).cast("long"),
                F.expr(f"CAST(max(abs(raw)) DIV {1 << precision_bits} AS BIGINT)"),
            )
        ).first()[0]
        return out.select(
            F.col("i").alias("j"),
            F.expr(f"CAST(raw DIV {d} AS BIGINT)").alias("w"),
        ).localCheckpoint(eager=True)

    ones = m.select(F.col("j")).distinct().withColumn(
        "w", F.lit(1).cast("long")
    )
    v1 = _matvec(ones)
    v2 = _matvec(v1)
    return (
        qi.join(F.broadcast(v2.select(F.col("j").alias("i"), "w")), "i")
        .groupBy(id_col)
        .agg(F.sum(F.col("v") * F.col("w")).alias("pc1_score"))
    )


def pool_vectors(
    df: DataFrame,
    key: str,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Group-wise mean pooling of vectors — the aggregation primitive
    between row-level embeddings and entity/conversation/source-level
    representations (mean-pooled turn embeddings ARE the conversation
    embedding in every practical retrieval pipeline; centroids for
    cluster labeling; source profiles for mixture planning).

    Exact integers: inputs quantize per component to floor(x·scale + 0.5)
    (the repo-wide convention), the pooled value is the exact truncated
    integer mean sum DIV n — both engines replay it; no float mean ever
    materializes. Rows with NULL vectors are excluded; ragged dimensions
    are a caller bug surfaced by the pooled array length.

    Scale shape: ONE posexplode to (key, dim, val) rows, ONE (key, dim)
    combinable agg, ONE (key) collect re-assembly ordered by dim via
    sorted-struct transform — the same exploded-vector discipline as
    feature_propagation, with d·n intermediate rows as the honest cost.

    Returns (key, n_vectors, vec) with vec: array<long> of pooled
    components in dim order.
    """
    q = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(key).alias("key"),
        F.posexplode(
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast(
                    "long"
                ),
            )
        ).alias("dim", "val"),
    )
    agg = q.groupBy("key", "dim").agg(
        F.sum("val").alias("__s"), F.count(F.lit(1)).alias("__n")
    )
    return agg.groupBy("key").agg(
        F.max("__n").cast("long").alias("n_vectors"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("dim"), F.expr("__s DIV __n").alias("m"))
                )
            ),
            lambda s: s["m"],
        ).alias("vec"),
    )


def label_noise_report(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    min_votes: int = 3,
) -> DataFrame:
    """Mislabeled-example detection by neighborhood voting (the workhorse
    of confident-learning-style dataset audits, Northcutt 2021): a row is
    flagged when at least ``min_votes`` of its ``k`` nearest neighbors
    (quantized cosine — the gated exact-integer scorer) agree on a label
    DIFFERENT from its own. The per-label noise rate is the first number
    a training-data audit reports.

    Majority pin: max (count, label) struct — largest count, then largest
    label — replayed by the oracle's (cnt DESC, label DESC) rank.

    Neighbor-set contract: top-(k+1) by (cos desc, id asc) with the row's
    own id dropped — exactly k voters normally; when duplicates push the
    row's own vector out of its top-(k+1), all k+1 survivors vote (a
    defined, replayable corner, not an error).

    Scale shape: neighbor search is quantized_topk's broadcast crossJoin —
    the documented EXACT baseline; at corpus scale swap the neighbor
    stage for lsh_topk/ivf_topk (same (query, neighbor) contract), the
    voting joins are unchanged. Voting is one (query, label) combinable
    count + an arg-max on the collapsed table + one label join back; the
    report is a |labels|-row rollup.

    Returns (label, n, n_flagged, noise_x1e6).
    """
    q = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col)
    )
    nbrs = quantized_topk(
        emb.select(id_col, vec_col), q, k=k + 1,
        id_col=id_col, vec_col=vec_col,
    ).filter(F.col(id_col) != F.col("query_id")).filter(F.col("rank") <= k + 1)
    lab = emb.select(F.col(id_col).alias("__nid"), F.col(label_col).alias("__nl"))
    votes = (
        nbrs.join(lab, nbrs[id_col] == lab["__nid"])
        .groupBy("query_id", "__nl")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    best = votes.groupBy("query_id").agg(
        F.max(F.struct("cnt", "__nl")).alias("__b")
    ).select(
        "query_id",
        F.col("__b.cnt").alias("maj_cnt"),
        F.col("__b.__nl").alias("maj_label"),
    )
    own = emb.select(F.col(id_col).alias("query_id"), F.col(label_col).alias("own"))
    flagged = own.join(best, "query_id", "left").withColumn(
        "__f",
        F.when(
            F.col("maj_label").isNotNull()
            & (F.col("maj_label") != F.col("own"))
            & (F.col("maj_cnt") >= int(min_votes)),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy(F.col("own").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("__f").alias("n_flagged"),
        )
        .select(
            "label",
            F.col("n").cast("long").alias("n"),
            F.col("n_flagged").cast("long").alias("n_flagged"),
            F.expr("n_flagged * 1000000 DIV n").cast("long").alias("noise_x1e6"),
        )
    )


def hard_negatives(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 3,
    candidates: int = 20,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: per
    anchor, the ``k`` most similar vectors carrying a DIFFERENT label —
    the pairs that actually move a metric-learning loss (easy negatives
    are free; hard ones must be mined). The dual of label_noise_report's
    vote (there cross-label neighbors are suspicion; here they are
    training signal).

    Neighbor stage: quantized_topk over ``candidates`` nearest (the gated
    exact-integer baseline — swap lsh_topk/ivf_topk at corpus scale, same
    contract); the cross-label filter then keeps at most k by the SAME
    (cos desc, id asc) order, re-ranked 1..k per anchor. If fewer than k
    cross-label vectors appear in the candidate window, fewer rows emit —
    widen ``candidates`` (documented recall knob, the standard ANN-mining
    trade).

    Returns (anchor_id, neg_id, neg_rank, cos_x1e6).
    """
    q = emb.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias(vec_col))
    nbrs = quantized_topk(
        emb.select(id_col, vec_col), q, k=candidates,
        id_col=id_col, vec_col=vec_col,
    ).filter(F.col(id_col) != F.col("query_id"))
    lab = emb.select(F.col(id_col).alias("__nid"), F.col(label_col).alias("__nl"))
    own = emb.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("__ol")
    )
    cross = (
        nbrs.join(lab, nbrs[id_col] == lab["__nid"])
        .join(own, "query_id")
        .filter(F.col("__nl") != F.col("__ol"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_x1e6"), F.asc(F.col(id_col))
    )
    return (
        cross.withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= int(k))
        .select(
            F.col("query_id").alias("anchor_id"),
            F.col(id_col).alias("neg_id"),
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "cos_x1e6",
        )
    )


def centroid_shift(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str,
    vec_col: str = "embedding",
    scale: int = 1000,
) -> DataFrame:
    """Embedding-space drift between two snapshots: per key, the squared
    integer distance between the snapshots' mean-pooled centroids — the
    vector-space companion to distribution_drift (categorical mix) and
    rank_movers (popularity): a retrained encoder, a corpus shift, or an
    ingestion bug all move centroids long before nearest-neighbor quality
    visibly degrades.

    Exact integers end to end: both sides pool via pool_vectors (exact
    truncated integer means of scale-quantized components), the shift is
    Σ (a_i − b_i)² in quantized units — comparable across keys at the
    same scale. n_a/n_b carry the support so a thin side is visible.

    Scale shape: two pool_vectors passes + one |keys|-row join; the
    zip_with distance is a map expression on the tiny joined table.

    Returns (key, n_a, n_b, dim, shift_sq).
    """
    a = pool_vectors(df_a, key, vec_col=vec_col, scale=scale).select(
        "key", F.col("n_vectors").alias("n_a"), F.col("vec").alias("__va")
    )
    b = pool_vectors(df_b, key, vec_col=vec_col, scale=scale).select(
        "key", F.col("n_vectors").alias("n_b"), F.col("vec").alias("__vb")
    )
    dist = F.aggregate(
        F.zip_with("__va", "__vb", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return a.join(b, "key").select(
        "key", "n_a", "n_b",
        F.size("__va").cast("int").alias("dim"),
        dist.cast("long").alias("shift_sq"),
    )


def knn_classify(
    emb: DataFrame,
    k: int = 5,
    test_mod: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_broadcast_rows: int = 200_000,
) -> DataFrame:
    """k-NN majority-vote classification over int8-quantized embeddings
    with a PURE-INTEGER cosine ordering: within one query vector the query
    norm is a common factor, so ranking candidates by cosine equals
    ranking by sign(d) · d²·1e6 DIV ‖c‖² (d = integer dot, ‖c‖² = integer
    candidate norm) — the signed-r² device; no sqrt, no doubles, bit-equal
    in DuckDB. Requires dim <= 93 so (127²·dim)²·1e6 stays under 2^63,
    and integer labels in [0, 15] (votes are packed as cnt·16 + (15 −
    label) so the majority-with-smallest-label-tie-break is a single
    max()).

    Split: `id % test_mod == 0` is the held-out test set; the rest is the
    reference set. This brute-force scorer is the exactness baseline —
    the 100 TB path swaps the crossJoin for lsh_bucket/ivf_assign
    candidate generation (same voting tail). The broadcast test side
    grows linearly with the corpus (1/test_mod of it), so it is GUARDED:
    if the test split exceeds `max_broadcast_rows` (default 200k ≈ tens
    of MB of quantized vectors, well under executor broadcast comfort),
    this raises instead of silently shipping an ever-growing broadcast —
    switch to LSH/IVF candidate generation or score in test-side blocks
    above that (round-5 ADVICE fix). Emits per test vector:
    (vec_id, true_label, pred_label, n_votes, correct).
    """
    qz = quantize_vectors(
        emb.select(id_col, label_col, vec_col), vec_col
    ).select(
        F.col(id_col).alias("vid"),
        F.col(label_col).cast("long").alias("lbl"),
        "qvec",
    )
    test = qz.filter(F.col("vid") % test_mod == 0).select(
        F.col("vid").alias("tid"),
        F.col("lbl").alias("true_lbl"),
        F.col("qvec").alias("tq"),
    )
    train = qz.filter(F.col("vid") % test_mod != 0).select(
        F.col("vid").alias("cid"), F.col("lbl").alias("clbl"), "qvec"
    ).withColumn("cnorm", int_dot(F.col("qvec"), F.col("qvec")))

    n_test = test.limit(max_broadcast_rows + 1).count()
    if n_test > max_broadcast_rows:
        raise ValueError(
            f"knn_classify: test split exceeds max_broadcast_rows="
            f"{max_broadcast_rows} (>= {n_test} rows) — the broadcast side"
            " grows linearly with the corpus. Use lsh_bucket/ivf_assign"
            " candidate generation or score in test-side blocks instead."
        )
    pairs = train.crossJoin(F.broadcast(test)).withColumn(
        "d", int_dot(F.col("qvec"), F.col("tq"))
    ).withColumn(
        "key",
        F.expr(
            "CASE WHEN d >= 0 THEN (d * d * 1000000) DIV greatest(cnorm, 1) "
            "ELSE -((d * d * 1000000) DIV greatest(cnorm, 1)) END"
        ),
    )
    w = Window.partitionBy("tid").orderBy(F.desc("key"), F.asc("cid"))
    top = (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("tid", "true_lbl", "clbl")
    )
    votes = top.groupBy("tid", "true_lbl", "clbl").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = votes.groupBy("tid", "true_lbl").agg(
        F.max(F.expr("cnt * 16 + (15 - clbl)")).alias("vk")
    )
    return best.select(
        F.col("tid").alias(id_col),
        F.col("true_lbl").alias("true_label"),
        F.expr("15 - (vk % 16)").cast("long").alias("pred_label"),
        F.expr("vk DIV 16").cast("long").alias("n_votes"),
        F.expr(
            "CAST(CASE WHEN true_lbl = 15 - (vk % 16) THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("correct"),
    )


def pca_top_component(
    emb: DataFrame,
    vec_col: str = "embedding",
    rounds: int = 3,
    scale: int = 1 << 20,
) -> DataFrame:
    """Top principal direction of the int8-quantized embedding matrix
    (uncentered PCA — the top right singular vector) by fixed-round
    integer power iteration on the dim×dim Gram table: the
    dimensionality-reduction/whitening direction an embedding pipeline
    inspects, computed with ZERO float arithmetic. The Gram matrix
    G_ij = Σ q_i·q_j is one map-side-combined aggregation (dim² cells —
    4096 for dim 64 — regardless of corpus size); each round is a
    cell-table join + max-|abs| integer rescale (eigenvector_centrality's
    device with signed scores). The sign is pinned: the component is
    flipped so its largest-|loading| coordinate is positive (ties to the
    smallest index), making the output unique.

    Overflow: round sums are bounded by dim·max|G|·scale — BIGINT-safe to
    ~1e5 rows·dim 64 at the 2^20 scale; past that swap the products to
    DECIMAL(38,0) (128-bit rule). Emits one row per dimension:
    (dim, loading_x) with loading in [−scale, scale].
    """
    qz = quantize_vectors(emb.select(vec_col), vec_col).select(
        F.col("qvec").alias("q")
    )
    pairs = qz.select(
        F.explode(
            F.expr(
                "flatten(transform(q, (xi, i) ->"
                " transform(q, (xj, j) ->"
                " struct(i AS i, j AS j, CAST(xi AS BIGINT) * xj AS p))))"
            )
        ).alias("c")
    ).select(F.col("c.i").alias("i"), F.col("c.j").alias("j"), F.col("c.p").alias("p"))
    cells = pairs.groupBy("i", "j").agg(F.sum("p").alias("g")).localCheckpoint(
        eager=True
    )
    dims = cells.select(F.col("i").alias("d")).distinct().localCheckpoint(
        eager=True
    )
    v = dims.withColumn("val", F.lit(scale).cast("long"))
    for _ in range(rounds):
        nv = (
            cells.join(v.select(F.col("d").alias("j"), "val"), "j")
            .groupBy("i")
            .agg(F.sum(F.expr("g * val")).alias("s"))
            .select(F.col("i").alias("d"), "s")
        )
        mx = nv.agg(F.max(F.abs(F.col("s"))).alias("mx"))
        v = (
            nv.crossJoin(F.broadcast(mx))
            .select(
                "d",
                F.expr(f"s * {scale} DIV greatest(mx, 1)")
                .cast("long")
                .alias("val"),
            )
            .localCheckpoint(eager=True)
        )
    # pin the sign: flip so the largest-|loading| dim (smallest index on
    # ties) is positive
    pick = v.orderBy(F.abs(F.col("val")).desc(), F.asc("d")).limit(1).select(
        F.expr("CASE WHEN val >= 0 THEN 1 ELSE -1 END").alias("sgn")
    )
    return v.crossJoin(F.broadcast(pick)).select(
        F.col("d").cast("long").alias("dim"),
        F.expr("val * sgn").cast("long").alias("loading_x"),
    )
