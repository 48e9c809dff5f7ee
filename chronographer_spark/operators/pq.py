"""Product quantization (Jégou, Douze, Schmid 2011) for billion-scale ANN.

The memory end-game of the ANN family (similarity.py): IVF prunes WHICH
vectors are scored, int8 quantization (similarity.quantize_vectors) shrinks
them 4x — PQ shrinks them ~64x by storing each vector as m sub-space code
ids (here m=8 codes of 4 bits-worth each, k=16 centroids per sub-space for
a 64-dim embedding). At 10^11 vectors the PQ code table fits where raw
embeddings cannot, which is what makes exhaustive re-ranking feasible at
all. The reference has no ANN surface (SURVEY.md §2 gap list); this module
follows the public paper, re-expressed as DataFrame algebra.

Spark shapes, per stage:
- **train** (`train_pq_codebooks`): one explode of the m sub-space ids —
  m × corpus rows, NOT m separate jobs — then per Lloyd round a MAP-ONLY
  assignment against (sub, cid, centroid) literals and ONE shuffle of at
  most m·k·ds averaged cells (partial aggregation map-side). Only the
  m·k·ds codebook floats ever cross the driver. Production note: train on
  a deterministic sample (sampling.hash_rate_sample) — codebooks converge
  on a few million vectors; the full corpus is only ever ENCODED.
- **encode** (`pq_encode`): zero shuffles, zero explodes — the codes array
  is m fold-argmins over slice()s of the vector against codebook literals,
  one row in, one row out. This is the pass that runs over 100 TB, so it
  must be (and is) embarrassingly parallel.
- **query** (`pq_topk`): asymmetric distance computation (ADC): the query
  keeps full precision, each corpus vector is approximated by its
  sub-space centroids. Queries broadcast; the per-pair score is m
  lookups + ds-dim squared distances folded into one BIGINT (each
  sub-distance snapped to integer millionths before summing — integer
  addition is order-free, so the score is bit-identical in any engine or
  execution order). Top-k per query by (score asc, vec_id asc). At
  production query volumes, precompute each query's m × k distance table
  once and join on (sub, code) instead of recomputing per pair; the gate
  shape keeps the lookup inline because it is shuffle-free.

Determinism contract (same discipline as clustering.kmeans): centroid
init = the k lowest-id vectors' sub-vectors, updated centroids snapped to
the 1e-6 grid each round, argmin ties break to the lowest code id. The
DuckDB oracle replays training, encoding, and ADC scores exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _argmin_code(subvec, codes_lit):
    """Fold argmin over (cid, cv) structs: lowest distance, ties -> lowest
    cid. Same pattern as clustering.assign_clusters."""
    dists = F.transform(
        codes_lit,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(subvec, c["cv"], lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            c["cid"].alias("cid"),
        ),
    )
    return F.aggregate(
        dists,
        F.struct(
            F.lit(float("inf")).alias("d"), F.lit(None).cast("integer").alias("cid")
        ),
        lambda acc, x: F.when(
            (x["d"] < acc["d"]) | ((x["d"] == acc["d"]) & (x["cid"] < acc["cid"])), x
        ).otherwise(acc),
    )["cid"]


def _codes_lit(codebooks: list, sub: int):
    entries = [
        F.struct(
            F.lit(int(cid)).alias("cid"),
            F.array(*[F.lit(float(x)) for x in cv]).alias("cv"),
        )
        for s, cid, cv in codebooks
        if s == sub
    ]
    return F.array(*entries)


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Per-sub-space Lloyd k-means; returns [(sub, cid, [floats]), ...].

    All m sub-spaces train in the SAME jobs (sub is a column, not a loop
    over actions): see module docstring for the per-round shape."""
    if dim % m != 0:
        raise ValueError("dim must divide evenly into m sub-spaces")
    ds = dim // m
    v = F.col(vec_col).cast("array<double>")
    subvecs = corpus.select(
        F.col(id_col),
        F.explode(F.array(*[F.lit(s) for s in range(m)])).alias("sub"),
        v.alias("__v"),
    ).select(
        id_col, "sub", F.slice(F.col("__v"), F.col("sub") * ds + 1, ds).alias("sv")
    )

    first = (
        corpus.select(id_col, v.alias("__v")).orderBy(id_col).limit(k).collect()
    )
    if not first:
        raise ValueError("train_pq_codebooks requires a non-empty corpus")
    codebooks = [
        (s, cid, list(r["__v"][s * ds : (s + 1) * ds]))
        for s in range(m)
        for cid, r in enumerate(first)
    ]

    for _ in range(iterations):
        code_expr = F.coalesce(
            *[
                F.when(
                    F.col("sub") == s,
                    _argmin_code(F.col("sv"), _codes_lit(codebooks, s)),
                )
                for s in range(m)
            ]
        )
        assigned = subvecs.withColumn("code", code_expr)
        upd = (
            assigned.select("sub", "code", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub", "code", "i")
            .agg((F.floor(F.avg("x") * 1000000 + F.lit(0.5)) / 1000000).alias("x"))
            .groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("sx"))
            .select("sub", "code", F.col("sx.x").alias("cv"))
            .collect()
        )
        codebooks = sorted((r["sub"], r["code"], list(r["cv"])) for r in upd)
    return codebooks


def pq_encode(
    corpus: DataFrame,
    codebooks: list,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "codes",
) -> DataFrame:
    """Attach `out_col` = array<int> of m code ids. Map-only: no shuffle,
    no explode — this is the 100 TB pass."""
    ds = dim // m
    v = F.col(vec_col).cast("array<double>")
    codes = F.array(
        *[
            _argmin_code(F.slice(v, s * ds + 1, ds), _codes_lit(codebooks, s))
            for s in range(m)
        ]
    )
    return corpus.withColumn(out_col, codes)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list,
    k: int = 10,
    m: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: (query_id, vec_id, rank, dist_x1e6), rank 1 = nearest by
    quantized squared L2; ties -> lowest vec_id. See module docstring for
    the integer-score determinism argument and the production
    distance-table variant."""
    ds = dim // m
    encoded = pq_encode(corpus, codebooks, m, dim, id_col, vec_col).select(
        id_col, "codes"
    )
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(F.col(query_id_col), qv.alias("__qv"))

    def sub_dist_int(s):
        # look up by cid match, NOT by array position: empty clusters leave
        # gaps in the cid sequence, so position indexing would mis-address
        centroid = F.element_at(
            F.filter(
                _codes_lit(codebooks, s),
                lambda c: c["cid"] == F.element_at(F.col("codes"), s + 1),
            ),
            1,
        )["cv"]
        d = F.aggregate(
            F.zip_with(
                F.slice(F.col("__qv"), s * ds + 1, ds),
                centroid,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.floor(d * 1000000 + F.lit(0.5)).cast("long")

    score = sub_dist_int(0)
    for s in range(1, m):
        score = score + sub_dist_int(s)

    pairs = encoded.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, score.alias("dist_x1e6")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.asc("dist_x1e6"), F.asc(id_col)
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", "dist_x1e6")
    )
