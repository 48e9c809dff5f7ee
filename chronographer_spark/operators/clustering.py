"""Distributed Lloyd's k-means over embedding columns.

The trained-centroid upgrade the IVF index points at (similarity.py:230:
"k-means would drop in here; centroid *choice* is not the contract") and a
first-class corpus-curation primitive in its own right: topic bucketing,
per-cluster quota sampling, and embedding-space diagnostics all start from
a k-means partition of the document embeddings.

Spark-shape per Lloyd round:
- **assign** is MAP-ONLY: the k centroids (k × dim doubles) are baked into
  the plan as an array literal and the argmin is one `aggregate` fold with
  an explicit (dist asc, cid asc) comparison — no join, no shuffle, linear
  in corpus size (same pattern as similarity.ivf_assign).
- **update** is ONE shuffle of k × dim cells: posexplode the vector and
  average per (cluster, dimension) — partial aggregation map-side, so the
  exchange carries at most `k · dim · shuffle_partitions` rows regardless
  of corpus size. Only the k × dim centroid floats cross the driver per
  round.

Determinism across engines (the DuckDB oracle unrolls the same rounds):
initial centroids are the k lowest-id vectors read from parquet (bit-exact
in both engines), and every updated centroid component is snapped to a
1e-6 grid with `floor(x·1e6 + 0.5)/1e6` — the snap absorbs summation-order
ULP differences between Spark's and DuckDB's partial aggregates, so both
engines run round 2 from identical centroids. Clusters that receive no
members simply drop out of the next round's centroid set (documented
contract, matched by the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sqdist_expr(v, c):
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    corpus: DataFrame,
    centroids: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach `cluster` = argmin squared-L2 centroid id (ties -> lowest id).

    `centroids` is a driver-side list of (cid, vector); map-only, no
    shuffle (see module docstring)."""
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
    dists = F.transform(
        cent_lit,
        lambda c: F.struct(_sqdist_expr(v, c["cv"]).alias("d"), c["cid"].alias("cid")),
    )
    best = F.aggregate(
        dists,
        F.struct(
            F.lit(float("inf")).alias("d"), F.lit(None).cast("integer").alias("cid")
        ),
        lambda acc, x: F.when(
            (x["d"] < acc["d"]) | ((x["d"] == acc["d"]) & (x["cid"] < acc["cid"])),
            x,
        ).otherwise(acc),
    )
    return (
        corpus.withColumn("__v", F.col(vec_col).cast("array<double>"))
        # Generate barrier: same Catalyst constraint-inference workaround as
        # similarity.ivf_assign (alias expansion through later joins)
        .withColumn("cluster", F.explode(F.array(best["cid"])))
        .drop("__v")
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list]:
    """Lloyd's k-means; returns (assignments DF [id_col, cluster], final
    centroid list [(cid, [floats])]).

    Init: the k lowest-`id_col` vectors (deterministic, oracle-replayable);
    swap in a sampled or k-means++ init for production quality — the round
    structure is the contract, not the init."""
    if k < 1:
        raise ValueError("k must be >= 1")
    first = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not first:
        raise ValueError("kmeans requires a non-empty corpus")
    centroids = [(i, list(r["v"])) for i, r in enumerate(first)]
    assigned = None
    for _ in range(iterations):
        assigned = assign_clusters(corpus, centroids, id_col, vec_col)
        upd = (
            assigned.select(
                "cluster",
                F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
            )
            .groupBy("cluster", "i")
            .agg(
                (F.floor(F.avg("x") * 1000000 + F.lit(0.5)) / 1000000).alias("x")
            )
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("i", "x"))).alias("sx"))
            .select("cluster", F.col("sx.x").alias("v"))
            .collect()
        )
        centroids = sorted((r["cluster"], list(r["v"])) for r in upd)
    return assigned.select(id_col, "cluster"), centroids
