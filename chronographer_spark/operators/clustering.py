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


def dbscan_grid(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    eps: int = 200,
    min_pts: int = 4,
) -> DataFrame:
    """Grid-bucketed DBSCAN over integer 2-D points — the density
    clustering the k-means family can't do (arbitrary-shape clusters, an
    explicit NOISE verdict, no k to pick): the classic screen for
    "how many dense regions does this projection of the corpus have, and
    which points are stragglers" (Ester et al. 1996). Callers pre-quantize
    coordinates to an integer grid (the repo's float discipline).

    Deterministic variant, pinned identically in the oracle: core points
    (|N_eps| ≥ min_pts, counting self) cluster by connected components
    over core-core ε-edges with component = MIN core id; border points
    (non-core within ε of a core) join the MINIMUM cluster label among
    their core neighbors — classic DBSCAN leaves border assignment
    scan-order-dependent, this pins it. Everything else (noise = -1) is
    textbook.

    Scale shape — the grid IS the index: cell side = ε, each point
    replicates into its 3×3 neighbor cells (map-only ×9 fan), and every
    ε-pair provably shares a (cell_x, cell_y) bucket, so the candidate
    join is an equi-join on cell keys — no crossJoin, no R-tree. Cost is
    O(n · points-per-cell): bounded by data density, the same contract
    as every production DBSCAN; a pathological all-points-in-one-cell
    input degrades to the quadratic truth with AQE splitting the skewed
    bucket. Neighbor counts, core flags, edges, and border attachment
    all reuse ONE candidate-pair table (localCheckpoint so the LSH-band
    re-execution family bug can't bite); the CC loop is
    `connected_components` (window strategy — ε-graphs are
    bounded-degree by the same density argument).

    Returns (id, is_core, cluster): cluster = -1 for noise.
    """
    from ..linking.canonicalize import connected_components

    pts = points.select(
        F.col(id_col).cast("long").alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
    ).localCheckpoint(eager=True)
    # left side fans into the 3x3 neighborhood; right side stays put
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("ox"), F.lit(dy).alias("oy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    left = pts.withColumn("o", off).select(
        F.col("pid").alias("id_a"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
        (F.floor(F.col("px") / eps) + F.col("o.ox")).alias("cx"),
        (F.floor(F.col("py") / eps) + F.col("o.oy")).alias("cy"),
    )
    right = pts.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.floor(F.col("px") / eps).alias("cx"),
        F.floor(F.col("py") / eps).alias("cy"),
    )
    pairs = (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") != F.col("id_b"))
        .filter(
            (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
            + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
            <= F.lit(eps * eps)
        )
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    ncnt = pairs.groupBy("id_a").agg((F.count(F.lit(1)) + 1).alias("n_eps"))
    flagged = pts.join(ncnt, pts.pid == ncnt.id_a, "left").select(
        "pid",
        (F.coalesce(F.col("n_eps"), F.lit(1)) >= min_pts).alias("is_core"),
    ).localCheckpoint(eager=True)
    core = flagged.filter("is_core").select("pid")
    core_edges = (
        pairs.join(core.withColumnRenamed("pid", "id_a"), "id_a")
        .join(core.withColumnRenamed("pid", "id_b"), "id_b")
        .select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    cc = connected_components(
        core_edges, all_nodes=core.withColumnRenamed("pid", "node"),
        strategy="window",
    )
    border = (
        pairs.join(
            cc.select(F.col("node").alias("id_b"), "component"), "id_b"
        )
        .groupBy("id_a")
        .agg(F.min("component").alias("b_cluster"))
    )
    return (
        flagged.join(cc.withColumnRenamed("node", "pid"), "pid", "left")
        .join(border.withColumnRenamed("id_a", "pid"), "pid", "left")
        .select(
            F.col("pid").alias(id_col),
            "is_core",
            F.when(F.col("is_core"), F.col("component"))
            .otherwise(F.coalesce(F.col("b_cluster"), F.lit(-1)))
            .cast("long")
            .alias("cluster"),
        )
    )
