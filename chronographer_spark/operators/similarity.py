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
) -> DataFrame:
    """Attach (table, bucket) rows per vector — random-hyperplane LSH."""
    v = df.withColumn("__v", F.col(vec_col).cast("array<double>"))
    out = None
    for t in range(n_tables):
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
) -> DataFrame:
    """Approximate top-k: only bucket-colliding candidates get exact cosine."""
    cb = lsh_bucket(corpus.select(id_col, vec_col), vec_col, n_planes, n_tables)
    qb = lsh_bucket(queries.select(query_id_col, vec_col), vec_col, n_planes, n_tables)
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
