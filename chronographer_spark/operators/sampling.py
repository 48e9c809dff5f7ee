"""Deterministic, partition-independent sampling.

The reference caps the frontier with `random.seed(23); random.sample(...)`
(reference: src/framework.py:460-463) — order-dependent and single-process.
Spark's `df.sample()` is neither row-exact nor partition-stable, so the
engine uses xxhash64(key, seed) ordering: reproducible on any cluster
layout, any partitioning (SURVEY.md §4 determinism rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def deterministic_sample(df: DataFrame, k: int, seed: int = 23, key: str = "node") -> DataFrame:
    """Take exactly min(k, n) rows, chosen by hash order of the key."""
    return df.orderBy(F.xxhash64(F.col(key), F.lit(seed)), F.col(key)).limit(k)


def deterministic_pick_per_group(
    df: DataFrame, group_cols: list[str], seed: int = 23
) -> DataFrame:
    """O5 — one deterministic row per group (replaces pandas .sample() in the
    random-walk path, framework.py:490-514)."""
    others = [c for c in df.columns if c not in group_cols]
    w = Window.partitionBy(*group_cols).orderBy(
        F.xxhash64(*[F.col(c) for c in others], F.lit(seed))
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
