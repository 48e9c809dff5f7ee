"""Explicit skew handling: salted joins for hub keys.

The reference has no skew handling — a hub node (dbr:France-scale alias set)
simply takes long, mitigated only by the max_uri cap
(reference: src/framework.py:460-463). At 10^12-turn scale a hub entity's
key concentrates one reducer; AQE's skew-join split helps sort-merge joins,
but aggregation hot keys and broadcast-ineligible dimension joins need
salting (SURVEY.md §4).

`salted_join`: replicate the small side S times, scatter the big side's hub
keys across S salt buckets with xxhash64 (deterministic), join on
(key, salt). `salted_count`: two-level aggregation for hot-key counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hub keys on the big side.

    big rows get salt = xxhash64(whole row id-ish cols) % S; the small side is
    replicated S times so every (key, salt) pair finds its match. Output
    columns = big's columns + small's non-key columns (like a plain join).
    """
    big_cols = big.columns
    salted_big = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 16
) -> DataFrame:
    """groupBy count robust to hot keys: partial count per (key, salt), then
    re-aggregate per key. (Spark's partial aggregation usually suffices; this
    is the explicit form for extreme hubs where map-side combine is defeated
    by partitioning.)"""
    # salt only affects bucketing (never the result); a per-row id is enough
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "__salt").agg(F.count("*").alias("__c"))
    return partial.groupBy(*key_cols).agg(F.sum("__c").alias("count"))
