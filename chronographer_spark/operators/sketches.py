"""Approximate-distinct sketch (HyperLogLog) built from relational ops.

The reference uses only exact counts (SURVEY.md §2.4: "no approximate
aggregates"); at 100TB a distinct-count over a high-cardinality column
(unique actors, unique mention surface forms) wants a sketch. Spark's
built-in `approx_count_distinct` is a fine production answer but its HLL++
registers are JVM-internal; this module builds the classic HLL from plain
DataFrame ops with an md5-derived hash, so:

- the DuckDB oracle replays the estimate BIT-FOR-BIT (same hash, same
  registers, same float arithmetic — the register sum is a sum of powers of
  two spanning < 53 bits, hence exact in IEEE double and order-independent),
- register tables are themselves DataFrames: mergeable across partitions,
  unions, or days by `groupBy(bucket).agg(max(rho))` — the sketch property
  that makes it a scale primitive.

Accuracy is the textbook ~1.04/sqrt(m); no small/large-range bias
corrections are applied (pinned identically in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# alpha constant for m=64 registers (Flajolet et al. 2007, Fig. 3)
ALPHA_64 = 0.709
M = 64  # registers; 6 index bits + 26 rho bits from the 32-bit md5 slice


def _hash32(col):
    """Engine-portable 32-bit hash: first 8 hex chars of md5."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def hll_registers(df: DataFrame, col: str) -> DataFrame:
    """(bucket, rho) register table — max trailing-zero-rank per bucket.

    rho = 1 + trailing zeros of the 26 remaining hash bits (27 when they are
    all zero). One groupBy with map-side max partial aggregation; ≤ M rows
    out regardless of input size.
    """
    h = _hash32(F.col(col))
    rem = F.shiftrightunsigned(h, 6)
    rho = F.when(rem == 0, F.lit(27)).otherwise(
        F.bit_count((rem.bitwiseAND(-rem)) - 1) + 1
    )
    return (
        df.select(
            h.bitwiseAND(F.lit(M - 1)).alias("bucket"), rho.alias("rho")
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row (estimate BIGINT) from a register table: alpha·m²/Σ2^(-M_j),
    empty registers contributing 2^0 = 1 each."""
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("present_sum"),
        F.count(F.lit(1)).alias("present_n"),
    )
    total = F.col("present_sum") + (F.lit(M) - F.col("present_n")) * F.lit(1.0)
    return agg.select(
        F.floor(F.lit(ALPHA_64) * F.lit(M) * F.lit(M) / total + F.lit(0.5))
        .cast("long")
        .alias("estimate")
    )


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Convenience: one-row approximate distinct count of `col`."""
    return hll_estimate(hll_registers(df, col))


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge sketches (e.g. per-day register tables) — union + max."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bucket").agg(F.max("rho").alias("rho"))
