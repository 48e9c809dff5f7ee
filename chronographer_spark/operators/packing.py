"""Sequence packing: lay documents end-to-end in a deterministic order and
split the concatenated token stream into fixed-budget training chunks
(the concatenate-and-split packing used for LLM pretraining batches — a
document may straddle a chunk boundary; nothing is padded or dropped).

The reference pipeline has no packing stage (it emits per-turn triples,
src/graph_creation.py); this operator belongs to the training-data side of
the engine, next to sampling/dedup (COVERAGE.md "LLM-data-pipeline" family).

Scale shape — the global prefix sum is TWO-PHASE, never a single-partition
window:

1. range-partition on the (unique) order key, local window cumsum per
   partition id;
2. per-partition token totals (exactly one row per partition) are summed on
   the driver into exclusive partition offsets — small by construction,
   like IVF's k centroids — and broadcast-joined back.

Chunk ids are integer arithmetic on the exclusive prefix sum, so results
are bit-identical across engines and replayable by a windowed SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    order_col: str | None = None,
    n_parts: int = 32,
) -> DataFrame:
    """Assign each document its chunk span in the packed token stream.

    Documents are ordered by ``order_col`` (default: ``md5(id_col)`` — a
    deterministic shuffle; MUST be unique per row, or the cross-partition
    tie order is undefined). With ``cum_before`` the exclusive prefix sum
    of token counts, a document occupies stream positions
    ``[cum_before, cum_before + n_tokens)`` and therefore chunks
    ``floor(cum_before/budget) .. floor((cum_end-1)/budget)`` of size
    ``budget``, entering the first one at offset ``cum_before % budget``.
    Zero-token documents get ``last_chunk = first_chunk``.

    Returns (id, n_tokens, cum_before, first_chunk, last_chunk,
    chunk_offset) — enough for a writer to bucket the corpus by
    ``first_chunk`` range and emit contiguous training sequences.
    """
    ok = F.md5(F.col(id_col).cast("string")) if order_col is None else F.col(order_col)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        ok.alias("_ok"),
    )
    parted = base.repartitionByRange(n_parts, "_ok").withColumn(
        "_part", F.spark_partition_id()
    )
    # Phase 1: local cumsum inside each range partition. The window re-shuffles
    # by _part, which preserves the range order across partition ids.
    local_w = (
        Window.partitionBy("_part")
        .orderBy("_ok")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = parted.withColumn("_cum_local", F.sum("n_tokens").over(local_w))
    local = local.localCheckpoint(eager=True)  # totals + main path share it

    # Phase 2: one row per partition crosses the driver (≤ n_parts rows).
    totals = sorted(
        (r["_part"], r["tot"])
        for r in local.groupBy("_part").agg(F.sum("n_tokens").alias("tot")).collect()
    )
    offsets, acc = {}, 0
    for pid, tot in totals:
        offsets[pid] = acc
        acc += tot or 0
    off_df = local.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_part int, _off long"
    )
    cum_end = F.col("_off") + F.col("_cum_local")
    cum_before = cum_end - F.col("n_tokens")
    first_chunk = F.floor(cum_before / budget)
    last_chunk = F.floor(
        F.greatest(cum_end - 1, cum_before) / budget
    )
    return (
        local.join(F.broadcast(off_df), "_part")
        .select(
            "id",
            "n_tokens",
            cum_before.alias("cum_before"),
            first_chunk.alias("first_chunk"),
            last_chunk.alias("last_chunk"),
            (cum_before % budget).alias("chunk_offset"),
        )
    )
