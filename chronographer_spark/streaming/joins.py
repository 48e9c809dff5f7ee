"""Stream-stream interval join with watermark-bounded state.

The batch engine's interval join (operators/temporal.interval_self_join)
has a streaming counterpart for live transcript feeds: correlate two event
streams per key when the right event lands within a bounded interval after
the left one (e.g. a tool invocation answered within N minutes, a click
followed by a purchase). Structured Streaming executes this as a stateful
symmetric hash join; the interval condition plus BOTH watermarks bound how
long either side's rows are retained — without the time bound the state
grows forever, which is why this module makes the bound a required
argument rather than an optional filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int = 600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Rows (key, left payload, right payload, gap_seconds) for pairs with
    ``left_ts < right_ts <= left_ts + max_gap_seconds`` on the same key.

    Both inputs must be streaming DataFrames; columns other than `on` and
    the ts columns are carried through with `l_`/`r_` prefixes.
    """
    l = left.withWatermark(left_ts, watermark).select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("l_ts"),
        *[
            F.col(c).alias(f"l_{c}")
            for c in left.columns
            if c not in (on, left_ts)
        ],
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("r_ts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (on, right_ts)
        ],
    )
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS"))
    )
    out = l.join(r, cond)
    return out.select(
        F.col("__k").alias(on),
        "l_ts",
        "r_ts",
        (F.unix_timestamp("r_ts") - F.unix_timestamp("l_ts")).alias("gap_seconds"),
        *[c for c in out.columns if c.startswith("l_") and c != "l_ts"],
        *[c for c in out.columns if c.startswith("r_") and c != "r_ts"],
    )


def start_click_purchase_join_stream(
    spark,
    left_dir: str,
    right_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    schema,
    on: str = "conv_id",
    max_gap_seconds: int = 600,
    available_now: bool = True,
):
    """File-stream wiring for tests / availableNow catch-up runs."""
    lt = spark.readStream.schema(schema).parquet(left_dir)
    rt = spark.readStream.schema(schema).parquet(right_dir)
    joined = stream_stream_interval_join(lt, rt, on, max_gap_seconds=max_gap_seconds)
    writer = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
