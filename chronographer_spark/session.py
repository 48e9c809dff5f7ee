"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB design point, scaled down for local testing:
AQE on (runtime re-plan + skew-join split), Arrow on (every extraction UDF
is Arrow-batched), shuffle partitions sized to the local core count
(on a real cluster this is set per-job to ~2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "chronographer_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config."""
    cpus = DEFAULT_CPUS
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions, skew-join splitting,
        # broadcast conversion from runtime stats — essential at 100TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow transfer for every pandas UDF (extraction hot path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local[N] runs every executor thread in the driver JVM: size the heap
        # for N concurrent hash-aggregate tasks or they spill and serialize
        # on disk I/O (measured: 2x wall-clock at local[32] with an 8g heap)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        # throughput collector: this engine is a batch workload with heavy
        # short-lived string allocation; measured ~10% faster than G1 here
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for key, val in (extra_conf or {}).items():
        builder = builder.config(key, val)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
