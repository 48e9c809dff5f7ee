"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship pipeline on /root/testdata/sf0.001
queries()     -> operator inventory, each (spark, sf_dir) -> DataFrame
oracle_sql()  -> DuckDB-equivalent SQL per query key
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full transcript->SEM-triple pipeline on sf0.001.

    events parquet -> transcripts view -> Arrow-batched mention extraction ->
    event-graph materialization (typing, actors, tools, begin/end timestamps,
    sub-event + temporal ordering edges).
    """
    from chronographer_spark.data.transcripts import transcripts_from_events
    from chronographer_spark.graph.materialize import build_event_graph

    tx = transcripts_from_events(spark, "/root/testdata/sf0.001")
    return build_event_graph(tx)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from chronographer_spark import entry_queries

    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    from chronographer_spark import entry_queries

    return entry_queries.ORACLE_SQL
