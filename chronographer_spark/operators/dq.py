"""Declarative data-quality check suite (the Deequ / Great Expectations
shape): a pipeline declares per-column constraints, the runner computes
every metric in ONE aggregation pass and emits one verdict row per check.

The quality gate a 100 TB ingestion runs before a table is published:
completeness, uniqueness, accepted values, value ranges — all exact
integer fractions of one full-scan agg (each check is a conditional-sum
expression; uniqueness rides the same agg as count(distinct)); referential
integrity is its own broadcast/shuffle anti-join count because it touches
a second table. No sampling, no floats: metric_x1e6 = hits*1e6 DIV n.

The reference validates its output graphs structurally one file at a time
(/root/reference/tests and src/build_ng checks are per-graph asserts);
a declarative corpus-level constraint suite is pipeline surface beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: check tuple: (kind, column, param, min_metric_x1e6)
#: kinds: completeness | uniqueness | in_set(param=list) |
#:        in_range(param=(lo, hi) on the raw column) | non_negative


def run_checks(df: DataFrame, checks: list[tuple]) -> DataFrame:
    """Run the declared checks in one aggregation pass.

    Returns (check, column, metric_x1e6, min_x1e6, passed) — one row per
    check, exploded from the single agg row (the broadcast-scalar
    pattern; metrics are evaluated once, never per data row).
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, (kind, col, param, _thr) in enumerate(checks):
        if kind == "completeness":
            aggs.append(F.count(F.col(col)).cast("long").alias(f"__m{i}"))
        elif kind == "uniqueness":
            aggs.append(
                F.countDistinct(F.col(col)).cast("long").alias(f"__m{i}")
            )
        elif kind == "in_set":
            aggs.append(
                F.sum(F.when(F.col(col).isin(list(param)), 1).otherwise(0))
                .cast("long")
                .alias(f"__m{i}")
            )
        elif kind == "in_range":
            lo, hi = param
            aggs.append(
                F.sum(
                    F.when(F.col(col).between(F.lit(lo), F.lit(hi)), 1).otherwise(0)
                )
                .cast("long")
                .alias(f"__m{i}")
            )
        elif kind == "non_negative":
            aggs.append(
                F.sum(F.when(F.col(col) >= 0, 1).otherwise(0))
                .cast("long")
                .alias(f"__m{i}")
            )
        else:
            raise ValueError(f"unknown check kind: {kind}")
    row = df.agg(*aggs)
    structs = []
    for i, (kind, col, _param, thr) in enumerate(checks):
        metric = F.expr(
            f"CASE WHEN __n > 0 THEN __m{i} * 1000000 DIV __n"
            " ELSE CAST(0 AS BIGINT) END"
        )
        structs.append(
            F.struct(
                F.lit(kind).alias("check"),
                F.lit(col).alias("column"),
                metric.alias("metric_x1e6"),
                F.lit(int(thr)).cast("long").alias("min_x1e6"),
                (metric >= F.lit(int(thr))).alias("passed"),
            )
        )
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def referential_check(
    fact: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
) -> DataFrame:
    """Referential-integrity check: fraction of fact rows whose fk exists
    in the dimension's pk set (NULL fks count as violations). One
    broadcastable semi-join + one agg; at scale the dim side is either
    broadcast or a bloom pre-filter (sketches.bloom_build) ahead of the
    exact join.

    Returns (check, column, n_rows, n_orphans, metric_x1e6).
    """
    keys = dim.select(F.col(pk_col).alias("__pk")).dropDuplicates()
    tagged = fact.select(F.col(fk_col).alias("__fk")).join(
        keys, F.col("__fk") == F.col("__pk"), "left"
    )
    return tagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_orphans"),
    ).select(
        F.lit("referential").alias("check"),
        F.lit(fk_col).alias("column"),
        "n_rows",
        "n_orphans",
        F.expr(
            "CASE WHEN n_rows > 0 THEN"
            " (n_rows - n_orphans) * 1000000 DIV n_rows"
            " ELSE CAST(1000000 AS BIGINT) END"
        ).alias("metric_x1e6"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list,
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit over quasi-identifier groups —
    the re-identification screen a privacy review runs before a corpus
    ships: a row whose quasi-identifier combination (e.g. language ×
    source) matches fewer than k rows is re-identifiable by linkage, and
    a group whose SENSITIVE attribute takes few distinct values leaks it
    even at k (hence l-diversity). Exact counts; one map-side-combined
    aggregation over the quasi key.

    Emits one row per quasi group: (group_key, n_rows, l_div, k_ok,
    l_ok) with k_ok = n_rows >= k, l_ok = l_div >= min(k, l threshold
    implied = 2).
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in quasi_cols])
    return (
        df.select(key.alias("group_key"),
                  F.col(sensitive_col).cast("string").alias("sv"))
        .groupBy("group_key")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("sv").alias("l_div"),
        )
        .select(
            "group_key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("l_div").cast("long").alias("l_div"),
            F.expr(f"CAST(CASE WHEN n_rows >= {k} THEN 1 ELSE 0 END AS BIGINT)")
            .alias("k_ok"),
            F.expr("CAST(CASE WHEN l_div >= 2 THEN 1 ELSE 0 END AS BIGINT)")
            .alias("l_ok"),
        )
    )
