"""HLL sketch (portable registers, mergeability) and bucketed co-located
joins (no shuffle exchange on the join key)."""

import pytest
from pyspark.sql import functions as F


def test_hll_estimate_accuracy_and_merge(spark):
    from chronographer_spark.operators.sketches import (
        hll_distinct,
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    # event_id: 1000 distinct — inside HLL's working range (no small-range
    # correction is applied, by design: bit-portability over bias tweaks;
    # below ~m distinct values the raw estimator overshoots, documented)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    exact = ev.select("event_id").distinct().count()
    est = hll_distinct(ev, "event_id").first()["estimate"]
    # m=64 -> ~13% std error; assert a loose 3-sigma band
    assert abs(est - exact) / exact < 0.4, (est, exact)

    # mergeability: sketch(a) ⊕ sketch(b) == sketch(a ∪ b)
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = hll_merge(hll_registers(a, "event_id"), hll_registers(b, "event_id"))
    est_merged = hll_estimate(merged).first()["estimate"]
    assert est_merged == est


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts join
    with zero ShuffleExchange operators in the executed plan."""
    from chronographer_spark.io.catalog import Catalog

    cat = Catalog(spark, str(tmp_path))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    facts = ev.select("event_id", "user_id", "event_type")
    dims = (
        ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    )
    cat.write_bucketed(facts, "facts_b", 8, "user_id", sort_cols=["user_id"])
    cat.write_bucketed(dims, "dims_b", 8, "user_id", sort_cols=["user_id"])

    try:
        f = cat.read_bucketed("facts_b")
        d = cat.read_bucketed("dims_b")
        joined = (
            f.hint("merge")  # force SMJ so absence of exchange is meaningful
            .join(d, "user_id")
            .select("event_id", "n_events")
        )
        n = joined.count()
        assert n == facts.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS facts_b")
        spark.sql("DROP TABLE IF EXISTS dims_b")


def test_ann_recall_vs_brute_force(spark):
    """IVF and LSH recall@10 against exact brute force — the evaluation job
    a training-data pipeline runs before trusting an ANN index. All hashes
    are seeded/deterministic, so these floors are stable, not flaky."""
    from chronographer_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, qs, k=10).collect()}
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in ivf_topk(emb, qs, k=10, n_centroids=8, n_probe=3).collect()
    }
    lsh = {
        (r["query_id"], r["vec_id"])
        for r in lsh_topk(emb, qs, k=10, n_planes=4, n_tables=2).collect()
    }
    assert len(bf & ivf) / len(bf) >= 0.5  # measured 0.58
    assert len(bf & lsh) / len(bf) >= 0.15  # measured 0.30
