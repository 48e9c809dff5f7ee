"""Scalar functions, scan filters, skew-salted joins, graph algorithms,
random-walk mode, lineage columns."""

import pytest
from pyspark.sql import functions as F


def test_iso_day_slice_and_year(spark):
    from chronographer_spark.functions import iso_day_slice, year_of_uri

    df = spark.createDataFrame(
        [('"1789-07-14T00:00:00"^^xsd', "ev_1795_x"), ('"2000-01-02"', "no_year")],
        ["lit", "uri"],
    )
    got = df.select(
        iso_day_slice(F.col("lit")).alias("d"), year_of_uri(F.col("uri"), "1789").alias("y")
    ).collect()
    assert got[0].d == "1789-07-14" and got[0].y == "1795"
    assert got[1].d == "2000-01-02" and got[1].y == "1789"


def test_last_segment_encode_window(spark):
    from chronographer_spark.functions import (
        last_path_segment,
        lexical_in_window,
        uri_encode,
    )

    df = spark.createDataFrame(
        [("http://ex/class/MilitaryConflict", "Alice Smith", "1795-01-01")],
        ["uri", "name", "d"],
    )
    row = df.select(
        last_path_segment(F.col("uri")).alias("seg"),
        uri_encode(F.col("name")).alias("enc"),
        lexical_in_window(F.col("d"), "1789-01-01", "1804-12-31").alias("inw"),
    ).first()
    assert row.seg == "militaryconflict"
    assert row.enc == "Alice%20Smith"
    assert row.inw is True


def test_uri_encode_urllib_quote_parity(spark):
    """C8 — bit-exact `urllib.parse.quote` parity (the reference's encoder,
    frame_semantics.py:16 / np_encoding.py:8) on a unicode torture fixture,
    for both the default safe='/' and the np_encoding safe=':/'."""
    from urllib.parse import quote

    from chronographer_spark.functions import uri_encode

    cases = [
        "with space", 'quo"te`', "a/b/c", "tilde~x", "star*x", "plus+x",
        "percent%x", "reserved&?#=;,@$", "café Müller", "日本語テスト",
        "emoji 🎉 mix", "newline\nand\ttab", "Außenseiter (1979) [v2]",
        "100%", "a+b=c", "élan~/café*", "dbr:Révolution_française",
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = [r["e"] for r in df.select(uri_encode(F.col("s")).alias("e")).collect()]
    assert got == [quote(s) for s in cases]
    got2 = [
        r["e"] for r in df.select(uri_encode(F.col("s"), safe=":/").alias("e")).collect()
    ]
    assert got2 == [quote(s, safe=":/") for s in cases]


def test_normalize_literals_reference_semantics(spark):
    from chronographer_spark.operators.scan_filters import normalize_literals

    df = spark.createDataFrame(
        [
            ("s", "p", '"1789-07-14T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>'),
            ("s", "p", '"1795"^^<http://www.w3.org/2001/XMLSchema#integer>'),
            ("s", "p", '"Unknown"@en'),
            ("s", "p", "plain"),
        ],
        ["subject", "predicate", "object"],
    )
    got = [r.object for r in normalize_literals(df).collect()]
    assert got == ["1789-07-14", "1795", "plain"]


def test_salted_join_matches_plain_join(spark):
    from chronographer_spark.operators.skew import salted_join

    # hub key: 90% of big rows share key 1 (the skew fixture)
    big = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(1000)], ["k", "v"]
    )
    small = spark.createDataFrame([(1, "hub"), (2, "rare")], ["k", "name"])
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt_buckets=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count(spark):
    from chronographer_spark.operators.skew import salted_count

    df = spark.createDataFrame([("hub",)] * 500 + [("rare",)] * 3, ["k"])
    got = {r.k: r["count"] for r in salted_count(df, ["k"]).collect()}
    assert got == {"hub": 500, "rare": 3}


def test_transitive_closure_small(spark):
    from chronographer_spark.operators.graph_algos import transitive_closure

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")], ["child", "parent"]
    )
    got = {(r.child, r.ancestor) for r in transitive_closure(edges).collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"), ("x", "y"),
    }


def test_n_hop(spark):
    from chronographer_spark.operators.graph_algos import n_hop_neighbors

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], ["src", "dst"]
    )
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {(r.node, r.hop) for r in n_hop_neighbors(edges, seeds, hops=2).collect()}
    assert got == {("a", 0), ("b", 1), ("c", 2)}


def test_random_walk_mode(spark, tmp_path):
    from tests.test_search_core import _search

    gs = _search(spark, str(tmp_path), "rw", iterations=3)
    gs.cfg.walk = "random"
    gs.cfg.uri_limit = 10
    res = gs.run()
    assert res["last_iteration"] >= 2
    state = gs.final_state()
    assert state["visited"].count() >= 2  # seed + sampled frontier


def test_lineage_columns(spark):
    from chronographer_spark.io.catalog import partition_metrics, with_lineage

    df = spark.createDataFrame([(i,) for i in range(100)], ["x"]).repartition(4)
    tagged = with_lineage(df, "runX", "stageY")
    assert {"lineage_run_id", "lineage_stage", "lineage_partition", "lineage_ts"} <= set(
        tagged.columns
    )
    m = partition_metrics(tagged)
    rows = m.collect()
    assert sum(r.rows_out for r in rows) == 100
    assert all(r.lineage_run_id == "runX" for r in rows)


def test_pagerank_hand_computed(spark):
    """Fixed-iteration PageRank against hand-computed values on a 4-node
    graph (a<-c, a<-d, b<-a, c<-b; all out-degrees 1)."""
    from chronographer_spark.operators.graph_algos import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], ["src", "dst"]
    )
    r = {row["node"]: row["rank"] for row in pagerank(edges, iterations=2).collect()}
    # iter1: a=0.15+0.85*2=1.85, b=1.0, c=1.0, d=0.15
    # iter2: a=0.15+0.85*(1.0+0.15)=1.1275, b=0.15+0.85*1.85=1.7225, c=1.0, d=0.15
    assert abs(r["a"] - 1.1275) < 1e-9
    assert abs(r["b"] - 1.7225) < 1e-9
    assert abs(r["c"] - 1.0) < 1e-9
    assert abs(r["d"] - 0.15) < 1e-9
