"""Divergence pins for the Iceberg-shaped catalog shim (round-5 item 7).

The runtime jar is unavailable in this sandbox, so docs/
ICEBERG_CONFORMANCE.md records feature-by-feature conformance and THESE
tests pin each divergent behavior: if the shim ever silently changes
(or a real Iceberg backend is dropped in), the matrix row flips and the
corresponding test fails, forcing the doc to be updated with it.
"""

from __future__ import annotations

import json
import os

import pytest

from chronographer_spark.io.catalog import Catalog, VersionedCatalog


def test_merge_duplicate_delta_keys_divergence(spark, tmp_path):
    """Iceberg MERGE INTO raises on multiple matching delta rows per key;
    the shim silently keeps BOTH delta rows. Pinned so the divergence is
    a documented fact, not a surprise (call sites pass key-unique
    deltas)."""
    cat = Catalog(spark, str(tmp_path))
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    cat.write(base, "t")
    dup = spark.createDataFrame([(2, "x"), (2, "y")], "k long, v string")
    cat.merge_upsert(dup, "t", keys=["k"])
    rows = sorted(map(tuple, cat.read("t").collect()))
    # real MERGE INTO: error; shim: both (2,x) and (2,y) survive
    assert rows == [(1, "a"), (2, "x"), (2, "y")]


def test_schema_add_column_divergence(spark, tmp_path):
    """Iceberg add-column is a metadata operation (old files read NULL);
    the shim's append-mode union FAILS FAST on the mismatch instead of
    evolving."""
    cat = VersionedCatalog(spark, str(tmp_path))
    cat.write(spark.createDataFrame([(1,)], "a long"), "t")
    wider = spark.createDataFrame([(2, "x")], "a long, b string")
    with pytest.raises(Exception, match="(?i)union|resolve|column"):
        cat.write(wider, "t", mode="append")


def test_schema_rename_column_divergence(spark, tmp_path):
    """Iceberg rename is id-based (data preserved under the new name);
    the name-based shim raises on append after a rename."""
    cat = VersionedCatalog(spark, str(tmp_path))
    cat.write(spark.createDataFrame([(1,)], "a long"), "t")
    renamed = spark.createDataFrame([(2,)], "a_new long")
    with pytest.raises(Exception, match="(?i)union|resolve|column"):
        cat.write(renamed, "t", mode="append")


def test_hidden_partitioning_divergence(spark, tmp_path):
    """Iceberg partitions on hidden transforms (days(ts)) without a
    stored column; the shim requires the partition column to exist in
    the data — a transform expression is not resolvable."""
    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "2024-01-01 00:00:00")], "k long, ts string")
    with pytest.raises(Exception, match="(?i)days|column|resolve|not found"):
        cat.write(df, "t", partition_by=["days(ts)"])


def test_concurrent_writer_no_conflict_detection(spark, tmp_path):
    """Iceberg's optimistic commit detects concurrent snapshot
    publication and retries/raises; the shim is last-writer-wins with NO
    conflict detection: two writers who both read v0 publish v1 and v2,
    and the second silently clobbers the first's logical update."""
    cat = VersionedCatalog(spark, str(tmp_path))
    cat.write(spark.createDataFrame([(1, 10)], "k long, v long"), "t")
    base = cat.read("t", version=0)
    # writer A and writer B both derive from v0
    a = base.withColumn("v", base["v"] + 1)
    b = base.withColumn("v", base["v"] + 100)
    va = cat.write(a, "t")
    vb = cat.write(b, "t")
    assert (va, vb) == (1, 2)
    # head reflects ONLY writer B; writer A's update is silently lost
    assert cat.read("t").collect()[0]["v"] == 110
    # (a real Iceberg catalog would have failed B's commit for retry)


def test_crashed_write_invisible(spark, tmp_path):
    """Partial conformance: a crashed write (parquet files present,
    manifest missing) is INVISIBLE to readers — the manifest is the
    commit point, emulating Iceberg's atomic swap at directory
    granularity."""
    cat = VersionedCatalog(spark, str(tmp_path))
    cat.write(spark.createDataFrame([(1,)], "a long"), "t")
    v1 = cat.write(spark.createDataFrame([(2,)], "a long"), "t")
    # simulate a crash: v1's manifest never landed
    os.remove(os.path.join(cat.path("t"), f"v={v1}", "_manifest.json"))
    assert cat._versions("t") == [0]
    assert cat.read("t").collect()[0]["a"] == 1
    # and history() skips it too
    assert [h["version"] for h in cat.history("t")] == [0]


def test_conformance_doc_matrix_rows_exist():
    """Every divergence test named in the matrix exists, and every ❌/⚠
    row names a pin — the doc and the test file cannot drift apart."""
    import pathlib

    doc = (
        pathlib.Path(__file__).parent.parent / "docs" / "ICEBERG_CONFORMANCE.md"
    ).read_text()
    here = pathlib.Path(__file__).read_text()
    for name in (
        "test_merge_duplicate_delta_keys_divergence",
        "test_schema_add_column_divergence",
        "test_schema_rename_column_divergence",
        "test_hidden_partitioning_divergence",
        "test_concurrent_writer_no_conflict_detection",
        "test_crashed_write_invisible",
    ):
        assert name in doc, f"{name} missing from conformance matrix"
        assert name in here
