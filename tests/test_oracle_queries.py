"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count + column names + order-insensitive values."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6)
        else:
            try:
                pdf[c] = pdf[c].astype("Int64")
            except (TypeError, ValueError):
                pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _query_names():
    import __spark_entry__ as entry_mod

    return sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, ddb, name):
    import __spark_entry__ as entry_mod

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    got = qs[name](spark, SF_DIR).toPandas()
    if name not in oracles:
        assert len(got) >= 0
        return
    exp = ddb.sql(oracles[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"columns differ: {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    g, e = _norm(got), _norm(exp)
    assert len(g) == len(e), f"row counts differ: {len(g)} vs {len(e)}"
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subject", "predicate", "object"}
