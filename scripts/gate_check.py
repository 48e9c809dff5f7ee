#!/usr/bin/env python3
"""Ad-hoc replica of the driver's correctness gate for a subset of queries.

Usage: python scripts/gate_check.py <sf_dir> [query ...]
Runs each named query (default: all) on Spark and its oracle on DuckDB over
the same parquet tables, compares rows/columns/values, prints one line per
query. Mirrors tests/test_oracle_queries.py's normalization.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from chronographer_spark import entry_queries
    from chronographer_spark.session import get_spark

    names = sys.argv[2:] or sorted(entry_queries.QUERIES)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    spark = get_spark(app_name="gate-check", master="local[8]", shuffle_partitions=16)
    failures = 0
    for name in names:
        try:
            got = entry_queries.QUERIES[name](spark, sf_dir).toPandas()
            if name not in entry_queries.ORACLE_SQL:
                print(f"{name}: NO_ORACLE rows={len(got)}")
                continue
            exp = con.sql(entry_queries.ORACLE_SQL[name]).df()
            assert sorted(got.columns) == sorted(exp.columns), (
                f"columns {sorted(got.columns)} vs {sorted(exp.columns)}"
            )
            g, e = _norm(got), _norm(exp)
            assert len(g) == len(e), f"rows {len(g)} vs {len(e)}"
            pd.testing.assert_frame_equal(g, e, check_dtype=False)
            print(f"{name}: OK rows={len(g)}")
        except Exception as exc:  # noqa: BLE001
            failures += 1
            msg = str(exc).replace("\n", " | ")[:400]
            print(f"{name}: FAIL {msg}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
