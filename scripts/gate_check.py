#!/usr/bin/env python3
"""Ad-hoc replica of the driver's correctness gate for a subset of queries.

Usage: python scripts/gate_check.py <sf_dir> [query ...]
       python scripts/gate_check.py --smoke [N] [sf_dir]   # per-commit gate
Runs each named query (default: all) on Spark and its oracle on DuckDB over
the same parquet tables, compares rows/columns/values, prints one line per
query. Mirrors tests/test_oracle_queries.py's normalization.

--smoke runs CORE_QUERIES (a fixed 5-query production core: flagship,
canonicalization CC, the iterative search driver, 2-hop expansion, MinHash
LSH) PLUS a deterministic N-query sample (default 30) seeded by the current
commit hash — the pre-commit mini-gate: the core is exercised on EVERY
commit (round-4 lesson: the driver's 50-row gate rotated entirely to new
stats queries, leaving the core un-gated by the driver file), while the
rotating sample keeps queries outside any rotation from rotting between
full sweeps. Run it before committing registry or operator changes; a full
sweep (no --smoke) closes each session.
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Always-on smoke core (round-5 judge item 5): the five production-path
# queries every smoke run must exercise regardless of the rotating sample.
CORE_QUERIES = [
    "flagship_event_graph",
    "cc_canonical",
    "event_search_2iter",
    "two_hop_expand",
    "minhash_lsh_pairs",
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


def _smoke_sample(all_names: list[str], n: int) -> list[str]:
    """Deterministic per-commit sample: seed = current HEAD hash, so every
    commit exercises a DIFFERENT 30-query slice of the registry and the
    258 queries outside the driver's 50-row rotation can't rot silently
    between full sweeps. Falls back to seed 0 outside a git checkout."""
    import hashlib
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, check=True,
            cwd=__file__.rsplit("/", 2)[0],
        ).stdout.strip()
    except Exception:  # noqa: BLE001
        head = "0"
    ranked = sorted(
        all_names,
        key=lambda q: hashlib.md5(f"{head}:{q}".encode()).hexdigest(),
    )
    return sorted(ranked[:n])


def main() -> int:
    argv = sys.argv[1:]
    smoke = 0
    if "--smoke" in argv:
        i = argv.index("--smoke")
        # optional count after the flag, default 30
        if i + 1 < len(argv) and argv[i + 1].isdigit():
            smoke = int(argv[i + 1])
            del argv[i : i + 2]
        else:
            smoke = 30
            del argv[i]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from chronographer_spark import entry_queries
    from chronographer_spark.session import get_spark

    names = argv[1:] or sorted(entry_queries.QUERIES)
    if smoke and len(argv) <= 1:
        sample = [q for q in _smoke_sample(names, smoke) if q not in CORE_QUERIES]
        names = CORE_QUERIES + sample
        print(f"smoke core-5 + {len(sample)} sampled (of "
              f"{len(entry_queries.QUERIES)}): {' '.join(names)}")
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
