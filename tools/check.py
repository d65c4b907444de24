#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet written by graft.Verify, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same parquet tables, sorts columns by name (as the driver does), and
compares row count, schema (loosely: column names), and cell values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cell_eq(a, b) -> bool:
    """STRICT repr equality — the driver hashes the string form of each
    cell, so Decimal('123.40') vs float64 123.4, int64 3 vs float64 3.0
    (DuckDB HUGEINT), and tz-aware vs naive timestamps must all FAIL here
    even when numerically equal. Round 1's float-lenient version passed 14
    queries locally that the real gate hash-rejected."""
    if pd.isna(a) and pd.isna(b):
        return True
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Optional shard spec "i/N": compare only every N-th query starting
    # at i (0-based) — lets tools/carve_gate.sh run N check processes in
    # parallel so one slow oracle doesn't serialize a 415-query compare.
    shard_i, shard_n = 0, 1
    if len(sys.argv) > 3:
        shard_i, shard_n = (int(x) for x in sys.argv[3].split("/"))
        assert 0 <= shard_i < shard_n, "shard spec must be i/N with i < N"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items())[shard_i::shard_n]:
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            failures += 1
            continue
        try:
            exp = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            failures += 1
            continue
        bad = []
        for c in got.columns:
            for i in range(len(got)):
                if not cell_eq(got[c].iloc[i], exp[c].iloc[i]):
                    bad.append((c, i, got[c].iloc[i], exp[c].iloc[i]))
                    if len(bad) > 3:
                        break
            if len(bad) > 3:
                break
        if bad:
            print(f"FAIL {name}: value mismatches {bad[:4]}")
            failures += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
