#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet + oracle_sql.json), then this script runs
each oracle SQL in DuckDB over the sf-dir parquet tables and compares
(columns sorted by name, rows sorted, exact values).

Usage: python3 tools/check_verify.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    import glob
    failures = 0
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = qdir.split("/")[-1]
        try:
            got = pd.concat([pd.read_parquet(p) for p in
                             sorted(glob.glob(f"{qdir}/*.parquet"))],
                            ignore_index=True)
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        # exact compare with dtype coercion to common types
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype != b.dtype:
                    b = b.astype(a.dtype)
                eq = (a == b) | (a.isna() & b.isna())
            except Exception as e:
                mismatch = f"col {c}: dtype issue {a.dtype} vs {b.dtype}: {e}"
                break
            if not eq.all():
                i = (~eq).idxmax()
                mismatch = f"col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r}"
                break
        if mismatch:
            print(f"[FAIL] {name}: {mismatch}")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(g)} rows match")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
