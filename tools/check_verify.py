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
    import os
    failures = 0
    present = {d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*")}
    # Reconcile against Verify's manifest: a query that THREW wrote no
    # q-dir, and a dir-glob alone would silently skip it (gate reads green
    # on a crashing query). Stale dirs from a reused out_dir are flagged
    # too — they would be compared as current otherwise.
    expected = present
    manifest_path = f"{out_dir}/_manifest.json"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        expected = set(manifest["ran"])
        for name in sorted(manifest["failed"]):
            print(f"[FAIL] {name}: query threw in graft.Verify (no output written)")
            failures += 1
        for name in sorted(expected - present - set(manifest["failed"])):
            print(f"[FAIL] {name}: ran but no output directory present")
            failures += 1
        # A filtered dev run records only its subset in "ran"; output dirs
        # from an earlier full run in the same out_dir are then expected,
        # not stale — only an UNFILTERED run asserts the full inventory.
        if not manifest.get("filtered", False):
            for name in sorted(present - expected):
                print(f"[FAIL] {name}: stale output dir (not in this run's manifest)")
                failures += 1
    for name in sorted(present & expected):
        qdir = f"{out_dir}/{name}"
        try:
            got = pd.concat([pd.read_parquet(p) for p in
                             sorted(glob.glob(f"{qdir}/*.parquet"))],
                            ignore_index=True)
        except Exception as e:
            print(f"[FAIL] {name}: cannot read spark output: {e}")
            failures += 1
            continue
        if name not in oracles:
            # engine-native ops DuckDB cannot express: the driver records a
            # rows-only check — zero rows is still a failure (every query
            # must produce output on the testdata)
            if len(got) == 0:
                print(f"[FAIL] {name}: rows-only query returned 0 rows")
                failures += 1
            else:
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
        # exact compare, coercing BOTH sides to the PROMOTED common dtype:
        # downcasting the oracle to Spark's dtype (float64->float32,
        # int64->int32) would round/wrap the oracle value onto a genuinely
        # wrong Spark value and print OK for a real mismatch
        import numpy as np
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                if a.dtype != b.dtype:
                    try:
                        common = np.promote_types(a.dtype, b.dtype)
                        a, b = a.astype(common), b.astype(common)
                    except TypeError:  # non-numeric (object etc.)
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
