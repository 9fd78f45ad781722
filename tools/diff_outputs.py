#!/usr/bin/env python3
"""Value-level diff of two graft.Verify output dirs (golden vs candidate):
per query, read all parquet parts, sort columns+rows, compare exactly.
Used by the optimization round to prove a restructured query still computes
the identical result before trusting it to the driver's oracle.

Usage: python3 tools/diff_outputs.py /tmp/golden001 /tmp/new001
"""
import glob
import sys

import pandas as pd


def load(qdir: str) -> pd.DataFrame:
    df = pd.concat([pd.read_parquet(p) for p in sorted(glob.glob(f"{qdir}/*.parquet"))],
                   ignore_index=True)
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(golden: str, cand: str) -> int:
    gq = {d.split("/")[-1] for d in glob.glob(f"{golden}/q*")}
    cq = {d.split("/")[-1] for d in glob.glob(f"{cand}/q*")}
    failures = 0
    for name in sorted(gq | cq):
        if name not in gq or name not in cq:
            print(f"[FAIL] {name}: present only in {'golden' if name in gq else 'candidate'}")
            failures += 1
            continue
        g, c = load(f"{golden}/{name}"), load(f"{cand}/{name}")
        if list(g.columns) != list(c.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(c.columns)}")
            failures += 1
        elif len(g) != len(c):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(c)}")
            failures += 1
        elif not g.equals(c):
            neq = (g != c) & ~(g.isna() & c.isna())
            cols = [col for col in g.columns if neq[col].any()]
            print(f"[FAIL] {name}: value mismatch in columns {cols}")
            failures += 1
        else:
            print(f"[OK]   {name}: {len(g)} rows identical")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
