#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
sorts columns by name / rows by all columns, and compares values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_bad = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output files")
            n_bad += 1
            continue
        got = con.sql(
            f"SELECT * FROM read_parquet({files!r})").df()
        if name not in oracles:
            print(f"rows {name}: {len(got)} rows (no oracle, rows-only)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_bad += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            n_bad += 1
            continue
        mism = []
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a.isna() & b.isna()) | (a == b)
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                mism.append((c, a[bad], b[bad], int((~eq).sum())))
        if mism:
            print(f"FAIL {name}: {len(g)} rows; value mismatches: {mism[:3]}")
            n_bad += 1
        else:
            # flag dtype drift that an exact-hash driver might reject
            dt = [(c, str(g[c].dtype), str(w[c].dtype))
                  for c in g.columns if g[c].dtype != w[c].dtype]
            note = f" [dtype drift: {dt}]" if dt else ""
            print(f"OK   {name}: {len(g)} rows{note}")
    print(f"\n{len(names) - n_bad}/{len(names)} green")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
