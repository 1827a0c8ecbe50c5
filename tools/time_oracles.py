#!/usr/bin/env python3
"""Time individual DuckDB oracle entries (the gate-cost profiler for r19).

Usage: python3 tools/time_oracles.py <sfDir> <oracle_sql.json> [name ...]

Runs each named oracle (default: every entry) against the sfDir parquet
views, prints wall seconds + row count per entry, sorted slowest-first at
the end. A per-entry TIMEOUT is NOT imposed — interrupt the script instead
(the point is to see the true cost the driver's gate pays).
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(oracle_path))
    names = only if only else sorted(oracles)
    out = []
    for name in names:
        if name not in oracles:
            print(f"SKIP {name}: not in oracle file")
            continue
        t0 = time.time()
        try:
            n = len(con.sql(oracles[name]).df())
            dt = time.time() - t0
            out.append((dt, name, n))
            print(f"{dt:8.2f}s  {name}  ({n} rows)", flush=True)
        except Exception as e:
            dt = time.time() - t0
            out.append((dt, name, -1))
            print(f"{dt:8.2f}s  {name}  ERROR {e}", flush=True)
    print("\n== slowest first ==")
    for dt, name, n in sorted(out, reverse=True):
        print(f"{dt:8.2f}s  {name}  ({n} rows)")
    print(f"total {sum(d for d, _, _ in out):.2f}s over {len(out)} entries")
    return 0


if __name__ == "__main__":
    sys.exit(main())
