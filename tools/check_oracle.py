#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB
against views over <sfDir>/*.parquet, and strictly compares: column names
(sorted), row multiset (sorted), exact values.
"""
import sys, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return repr(v)

def rel_rows(rel):
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = sorted(tuple(norm(r[i]) for i in order) for r in rel.fetchall())
    return sorted(c for c in cols), rows

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only: continue
        try:
            got_cols, got_rows = rel_rows(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: reading spark result: {e}"); n_fail += 1; continue
        try:
            exp_cols, exp_rows = rel_rows(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle sql: {e}"); n_fail += 1; continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}"); n_fail += 1; continue
        if len(got_rows) != len(exp_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(exp_rows)}")
            print("  got head:", got_rows[:2]); print("  exp head:", exp_rows[:2])
            n_fail += 1; continue
        bad = [(g, e) for g, e in zip(got_rows, exp_rows) if g != e]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(got_rows)} rows differ; first:")
            print("  got:", bad[0][0]); print("  exp:", bad[0][1])
            n_fail += 1; continue
        print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
