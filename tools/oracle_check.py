#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <verify_out_dir>/<name>/ parquet (graft.Verify output) and the
oracle SQL from <verify_out_dir>/oracle_sql.json, runs the SQL in DuckDB
against views named after the sf tables, canonicalizes both sides
(columns sorted by name, rows sorted, values stringified), and diffs.
Dev tool only -- not part of the engine.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything so dtype differences (decimal vs float repr,
    # tz-aware vs naive) surface as visible diffs
    out = df.astype(str)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        if name not in oracles:
            results[name] = f"ROWS_ONLY ({len(got)} rows)"
            continue
        try:
            exp = canon(con.sql(oracles[name]).df())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if list(got.columns) != list(exp.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(got.columns)} exp={list(exp.columns)}"
        elif len(got) != len(exp):
            results[name] = f"ROWCOUNT_MISMATCH got={len(got)} exp={len(exp)}"
        elif not got.equals(exp):
            neq = (got != exp).any(axis=1)
            idx = neq[neq].index[:3]
            diffs = []
            for i in idx:
                for c in got.columns:
                    if got.at[i, c] != exp.at[i, c]:
                        diffs.append(f"row{i} {c}: got={got.at[i, c]!r} exp={exp.at[i, c]!r}")
            results[name] = "VALUE_MISMATCH " + "; ".join(diffs[:6])
        else:
            results[name] = f"PASS ({len(got)} rows)"
    npass = sum(1 for v in results.values() if v.startswith("PASS"))
    nrows = sum(1 for v in results.values() if v.startswith("ROWS_ONLY"))
    for k, v in sorted(results.items()):
        flag = "ok " if v.startswith(("PASS", "ROWS_ONLY")) else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"\n{npass} PASS + {nrows} rows-only / {len(results)} total")
    sys.exit(0 if npass + nrows == len(results) else 1)


if __name__ == "__main__":
    main()
