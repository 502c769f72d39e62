#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB with views named after the tables
in <sfDir>, and compares: schema (column names), row count, and a hash of all
values with columns sorted by name and rows sorted by all columns.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists → tuples so they sort/hash
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     getattr(v, "ndim", None) == 1 and not isinstance(v, str)).any():
            df[c] = df[c].map(lambda v: tuple(v) if not isinstance(v, (str, float, int, type(None))) else v)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    # GRAFT_CHECK_SKIP=q1,q2 skips named queries (e.g. the two
    # quadratic-OUTPUT linkage queries whose 76M-row results are
    # hash-compared directly in DuckDB instead — pandas canon on them
    # takes hours); GRAFT_CHECK_ONLY=q1,q2 restricts to named queries.
    skip = set(filter(None, os.environ.get("GRAFT_CHECK_SKIP", "").split(",")))
    only = set(filter(None, os.environ.get("GRAFT_CHECK_ONLY", "").split(",")))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d))
                   and d not in skip and (not only or d in only))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            status = "ROWS-ONLY ok" if len(got) > 0 else "ROWS-ONLY EMPTY"
            if len(got) == 0: failures += 1
            print(f"{name:28s} {status} rows={len(got)}")
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            failures += 1
            continue
        g, e = canon(got.copy()), canon(exp.copy())
        if sorted(g.columns) != sorted(e.columns):
            print(f"{name:28s} SCHEMA-MISMATCH got={sorted(g.columns)} exp={sorted(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"{name:28s} ROWCOUNT got={len(g)} exp={len(e)}")
            failures += 1
            continue
        try:
            ok = g.astype(str).equals(e.astype(str))
        except Exception:
            ok = False
        if not ok:
            # find first differing cell for debugging
            diff = (g.astype(str) != e.astype(str))
            idx = diff.any(axis=1)
            print(f"{name:28s} VALUE-MISMATCH rows={int(idx.sum())}")
            bad = idx[idx].index[:3]
            for i in bad:
                print("   got:", g.loc[i].to_dict())
                print("   exp:", e.loc[i].to_dict())
            failures += 1
        else:
            print(f"{name:28s} OK rows={len(g)}")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)

main()
