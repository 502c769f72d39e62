#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark result), runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB with views named after the tables
in <sfDir>, and compares: schema (column names), row count, and a hash of all
values with columns sorted by name and rows sorted by all columns.

Scaled-corpus controls (r18 — what makes a full sf1 compare finish in one
session instead of grinding for hours):

  GRAFT_ORACLE_CACHE=<dir>   persist each oracle's result as parquet, keyed
      by md5(name, the oracle SQL actually used, and the sf dir's table
      fingerprint: file name/size/mtime). A re-run after an interrupt, or a
      second compare of the same corpus, replays the heavy oracles from
      disk. Spark-side outputs are never cached - only the DuckDB side.
  GRAFT_CHECK_ALT=<json>     per-query REPLACEMENT oracle SQL (name -> sql)
      for formulations that are output-identical but scale: e.g. the
      deletion-neighborhood-blocked fuzzy join (FastSS completeness: two
      strings within edit distance 1 share a key in {s} + one-char
      deletions) instead of the O(n^2) all-pairs levenshtein. The alt file
      documents each derivation; the r11 sf1 run adjudicated the blocked
      fuzzy formulation against the brute-force oracle directly.
  GRAFT_CHECK_DUCK_ROWS=N    compare entirely INSIDE DuckDB (count + two
      EXCEPT ALL anti-joins over name-sorted VARCHAR-cast columns) when the
      oracle result exceeds N rows - pandas canonicalization of a 27M-row
      frame takes hours; the set compare takes seconds. Default 2000000;
      0 disables the switch.
"""
import hashlib
import sys, os, json, glob, time
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

def sf_fingerprint(sf_dir):
    desc = []
    for p in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
        st = os.stat(p)
        desc.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
    return "\n".join(desc)


def duck_compare(con, name, got_glob, exp_rel, n_exp):
    """Set-equality compare fully inside DuckDB for huge results: counts,
    then EXCEPT ALL both ways over name-sorted VARCHAR-cast columns (ALL =
    multiset semantics, duplicate rows count)."""
    got_cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM '{got_glob}'").fetchall()]
    exp_cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM {exp_rel}").fetchall()]
    if sorted(got_cols) != sorted(exp_cols):
        return f"SCHEMA-MISMATCH got={sorted(got_cols)} exp={sorted(exp_cols)}"
    n_got = con.sql(f"SELECT count(*) FROM '{got_glob}'").fetchone()[0]
    if n_got != n_exp:
        return f"ROWCOUNT got={n_got} exp={n_exp}"
    sel = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in sorted(got_cols))
    for a, b, tag in ((f"'{got_glob}'", exp_rel, "got-not-exp"),
                      (exp_rel, f"'{got_glob}'", "exp-not-got")):
        extra = con.sql(f"SELECT count(*) FROM (SELECT {sel} FROM {a} "
                        f"EXCEPT ALL SELECT {sel} FROM {b})").fetchone()[0]
        if extra:
            return f"VALUE-MISMATCH {tag}={extra}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    alt_path = os.environ.get("GRAFT_CHECK_ALT", "")
    alts = json.load(open(alt_path)) if alt_path else {}
    cache_dir = os.environ.get("GRAFT_ORACLE_CACHE", "")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    duck_rows = int(os.environ.get("GRAFT_CHECK_DUCK_ROWS", "2000000"))
    sf_fp = sf_fingerprint(sf_dir)
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
        sql = alts.get(name, oracles[name])
        tag = " alt" if name in alts else ""
        t0 = time.time()
        try:
            if cache_dir:
                # one execution, persisted: COPY the oracle result to a
                # fingerprint-keyed parquet (reused on re-runs), compare
                # from the file — in DuckDB when it is huge, else pandas
                key = hashlib.md5(
                    f"{name}\n{sql}\n{sf_fp}".encode()).hexdigest()[:16]
                exp_pq = os.path.join(cache_dir, f"{name}-{key}.parquet")
                if os.path.exists(exp_pq):
                    tag += " cached"
                else:
                    con.sql(f"COPY ({sql}) TO '{exp_pq}' (FORMAT PARQUET)")
                n_exp = con.sql(
                    f"SELECT count(*) FROM '{exp_pq}'").fetchone()[0]
                if duck_rows and n_exp > duck_rows:
                    err = duck_compare(
                        con, name,
                        os.path.join(out_dir, name, "*.parquet"),
                        f"'{exp_pq}'", n_exp)
                    secs = time.time() - t0
                    if err:
                        print(f"{name:28s} {err} [duck{tag} {secs:.1f}s]")
                        failures += 1
                    else:
                        print(f"{name:28s} OK rows={n_exp} "
                              f"[duck{tag} {secs:.1f}s]")
                    continue
                exp = pd.read_parquet(exp_pq)
            else:
                exp = con.sql(sql).df()
        except Exception as e:
            print(f"{name:28s} ORACLE-SQL-ERROR {e}")
            failures += 1
            continue
        oracle_s = time.time() - t0
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
            print(f"{name:28s} OK rows={len(g)} [{oracle_s:.1f}s{tag}]")
    print("FAILURES:", failures)
    sys.exit(1 if failures else 0)

main()
