#!/usr/bin/env python3
"""Scale a testdata SF directory by key-shifted replication (bench-only).

Usage: tools/scale_testdata.py <srcDir> <dstDir> <copies>

Builds an N-times-larger corpus with the SAME distributions and join
fan-outs as the source: every copy shifts each int64 key space by
copy * 100M, so intra-copy relationships (orders->customer,
lineitem->orders, events.user_id<->custkey) replicate exactly and no
cross-copy joins appear. Fixed dimensions (region, nation) stay single.
Copies of `documents` suffix EVERY token with the copy id (recomputing
n_chars) so copies share no shingles — a whole-doc suffix leaves jaccard
~0.99 and turns the scaled corpus into 10-way near-duplicate clusters,
which makes every dedup query's pair OUTPUT (and so its runtime) scale
quadratically in the copy count: that measures the corpus, not the
algorithm. `embeddings` copies rotate the vector by the copy id for the
same reason (norm-preserving, decorrelated). Used for the sf1 scaling
rehearsal — the driver's read-only /root/testdata is never touched.
"""
import os
import sys

import duckdb

SHIFT = 100_000_000

# int64 key columns to shift per table; None = replicate once (fixed dims)
KEYS = {
    "region": None,
    "nation": None,
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEYS.items():
        if only is not None and table not in only:
            continue
        p = os.path.join(src, f"{table}.parquet")
        out = os.path.join(dst, f"{table}.parquet")
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{p}'").fetchall()]
        if keys is None:
            con.sql(f"COPY (SELECT * FROM '{p}') TO '{out}' (FORMAT PARQUET)")
        else:
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + c.i * {SHIFT} AS {c}")
                elif table == "documents" and c == "text":
                    exprs.append(
                        "CASE WHEN c.i = 0 THEN text ELSE"
                        " regexp_replace(text, '(\\S+)', '\\1c' || c.i, 'g')"
                        " END AS text")
                elif table == "documents" and c == "n_chars":
                    exprs.append(
                        "CASE WHEN c.i = 0 THEN n_chars ELSE"
                        " length(regexp_replace(text, '(\\S+)', '\\1c' || c.i, 'g'))"
                        " END AS n_chars")
                elif table == "embeddings" and c == "embedding":
                    exprs.append(
                        "list_concat(embedding[(c.i % len(embedding)) + 1:len(embedding)],"
                        " embedding[1:(c.i % len(embedding))])::FLOAT[] AS embedding")
                else:
                    exprs.append(c)
            sel = ", ".join(exprs)
            con.sql(
                f"COPY (SELECT {sel} FROM '{p}', range({copies}) c(i)) "
                f"TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table:12s} -> {n} rows")


if __name__ == "__main__":
    main()
