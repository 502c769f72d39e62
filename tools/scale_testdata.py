#!/usr/bin/env python3
"""Scale a testdata SF directory by key-shifted replication (bench-only).

Usage: tools/scale_testdata.py <srcDir> <dstDir> <copies> [onlyTables]
       [--zipf] [--late]

--late: event-time adversarial axis for the events table. Event TIMES are
kept, but the physical row order becomes ARRIVAL order: ~5% of events
arrive 1-30 min after their event time (deterministic hash of event_id),
so row order != event-time order and every streaming consumer sees
per-key disorder; ~1% of events are exactly duplicated, re-arriving 90 s
after the original (at-least-once redelivery). Batch queries must be
insensitive to row order, and a file-source streaming run over the table
replays realistic lateness; the duplicate rows are part of the corpus
(the batch oracle sees them too).

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


def zipf_expr(table, col, con, src):
    """Deterministic hash-seeded skew rewrites (--zipf). Key-shifted
    replication preserves the source's UNIFORM key distributions, so the
    skew-handling machinery (capHotKeys, salted aggs, AQE skew joins) is
    otherwise only ever exercised by synthetic fixtures. This mode makes
    the adversarial corpus the brief asks for:
      - one HOT USER owning ~10% of all events (the hot-IP analogue for
        the batch catalog's groupBy/sessionize keys) — GLOBAL across
        copies, so the events->customer join funnels 10% of the fact side
        into one key;
      - orders.o_custkey ~ bounded-Pareto(a=1.2) ranks over the copy-0
        customer range (inverse-CDF on a hash-uniform), the Zipf join-key
        axis for every orders/customer join;
      - lineitem.l_partkey likewise over the part range;
      - one 100x-HOT CATEGORY: ~95% of events collapse to event_type
        'click' (~100x each residual category).
    All rewrites are pure hash functions of the row's own key — the
    corpus stays deterministic and re-generable."""
    if table == "events" and col == "user_id":
        # non-hot rows keep the per-copy key shift (intra-copy joins intact)
        return ("CASE WHEN hash(event_id) % 10 = 0 THEN 7 "
                f"ELSE user_id + c.i * {SHIFT} END AS user_id")
    if table == "events" and col == "event_type":
        return ("CASE WHEN hash(event_id * 7) % 21 != 0 THEN 'click' "
                "ELSE event_type END AS event_type")
    if (table, col) in (("orders", "o_custkey"), ("lineitem", "l_partkey")):
        ref, key = (("customer", "c_custkey") if table == "orders"
                    else ("part", "p_partkey"))
        lo, n = con.sql(
            f"SELECT min({key}), count(*) FROM '{os.path.join(src, ref + '.parquet')}'"
        ).fetchone()
        src_key = "o_orderkey" if table == "orders" else "l_orderkey"
        # bounded-Pareto inverse CDF on [1, n], a = 1.2:
        # x = (1 - u * (1 - n^(1-a)))^(1/(1-a))
        u = f"((hash({src_key} * 31) % 1000000) + 0.5) / 1000000.0"
        x = f"pow(1.0 - ({u}) * (1.0 - pow({n}, -0.2)), -5.0)"
        return (f"CAST(least(greatest(floor({x}), 1), {n}) - 1 + {lo} "
                f"AS BIGINT) AS {col}")
    return None


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rest = sys.argv[4:]
    zipf = "--zipf" in rest
    late = "--late" in rest
    rest = [a for a in rest if a not in ("--zipf", "--late")]
    only = set(rest[0].split(",")) if rest else None
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
                ze = zipf_expr(table, c, con, src) if zipf else None
                if ze is not None:
                    # skew rewrite wins over the key shift: the hot/Pareto
                    # keys deliberately point into the copy-0 ranges so the
                    # skew is GLOBAL, not per-copy
                    exprs.append(ze)
                elif c in keys:
                    exprs.append(f"{c} + c.i * {SHIFT} AS {c}")
                elif table == "customer" and c == "c_name":
                    # copies must not duplicate names: identical names make
                    # every name a copies-sized clique and the fuzzy-join /
                    # record-linkage match sets quadratic IN THE COPY COUNT
                    # (zipf1 measured q_fuzzy_join_agg at 226 s for 10
                    # copies — the corpus, not the algorithm; the documents
                    # token-suffix exists for the same reason). The suffix
                    # DOUBLES each copy-id digit ('x3' -> '33', 12 ->
                    # '1122'), so two distinct suffixes always differ by
                    # >= 2 edits and no cross-copy pair can enter the
                    # edit-distance<=1 match set.
                    exprs.append(
                        "CASE WHEN c.i = 0 THEN c_name ELSE c_name || "
                        "list_aggregate(list_transform(string_split(c.i::VARCHAR, ''),"
                        " d -> d || d), 'string_agg', '') END AS c_name")
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
            if late and table == "events":
                # arrival disorder + at-least-once duplicates (see module
                # doc). All hash-deterministic; 5% late 1-30 min, 1% dup.
                con.sql(
                    f"COPY (WITH base AS (SELECT {sel} "
                    f"  FROM '{p}', range({copies}) c(i)), "
                    "arr AS (SELECT *, epoch(ts) + CASE "
                    "    WHEN hash(event_id * 13) % 20 = 0 "
                    "    THEN 60 + (hash(event_id * 17) % 1740) "
                    "    ELSE 0 END AS __arrival FROM base) "
                    "SELECT * EXCLUDE (__arrival) FROM ("
                    "  SELECT * FROM arr UNION ALL "
                    "  SELECT * REPLACE (__arrival + 90 AS __arrival) "
                    "  FROM arr WHERE hash(event_id * 19) % 100 = 0) "
                    f"ORDER BY __arrival, event_id) TO '{out}' (FORMAT PARQUET)")
            else:
                con.sql(
                    f"COPY (SELECT {sel} FROM '{p}', range({copies}) c(i)) "
                    f"TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table:12s} -> {n} rows")


if __name__ == "__main__":
    main()
