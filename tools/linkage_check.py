#!/usr/bin/env python3
"""sf10 rehearsal cross-check for the two O(n)-output linkage twins.

The committed DuckDB oracles for q_fuzzy_join_agg / q_record_linkage_top1
are the brute-force DEFINITIONS (all-pairs levenshtein / nation-blocked
scoring) — exact and independent, but O(n^2) in the customer count, so
they are only runnable at the driver-gate SFs (<= sf0.1). This script is
the scaled-corpus twin of those oracles: same answers, computed by
independent scalable derivations —

  q_fuzzy_join_agg: deletion-neighborhood blocking IN DUCKDB (the FastSS
  completeness property: two strings within edit distance 1 share a key
  in {s} u {one-char deletions}), exact levenshtein on candidates only.
  The blocking math is shared with the Spark operator, but the execution
  engine, join, and aggregation are DuckDB's.

  q_record_linkage_top1: a from-first-principles ANALYTIC derivation in
  Python, no pair set at all. With the shipped m/u weights, a pair in a
  (nation, segment) block scores >= 1.5 iff sign_agree (TTT = 2.839,
  TTF = 1.586, best non-sign-agree pattern < 1.5), so per id:
    n_matches  = |(nation, seg, sign) group| - 1
    best_score = TTT iff some other member has |bal diff| < 1000 else TTF
    best_partner = min id among TTT partners (balance-sorted sliding
                   window + sparse-table RMQ, excluding self) or min id
                   of the group excluding self
  This is a DIFFERENT algorithm from Spark's blocked-pair plan — a
  stronger cross-check than re-running the same shape.

Usage: tools/linkage_check.py <sfDir> <sparkOutDir>
where <sparkOutDir> holds Verify's q_fuzzy_join_agg.parquet /
q_record_linkage_top1.parquet. Exits non-zero on any mismatch.
"""
import math
import os
import sys
from collections import defaultdict

import duckdb


def rows_set(con, sql):
    return set(map(tuple, con.sql(sql).fetchall()))


def check_fuzzy(con, sf, out):
    got = rows_set(con, f"SELECT id, n_matches, best_partner FROM '{out}/q_fuzzy_join_agg/*.parquet'")
    exp = rows_set(con, f"""
        WITH k AS (
          SELECT c_custkey AS id,
                 unnest(list_distinct(list_concat([c_name],
                   list_transform(range(1, greatest(length(c_name), 1) + 1),
                     i -> substr(c_name, 1, i - 1) ||
                          substr(c_name, i + 1, length(c_name)))))) AS key
          FROM '{sf}/customer.parquet'),
        cand AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM k a JOIN k b USING (key) WHERE a.id < b.id),
        m AS (
          SELECT id_a, id_b
          FROM cand
          JOIN '{sf}/customer.parquet' ca ON ca.c_custkey = id_a
          JOIN '{sf}/customer.parquet' cb ON cb.c_custkey = id_b
          WHERE levenshtein(ca.c_name, cb.c_name) <= 1),
        sym AS (SELECT id_a AS id, id_b AS partner FROM m
                UNION ALL SELECT id_b, id_a FROM m)
        SELECT CAST(id AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(min(partner) AS BIGINT)
        FROM sym GROUP BY id""")
    assert got == exp, (
        f"q_fuzzy_join_agg mismatch: {len(got - exp)} unexpected, "
        f"{len(exp - got)} missing; sample={list(exp ^ got)[:3]}")
    print(f"q_fuzzy_join_agg     OK rows={len(got)}")


class Rmq:
    """sparse-table range-min over an int array (query [l, r] inclusive)"""

    def __init__(self, a):
        self.t = [list(a)]
        k = 1
        while (1 << k) <= len(a):
            prev, half = self.t[-1], 1 << (k - 1)
            self.t.append([min(prev[i], prev[i + half])
                           for i in range(len(a) - (1 << k) + 1)])
            k += 1

    def query(self, l, r):
        if l > r:
            return None
        k = (r - l + 1).bit_length() - 1
        return min(self.t[k][l], self.t[k][r - (1 << k) + 1])


def check_top1(con, sf, out):
    got = rows_set(con, f"SELECT id, best_score, best_partner, n_matches "
                        f"FROM '{out}/q_record_linkage_top1/*.parquet'")
    groups = defaultdict(list)
    for ck, nat, seg, bal in con.sql(
            f"SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal "
            f"FROM '{sf}/customer.parquet'").fetchall():
        groups[(nat, seg, bal > 0)].append((bal, ck))
    s_ttt = round(math.log(0.9 / 0.2) + math.log(0.95 / 0.5)
                  + math.log(0.6 / 0.3), 6)
    s_ttf = round(math.log(0.9 / 0.2) + math.log(0.95 / 0.5)
                  + math.log((1 - 0.6) / (1 - 0.3)), 6)
    exp = set()
    for members in groups.values():
        n = len(members)
        if n < 2:
            continue  # no partner, no match row
        members.sort()
        bals = [b for b, _ in members]
        ids = [i for _, i in members]
        rmq = Rmq(ids)
        gmin1, gmin2 = sorted(ids)[:2]
        lo = 0
        hi = 0
        for i, (bal, ck) in enumerate(members):
            while bals[i] - bals[lo] >= 1000:
                lo += 1
            hi = max(hi, i)
            while hi + 1 < n and bals[hi + 1] - bals[i] < 1000:
                hi += 1
            best = min(x for x in (rmq.query(lo, i - 1), rmq.query(i + 1, hi))
                       if x is not None) if hi - lo >= 1 else None
            if best is not None:
                exp.add((ck, s_ttt, best, n - 1))
            else:
                exp.add((ck, s_ttf, gmin1 if ck != gmin1 else gmin2, n - 1))
    assert got == exp, (
        f"q_record_linkage_top1 mismatch: {len(got - exp)} unexpected, "
        f"{len(exp - got)} missing; sample={list(exp ^ got)[:3]}")
    print(f"q_record_linkage_top1 OK rows={len(got)}")


def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    fails = 0
    for name, fn in (("q_fuzzy_join_agg", check_fuzzy),
                     ("q_record_linkage_top1", check_top1)):
        if not os.path.exists(os.path.join(out, name)):
            print(f"{name:20s} SKIP (no spark output)")
            continue
        try:
            fn(con, sf, out)
        except AssertionError as e:
            print(f"{name:20s} FAIL {e}")
            fails += 1
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
