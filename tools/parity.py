#!/usr/bin/env python3
"""Bit-parity compare of two graft.Verify dumps (e.g. local[4] vs
local[32]): every query's parquet must match EXACTLY after a
whole-row sort — partial-aggregation order and partition count must
not leak into any output, which is what makes results reproducible on
a 1000-executor cluster.

Usage: tools/parity.py DUMP_A DUMP_B
"""
import os
import sys

import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    if qa != qb:
        print(f"query sets differ: only-in-A={sorted(qa - qb)} "
              f"only-in-B={sorted(qb - qa)}")
        sys.exit(1)
    con = duckdb.connect()
    bad = []
    for q in sorted(qa):
        pa = os.path.join(a, q, "*.parquet")
        pb = os.path.join(b, q, "*.parquet")
        # symmetric EXCEPT ALL catches row-content AND multiplicity
        # differences; NULLs compare equal under EXCEPT semantics
        n = con.execute(
            f"SELECT (SELECT count(*) FROM "
            f"  (SELECT * FROM read_parquet('{pa}') EXCEPT ALL "
            f"   SELECT * FROM read_parquet('{pb}'))) + "
            f"(SELECT count(*) FROM "
            f"  (SELECT * FROM read_parquet('{pb}') EXCEPT ALL "
            f"   SELECT * FROM read_parquet('{pa}')))").fetchone()[0]
        status = "OK  " if n == 0 else "DIFF"
        print(f"[{status}] {q}" + ("" if n == 0 else f": {n} differing rows"))
        if n:
            bad.append(q)
    print(f"\n{len(qa) - len(bad)} identical, {len(bad)} differ")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
