#!/usr/bin/env python3
"""Generate larger scale factors of the driver's synthetic testdata.

Dev-only tooling (like check.py): the driver ships sf{0.001,0.01,0.1}
read-only; scale-evidence runs (sf1+) need the same tables at 10x+,
which this script synthesizes with the SAME schemas, key ranges, and
measured distributions as the driver data (uniform dims, Poisson(4)
lines-per-order with zero-line orders absent, exponential(50) event
values, ~4% near-dup documents built by copying an earlier doc and
appending " dup", unit-norm 64-d embeddings, etc). Deterministic under
--seed; row counts scale linearly from the sf0.1 reference counts.

NOT byte-identical to what the driver's own generator would emit at
sf1 (its code is not available) — distribution-compatible, which is
what bench scaling curves and self-consistent Spark-vs-DuckDB
correctness checks need.

Usage: tools/gen_sf.py --sf 1 --out /tmp/graft_testdata/sf1 [--seed 42]
"""
import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/testdata/sf0.1"  # distributions + dimension tables source
REF_SF = 0.1

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
STATUSES = ["O", "P", "F"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "zh"]


def write(out, name, table):
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def day_range(start, end):
    a = np.datetime64(start)
    return a, int((np.datetime64(end) - a) / np.timedelta64(1, "D"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    mult = args.sf / REF_SF
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    n_cust = int(15000 * mult)
    n_supp = int(1000 * mult)
    n_part = int(20000 * mult)
    n_ord = int(150000 * mult)
    n_ev = int(100000 * mult)
    n_users = int(1500 * mult)
    n_docs = int(5000 * mult)
    n_emb = int(2000 * mult)

    # dimension tables are SF-invariant: copy them verbatim
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{REF}/{t}.parquet"),
                       os.path.join(args.out, f"{t}.parquet"))
        print(f"  {t}: copied from {REF}")

    write(args.out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(rng.choice(SEGMENTS, n_cust)),
    }))

    write(args.out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    write(args.out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{rng.choice(ADJS)} {rng.choice(NOUNS)}" for _ in range(n_part)],
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(rng.choice(PTYPES, n_part)),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 1),
    }))

    od_start, od_days = day_range("1995-01-01", "2001-08-01")
    odate = od_start + rng.integers(0, od_days + 1, n_ord).astype("timedelta64[D]")
    write(args.out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(STATUSES, n_ord)),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(odate.astype("datetime64[ms]"), pa.timestamp("ms")),
        "o_orderpriority": pa.array(rng.choice(PRIORITIES, n_ord)),
    }))

    # lines per order ~ Poisson(4); zero-line orders simply don't appear
    per_order = rng.poisson(4.0, n_ord)
    lok = np.repeat(np.arange(n_ord), per_order)
    n_li = len(lok)
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    ship = odate[lok] + rng.integers(1, 96, n_li).astype("timedelta64[D]")
    write(args.out, "lineitem", pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], n_li)),
        "l_shipdate": pa.array(ship.astype("datetime64[ms]"), pa.timestamp("ms")),
    }))

    ts0 = np.datetime64("2024-01-01T00:00:00", "us")
    span = int(np.timedelta64(30, "D") / np.timedelta64(1, "us"))
    write(args.out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array((ts0 + rng.integers(0, span, n_ev).astype("timedelta64[us]"))
                       .astype("datetime64[ns]"), pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, n_ev)),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
    }))

    texts = []
    for i in range(n_docs):
        r = rng.random()
        if i > 0 and r < 0.002:           # rare exact duplicate
            texts.append(texts[rng.integers(0, i)])
        elif i > 0 and r < 0.042:         # near-duplicate: copy + " dup"
            texts.append(texts[rng.integers(0, i)].rstrip() + " dup")
        else:
            k = rng.integers(10, 101)
            texts.append(" ".join(rng.choice(VOCAB, k)))
    write(args.out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_docs), pa.int64()),
        "text": texts,
        "lang": pa.array(rng.choice(LANGS, n_docs)),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    vecs = rng.standard_normal((n_emb, 64)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    write(args.out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs], pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))


if __name__ == "__main__":
    main()
