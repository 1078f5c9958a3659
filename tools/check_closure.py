#!/usr/bin/env python3
"""Independent verifier for the dup-cluster queries (d06/d08/d09)
whose DuckDB oracles embed a recursive transitive closure.

At sf1 the dup graph develops one ~46k-doc component (gen_sf's
near-dup process copies earlier docs, so clusters compound), making
the closure CTE Theta(sum of cluster^2) = 2.1e9 rows — intractable
for the SQL oracle while the ENGINE's label propagation is
O(edges x diameter) and finishes in seconds. This tool replaces ONLY
the closure step with a union-find; the dup-edge semantics (shingles,
minhash, banding, >=5/9 signature verification) and the quality score
still come verbatim from the registered oracle SQL, so the check
stays anchored to the same oracle definitions.

Usage: tools/check_closure.py <sfdir> <verify_out>
(expects <verify_out>/{d06_dup_clusters,d08_quality_survivor,
d09_cross_source} parquet dumps + oracle_sql.json)
"""
import json
import sys
from collections import defaultdict

import duckdb
import pandas as pd

sfdir, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')")
oracle = json.load(open(f"{out}/oracle_sql.json"))

# dup edges from the d06 oracle's own CTE chain, truncated before the
# closure ('sym AS MATERIALIZED' starts the reachability machinery)
sql = oracle["d06_dup_clusters"]
prefix = sql[: sql.index("sym AS MATERIALIZED")].rstrip().rstrip(",")
edges = con.sql(prefix + "\nSELECT doc_a, doc_b FROM dups").fetchall()

parent = {}
def find(x):
    while parent.setdefault(x, x) != x:
        parent[x] = parent[parent[x]]
        x = parent[x]
    return x

for a, b in edges:
    ra, rb = find(a), find(b)
    if ra != rb:
        parent[ra] = rb
comp = defaultdict(list)
for x in list(parent):
    comp[find(x)].append(x)
clus = {}
for ms in comp.values():
    m = min(ms)
    for d in ms:
        clus[d] = m
print(f"dup graph: {len(edges)} edges, {len(comp)} clusters, "
      f"largest {max((len(m) for m in comp.values()), default=0)}")

fails = 0
def report(name, ok, n):
    global fails
    print(f"[{'OK   ' if ok else 'FAIL '}] {name}: {n} rows "
          f"{'exact-match' if ok else 'MISMATCH'} (union-find closure)")
    if not ok:
        fails += 1

# d06: doc_id, cluster_id(min member), is_keeper
got = pd.read_parquet(f"{out}/d06_dup_clusters").sort_values("doc_id").reset_index(drop=True)
exp = pd.DataFrame(sorted((d, c, 1 if d == c else 0) for d, c in clus.items()),
                   columns=["doc_id", "cluster_id", "is_keeper"])
report("d06_dup_clusters",
       len(got) == len(exp) and all((got[c].values == exp[c].values).all() for c in exp.columns),
       len(got))

# d08: survivor ranking per cluster by the t02 oracle's quality score
q = dict(con.sql(f"SELECT doc_id, quality_score FROM ({oracle['t02_quality_score']})").fetchall())
rows = []
for c, ms in sorted((min(ms), ms) for ms in comp.values()):
    for i, d in enumerate(sorted(ms, key=lambda d: (-q[d], d)), 1):
        rows.append((c, d, q[d], i, 1 if i == 1 else 0))
exp8 = pd.DataFrame(rows, columns=["cluster_id", "doc_id", "quality_score",
                                   "rank_in_cluster", "keep"])
got8 = pd.read_parquet(f"{out}/d08_quality_survivor") \
    .sort_values(["cluster_id", "rank_in_cluster"]).reset_index(drop=True)
report("d08_quality_survivor",
       len(got8) == len(exp8) and all((got8[c].values == exp8[c].values).all() for c in exp8.columns),
       len(got8))

# d09: clusters spanning >=2 sources
src = dict(con.sql("SELECT doc_id, source FROM documents").fetchall())
agg = defaultdict(lambda: [set(), 0])
for d, c in clus.items():
    agg[c][0].add(src[d])
    agg[c][1] += 1
exp9 = pd.DataFrame(sorted((c, len(s), n) for c, (s, n) in agg.items() if len(s) >= 2),
                    columns=["cluster_id", "n_sources", "n_docs"])
got9 = pd.read_parquet(f"{out}/d09_cross_source").sort_values("cluster_id").reset_index(drop=True)
report("d09_cross_source",
       len(got9) == len(exp9) and all((got9[c].values == exp9[c].values).all() for c in exp9.columns),
       len(got9))

sys.exit(1 if fails else 0)
