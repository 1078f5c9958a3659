#!/usr/bin/env python3
"""Summarize `graft.Explain` output into the EXPLAIN_AUDIT table format.

Usage: java ... graft.Explain <sfDir> [ops...] > /tmp/explain.txt
       tools/audit.py /tmp/explain.txt

Emits one markdown row per op:
| op | scans | read cols/scan | pushed scans | BHJ | SMJ | WGL | codegen spans |
"""
import re
import sys


def main(path):
    text = open(path).read()
    # split on the ====== op ====== headers Explain prints
    parts = re.split(r"^========== (\S+) ==========$", text, flags=re.M)
    print("| op | scans | read cols/scan | pushed scans | BHJ | SHJ | SMJ | WGL | codegen spans | hof dup |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for i in range(1, len(parts), 2):
        op, body = parts[i], parts[i + 1]
        scans = len(re.findall(r"^\(\d+\) Scan parquet", body, re.M))
        # ReadSchema: struct<a:int,b:decimal(12,2),...> — count top-level fields
        widths = []
        for m in re.finditer(r"ReadSchema: struct<(.*)>", body):
            s, depth, n = m.group(1), 0, 0
            if s.strip():
                n = 1
                for ch in s:
                    if ch in "<(":
                        depth += 1
                    elif ch in ">)":
                        depth -= 1
                    elif ch == "," and depth == 0:
                        n += 1
            widths.append(str(n))
        pushed = len([m for m in re.finditer(r"PushedFilters: \[(.*?)\]", body)
                      if m.group(1).strip()])
        bhj = len(re.findall(r"^\(\d+\) BroadcastHashJoin", body, re.M))
        shj = len(re.findall(r"^\(\d+\) ShuffledHashJoin", body, re.M))
        smj = len(re.findall(r"^\(\d+\) SortMergeJoin", body, re.M))
        wgl = len(re.findall(r"^\(\d+\) WindowGroupLimit", body, re.M))
        spans = re.search(r"\[audit\] \S+ codegen_spans=(\d+)", body)
        spans = spans.group(1) if spans else "?"
        # worst per-node duplication of one HOF subtree (t14 hazard
        # signature; >2 means a heavy chain got inlined — see
        # HofInliningSpec, the hard gate)
        hof = re.search(r"hof_dup=(\d+)", body)
        hof = hof.group(1) if hof else "?"
        cols = ",".join(widths) if widths else "—"
        print(f"| {op} | {scans} | {cols} | {pushed} | {bhj} | {shj} | {smj} | {wgl} | {spans} | {hof} |")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/dev/stdin")
