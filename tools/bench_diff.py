#!/usr/bin/env python3
"""Contamination-aware diff of two graft.Bench artifacts.

Compares per-query warm medians (the robust signal) between two
bench.json files, EXCLUDING queries either artifact flagged
`contended` and annotating reps whose foreign-CPU or iowait share
exceeded the artifact's thresholds — so a round-over-round comparison
never mistakes a host burst for a code change (round-7 lesson) or a
disk burst for a regression (round-8 lesson).

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]
Exit code 1 when any clean query regressed past the threshold.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.3,
                    help="flag queries slower than OLD by this factor")
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    contended = set(old.get("contended", [])) | set(new.get("contended", []))
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    # host_factor (fixed single-thread CPU probe over a pinned
    # reference) normalizes host-speed drift out of the comparison:
    # ratios are computed on medians/host_factor when both artifacts
    # carry the field, so a uniformly slower host doesn't read as a
    # uniform code regression.
    hf_old = old.get("host_factor")
    hf_new = new.get("host_factor")
    norm = (hf_new / hf_old) if isinstance(hf_old, (int, float)) \
        and isinstance(hf_new, (int, float)) and hf_old > 0 and hf_new > 0 else None
    if norm is not None:
        print(f"host_factor: old {hf_old:.3f}, new {hf_new:.3f} "
              f"(ratios normalized by {norm:.3f})")
    mw_old, mw_new = old.get("membw_factor"), new.get("membw_factor")
    mw_ratio = (mw_new / mw_old) if isinstance(mw_old, (int, float)) \
        and isinstance(mw_new, (int, float)) and mw_old > 0 and mw_new > 0 else None
    if mw_ratio is not None:
        print(f"membw_factor: old {mw_old:.3f}, new {mw_new:.3f} "
              f"(memory-bandwidth drift {mw_ratio:.3f})")
    # Counters FIRST (the r15 rule): deterministic per-query execution
    # counters (shuffle rows/bytes, jobs/stages/tasks) are functions of
    # the plan and data, not the host. A wall regression with IDENTICAL
    # counters is host noise — report it but don't fail the diff; a
    # counter change is a structural plan/data change regardless of
    # walls, and is always surfaced.
    oc = old.get("queries_counters", {})
    nc = new.get("queries_counters", {})
    # Counters are only comparable when both takes captured them on the
    # same rep kind: rep 0 includes one-time MatStore index builds, rep
    # 1 is steady state. counters_rep records the provenance (r16+);
    # older artifacts are inferred from reps (the r15 rule: warm rep 1
    # when reps >= 2, else the cold rep).
    def crep(art):
        v = art.get("counters_rep")
        return v if v is not None else (1 if art.get("reps", 1) >= 2 else 0)
    prov_ok = crep(old) == crep(new)
    if not prov_ok:
        print(f"counters_rep provenance differs (old rep {crep(old)}, new rep "
              f"{crep(new)}: cold-vs-warm capture) — skipping counter "
              f"comparison; walls only")

    def counter_eq(k, va, vb):
        """Row/job/stage/task counts are exact; BYTE counters carry
        ~0.1% run-to-run jitter on identical plans (shuffle compression
        block boundaries shift with thread interleaving — measured r16:
        ±0.03-0.1% on byte-identical code), so bytes compare with a
        0.5% relative tolerance."""
        if va == vb:
            return True
        if "bytes" in k and isinstance(va, (int, float)) \
                and isinstance(vb, (int, float)) and min(va, vb) > 0:
            return abs(va - vb) / max(va, vb) <= 0.005
        return False

    def counters_verdict(q):
        """'same' / 'changed' / None (either side lacks counters, or
        cold-vs-warm provenance makes them incomparable)"""
        if not prov_ok:
            return None
        a, b = oc.get(q), nc.get(q)
        if not a or not b:
            return None
        keys = set(a) | set(b)
        return "same" if all(counter_eq(k, a.get(k), b.get(k)) for k in keys) \
            else "changed"

    def host_corroborates(q):
        """Is there actual host evidence for demoting q's wall delta?
        Same-plan CPU regressions (e.g. a codegen expression replaced by
        an interpreted HOF) leave every counter unchanged — identical
        counters alone must NOT auto-demote a regression to host noise."""
        if dirty_reps(old, q) or dirty_reps(new, q):
            return True
        if norm is not None and max(norm, 1 / norm) > 1.15:
            return True
        if mw_ratio is not None and max(mw_ratio, 1 / mw_ratio) > 1.15:
            return True
        return False

    def dirty_reps(art, q):
        """indices of reps with foreign/iowait over the artifact's gates"""
        ft = art.get("foreign_threshold", 0.15)
        it = art.get("iowait_threshold", 0.30)
        fg = art.get("queries_foreign", {}).get(q, [])
        io = art.get("queries_iowait", {}).get(q, [])
        bad = {i for i, v in enumerate(fg) if v > ft}
        bad |= {i for i, v in enumerate(io) if v > it}
        return sorted(bad)

    counter_changed = [q for q in shared if counters_verdict(q) == "changed"
                       and q not in contended]
    if counter_changed:
        print("COUNTERS CHANGED (structural plan/data change, host-independent):")
        for q in counter_changed:
            a, b = oc[q], nc[q]
            delta = {k: (a.get(k), b.get(k)) for k in sorted(set(a) | set(b))
                     if not counter_eq(k, a.get(k), b.get(k))}
            print(f"  {q}: " + ", ".join(
                f"{k} {v[0]} -> {v[1]}" for k, v in delta.items()))

    regressed, improved, skipped, noise = [], [], [], []
    same_counter_regressed = set()
    for q in shared:
        o, n = old["queries"][q], new["queries"][q]
        if q in contended or o <= 0 or n <= 0:
            skipped.append(q)
            continue
        r = (n / o) / norm if norm else n / o
        if r > args.threshold:
            # identical counters = same plan over same data — but that
            # only demotes the regression to host noise when host
            # evidence corroborates (dirty reps, probe drift); with a
            # quiet host it is a same-plan CPU regression (interpreted
            # vs codegen, allocation churn) and stays REGRESSED with a
            # "counters unchanged" annotation
            if counters_verdict(q) == "same" and host_corroborates(q):
                noise.append((r, q, o, n))
            else:
                if counters_verdict(q) == "same":
                    same_counter_regressed.add(q)
                regressed.append((r, q, o, n))
        elif r < 1 / args.threshold:
            improved.append((r, q, o, n))

    print(f"shared queries: {len(shared)}  "
          f"excluded (contended/failed): {len(skipped)}")
    if skipped:
        print("  excluded:", ", ".join(skipped))
    for title, rows in (("REGRESSED", sorted(regressed, reverse=True)),
                        ("slower walls, IDENTICAL counters + host evidence "
                         "(host noise, not code)",
                         sorted(noise, reverse=True)),
                        ("improved", sorted(improved))):
        if not rows:
            continue
        print(f"{title}:")
        for r, q, o, n in rows:
            marks = []
            if q in same_counter_regressed:
                marks.append("counters unchanged, quiet host — "
                             "same-plan CPU regression?")
            for tag, art in (("old", old), ("new", new)):
                d = dirty_reps(art, q)
                if d:
                    marks.append(f"{tag} dirty reps {d}")
            suffix = f"  [{'; '.join(marks)}]" if marks else ""
            print(f"  {q}: {o:.3f}s -> {n:.3f}s ({r:.2f}x){suffix}")
    ow, nw = old.get("value"), new.get("value")
    if isinstance(ow, (int, float)) and isinstance(nw, (int, float)):
        print(f"warm totals: {ow:.1f}s -> {nw:.1f}s "
              f"(per-query medians are the trustworthy signal; totals shift "
              f"with host state)")

    # Band-vs-probe cross-check (the round-9/10 lesson: two rounds in a
    # row the whole shared-query band sat at 1.5-1.8x while the
    # single-thread probe read ~1.06 — the probes UNDER-measured the
    # contention channel). If the median shared-query ratio disagrees
    # with every probe by >1.2x, the host state changed in a way the
    # probes can't normalize — treat the whole take as contaminated
    # and re-take on a quiet host rather than chasing per-query deltas.
    ratios = sorted((new["queries"][q] / old["queries"][q])
                    for q in shared if q not in contended
                    and old["queries"][q] > 0 and new["queries"][q] > 0)
    probes = [r for r in (norm, mw_ratio) if r is not None]
    # No probe fields (pre-r11 artifacts): stay silent — with nothing
    # to cross-check against, a uniform shift is just as likely a real
    # code change, and a bogus "host contamination" verdict would steer
    # the reader away from it.
    if ratios and probes:
        band = ratios[len(ratios) // 2]
        if all(max(band / p, p / band) > 1.2 for p in probes):
            print(f"WARNING: shared-query median ratio {band:.2f} disagrees "
                  f"with every probe ({', '.join(f'{p:.2f}' for p in probes)}) "
                  f"by >1.2x — host state the probes cannot see changed; "
                  f"distrust this comparison and re-take on a quiet host "
                  f"(note: the median includes code-touched queries — a "
                  f"round that deliberately shifts most queries can also "
                  f"trip this)")
    sys.exit(1 if regressed else 0)


if __name__ == "__main__":
    main()
