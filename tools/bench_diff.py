#!/usr/bin/env python3
"""Diff two bench_detail_r{N}.json snapshots per query / family / lane.

Usage: python3 tools/bench_diff.py bench_detail_r10.json bench_detail_r11.json
       [--threshold 0.5]   # only print shared-pass movers beyond +/-N sec
       [--threshold=0.5]   # equivalent

Round-over-round totals are shared-run noise (the repo documents +/-25%
under load); this prints the per-query view that IS comparable: shared
deltas sorted by magnitude, family subtotals, alone-lane cold/warm for
queries present in both snapshots, and adds/removes. Each mover is
classified against the same +/-25% band applied per query (delta within
25% of the larger side = "noise?"), so triage starts sorted into
candidate regressions vs expected spread.
"""
import json
import sys

NOISE_FRAC = 0.25  # the documented shared-run spread, applied per query


def main() -> int:
    argv = sys.argv[1:]
    args = []
    thr = 0.5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                i += 1
                thr = float(argv[i])
            else:
                print(__doc__)
                return 2
        elif a.startswith("--"):
            print(__doc__)
            return 2
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = (json.load(open(p)) for p in args)
    qo, qn = old["queries"], new["queries"]
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    print(f"old: {old['value']} s / {len(qo)} q   new: {new['value']} s / {len(qn)} q")
    if added:
        print(f"added ({len(added)}): " + ", ".join(
            f"{k} {qn[k]:.2f}s" for k in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(
            f"{k} {qo[k]:.2f}s" for k in removed))
    movers = sorted(((qn[k] - qo[k], k) for k in set(qo) & set(qn)),
                    key=lambda t: -abs(t[0]))
    big = [(d, k) for d, k in movers if abs(d) >= thr]
    print(f"\nshared-pass movers beyond +/-{thr}s ({len(big)}):")
    for d, k in big:
        band = NOISE_FRAC * max(qo[k], qn[k])
        tag = "noise?" if abs(d) <= band else "BEYOND +/-25%"
        print(f"  {d:+6.2f}s  {k}  ({qo[k]:.2f} -> {qn[k]:.2f})  [{tag}]")
    print("\nfamilies:")
    fo, fn = old.get("families", {}), new.get("families", {})
    for f in sorted(set(fo) | set(fn), key=lambda f: -(fn.get(f, 0) - fo.get(f, 0))):
        print(f"  {fn.get(f, 0) - fo.get(f, 0):+7.2f}s  {f:12s} "
              f"({fo.get(f, 0):.1f} -> {fn.get(f, 0):.1f})")
    ao, an = old.get("alone", {}), new.get("alone", {})
    both = sorted(set(ao) & set(an))
    if both:
        print("\nalone lane (cold/warm, old -> new):")
        for k in both:
            o, n = ao[k], an[k]
            print(f"  {k:28s} cold {o['cold']:6.2f} -> {n['cold']:6.2f}   "
                  f"warm {o['warm']:6.2f} -> {n['warm']:6.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
