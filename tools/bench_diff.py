#!/usr/bin/env python3
"""Diff two bench_detail_r{N}.json snapshots per query / family / lane.

Usage: python3 tools/bench_diff.py bench_detail_r10.json bench_detail_r11.json
       [--threshold 0.5]   # only print shared-pass movers beyond +/-N sec

Round-over-round totals are shared-run noise (the repo documents +/-25%
under load); this prints the per-query view that IS comparable: shared
deltas sorted by magnitude, family subtotals, alone-lane cold/warm for
queries present in both snapshots, and adds/removes.
"""
import json
import sys


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else thr
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
        print(f"removed ({len(removed)}): " + ", ".join(added and removed))
    movers = sorted(((qn[k] - qo[k], k) for k in set(qo) & set(qn)),
                    key=lambda t: -abs(t[0]))
    big = [(d, k) for d, k in movers if abs(d) >= thr]
    print(f"\nshared-pass movers beyond +/-{thr}s ({len(big)}):")
    for d, k in big:
        print(f"  {d:+6.2f}s  {k}  ({qo[k]:.2f} -> {qn[k]:.2f})")
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
