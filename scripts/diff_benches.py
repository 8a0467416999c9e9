#!/usr/bin/env python3
"""Per-query diff of two Bench capture files (r14 verdict task 3: the
quiet-window recapture must be DIFFED against the prior round's stamp,
not eyeballed). Prints the total delta and every query whose median
moved more than both a floor (0.15 s) and a ratio (25%), sorted by
absolute delta; exits 0 always — this is a report, not a gate.

Usage: diff_benches.py <old.json> <new.json>
"""
import json
import sys


def main() -> None:
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    t_old = sum(oq[q] for q in shared)
    t_new = sum(nq[q] for q in shared)
    print(f"shared queries: {len(shared)}  "
          f"(only-old: {len(only_old)}, only-new: {len(only_new)})")
    if only_new:
        print(f"  new this round: {', '.join(only_new)} "
              f"(+{sum(nq[q] for q in only_new):.2f} s)")
    print(f"shared-subset total: {t_old:.1f} s -> {t_new:.1f} s "
          f"({t_new - t_old:+.1f} s, x{t_new / t_old:.3f})")
    print(f"spreads: old {old.get('total_spread', 0):.1f} s on "
          f"{old['value']:.1f} s, new {new.get('total_spread', 0):.1f} s "
          f"on {new['value']:.1f} s")
    moved = []
    for q in shared:
        d = nq[q] - oq[q]
        if abs(d) > 0.15 and oq[q] > 0 and abs(d) / oq[q] > 0.25:
            moved.append((abs(d), d, q))
    moved.sort(reverse=True)
    if not moved:
        print("no query moved beyond the 0.15 s + 25% floor")
    for _, d, q in moved:
        print(f"  {d:+6.2f} s  {q}: {oq[q]:.2f} -> {nq[q]:.2f}")


if __name__ == "__main__":
    main()
