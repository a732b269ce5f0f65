#!/usr/bin/env python
"""Per-entry wall-time growth between two bench JSONs (same box, run
back-to-back): flag entries whose growth exceeds data-growth × slack.

Usage: python tools/growth_report.py small.json big.json [k] [slack]
Defaults: k=10 (the amplification factor), slack=1.3 (the r8 verdict's
super-linear threshold). Prints a markdown table sorted by growth,
with FLAG on entries > k × slack. Entries under 1 s at the small SF
are reported but never flagged (fixed-overhead noise dominates them).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big_all = json.load(open(sys.argv[2]))
    big = big_all["queries"]
    k = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    slack = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    rows = []
    for name, t_small in small.items():
        if name not in big:
            continue
        t_big = big[name]
        growth = t_big / t_small if t_small > 0 else float("inf")
        flagged = growth > k * slack and t_small >= 1.0
        rows.append((growth, name, t_small, t_big, flagged))
    rows.sort(reverse=True)
    print(f"| query | {sys.argv[1].split('/')[-1]} | "
          f"{sys.argv[2].split('/')[-1]} | growth | flag |")
    print("|---|---|---|---|---|")
    for growth, name, a, b, flagged in rows:
        print(f"| {name} | {a:.2f} s | {b:.2f} s | {growth:.2f}× |"
              f" {'**FLAG**' if flagged else ''} |")
    n_flag = sum(1 for r in rows if r[4])
    tot_a = sum(r[2] for r in rows)
    tot_b = sum(r[3] for r in rows)
    print(f"\ncommon entries: {len(rows)}; total {tot_a:.1f} s → "
          f"{tot_b:.1f} s ({tot_b / tot_a:.2f}× at {k:.0f}× data); "
          f"flagged >{k * slack:.0f}×: {n_flag}")


if __name__ == "__main__":
    main()
