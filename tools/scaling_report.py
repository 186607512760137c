#!/usr/bin/env python3
"""Per-query scaling report between two Bench BENCH_FULL.json maps.

Usage: scaling_report.py <bench_small.json> <bench_large.json> [factor]

Prints each query's wall at both scale factors and the measured ratio,
sorted by ratio descending, flagging entries whose growth exceeds the
data factor (super-linear) by more than 20%. Sub-entries ("a.b") are
attribution, not work, and are skipped. Entries under 0.25s at BOTH
sfs are noise-dominated (job-overhead floor) and reported separately.
"""
import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    large = json.load(open(sys.argv[2]))["queries"]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows, tiny = [], []
    for k in sorted(small):
        if "." in k or k not in large:
            continue
        a, b = small[k], large[k]
        (tiny if (a < 0.25 and b < 0.25) else rows).append((b / a if a > 0 else float("inf"), k, a, b))
    rows.sort(reverse=True)
    print(f"| query | sf0.1 s | sf1 s | ratio (data x{factor:.0f}) |")
    print("|---|---|---|---|")
    for r, k, a, b in rows:
        flag = " **super-linear**" if r > factor * 1.2 else ""
        print(f"| {k} | {a:.2f} | {b:.2f} | x{r:.1f}{flag} |")
    sup = [k for r, k, _, _ in rows if r > factor * 1.2]
    sub = [k for r, k, _, _ in rows if r <= factor]
    print(f"\n{len(rows)} measurable entries: {len(sub)} at-or-below-linear, "
          f"{len(rows) - len(sub) - len(sup)} mildly above, {len(sup)} super-linear: {sup or 'none'}")
    print(f"{len(tiny)} entries under the 0.25s overhead floor at both sfs (excluded).")


if __name__ == "__main__":
    main()
