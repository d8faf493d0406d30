#!/usr/bin/env python3
"""Per-query scale exponents between two bench full-dump JSONs.

e = ln(t_hi / t_lo) / ln(sf_hi / sf_lo): e = 1 is linear scaling, e = 2
quadratic. Only meaningful when both runs come from the SAME host window
(docs/BENCH_NOTES.md: this host swings between 32-core and ~4-core-capped
windows; absolute seconds move ~2-8x across windows but same-window ratios
— and therefore exponents — hold).

Usage: python3 tools/exponents.py <lo.json> <hi.json> <sf_ratio> [flag_above]
Prints a sorted table and a JSON summary line.
"""
import json
import math
import sys


def main():
    lo = json.load(open(sys.argv[1]))["queries"]
    hi = json.load(open(sys.argv[2]))["queries"]
    ratio = float(sys.argv[3])
    flag = float(sys.argv[4]) if len(sys.argv) > 4 else 1.3
    shared = sorted(set(lo) & set(hi))
    rows = []
    for q in shared:
        if lo[q] <= 0 or hi[q] <= 0:
            continue
        e = math.log(hi[q] / lo[q]) / math.log(ratio)
        rows.append((q, lo[q], hi[q], round(e, 2)))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':34s} {'t_lo':>8s} {'t_hi':>8s} {'e':>6s}")
    for q, tl, th, e in rows:
        mark = "  <-- e > %.1f" % flag if e > flag else ""
        print(f"{q:34s} {tl:8.3f} {th:8.3f} {e:6.2f}{mark}")
    n_ok = sum(1 for r in rows if r[3] <= flag)
    print(json.dumps({
        "metric": "scale_exponents", "n_shared": len(rows),
        "n_at_or_below_flag": n_ok, "flag": flag,
        "worst": [{"q": q, "e": e} for q, _, _, e in rows[:8]],
    }))


if __name__ == "__main__":
    main()
