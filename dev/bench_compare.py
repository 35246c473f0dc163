#!/usr/bin/env python3
"""Mechanical host-noise adjudication between two bench_detail.json files.

Usage: python3 dev/bench_compare.py BASE.json OTHER.json [--bar 2.0]

Prints, for the queries present in BOTH files:
  - total seconds each side and the total ratio
  - per-query OTHER/BASE ratio distribution (p25 / median / p75 / max)
  - contiguous alphabetical blocks of >= 2 queries whose ratio exceeds
    the bar (default 2.0x) -- the documented host-noise signature is a
    contiguous inflated block that moves between runs, while a real plan
    regression pins to the same query every run
  - individual queries over the bar with absolute times

This reproduces the judge's r4/r5 adjudication method (VERDICT round 5,
"Driver-run noise" finding) so the ratio table is a one-command artifact
instead of a by-hand recomputation. Exit code 0 always: the output is
evidence, the adjudication (noise vs regression) stays human.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = {k: v for k, v in d.get("queries", {}).items() if v >= 0}
    return d, qs


def pct(xs, p):
    """Nearest-rank percentile on a sorted list."""
    if not xs:
        return float("nan")
    i = min(len(xs) - 1, max(0, int(round(p / 100.0 * (len(xs) - 1)))))
    return xs[i]


def main():
    argv = sys.argv[1:]
    bar = 2.0
    args = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--bar"):
            if "=" in a:
                bar = float(a.split("=", 1)[1])
            else:
                bar = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    bd, base = load(args[0])
    od, other = load(args[1])
    common = sorted(set(base) & set(other))
    if not common:
        print("no common queries")
        sys.exit(1)
    only_base = sorted(set(base) - set(other))
    only_other = sorted(set(other) - set(base))
    if only_base:
        print(f"only in BASE ({len(only_base)}): {', '.join(only_base[:10])}")
    if only_other:
        print(f"only in OTHER ({len(only_other)}): {', '.join(only_other[:10])}")

    # Ratio guard: a sub-10ms base time makes the ratio meaningless noise.
    ratios = {q: (other[q] / base[q] if base[q] > 0.01 else float("nan")) for q in common}
    valid = sorted(v for v in ratios.values() if v == v)
    tb = sum(base[q] for q in common)
    to = sum(other[q] for q in common)
    print(f"\nqueries compared: {len(common)}")
    print(f"total: BASE {tb:.2f}s  OTHER {to:.2f}s  ratio {to / tb:.2f}")
    print(f"per-query OTHER/BASE ratio: p25 {pct(valid, 25):.2f}  "
          f"median {pct(valid, 50):.2f}  p75 {pct(valid, 75):.2f}  max {max(valid):.2f}")

    over = [q for q in common if ratios[q] == ratios[q] and ratios[q] > bar]
    # Contiguous alphabetical blocks among the over-bar queries.
    blocks, cur = [], []
    for q in common:
        if q in over:
            cur.append(q)
        else:
            if len(cur) >= 2:
                blocks.append(cur)
            cur = []
    if len(cur) >= 2:
        blocks.append(cur)

    print(f"\nqueries over {bar:.1f}x bar: {len(over)}")
    for q in over:
        print(f"  {q}: {base[q]:.3f}s -> {other[q]:.3f}s ({ratios[q]:.2f}x)")
    if blocks:
        print(f"\ncontiguous inflated blocks (>=2 queries, host-noise signature):")
        for b in blocks:
            print(f"  {b[0]} .. {b[-1]} ({len(b)} queries)")
    else:
        print("\nno contiguous inflated blocks")
    isolated = [q for q in over if not any(q in b for b in blocks)]
    if isolated:
        print(f"isolated over-bar queries (candidate real regressions): {', '.join(isolated)}")


if __name__ == "__main__":
    main()
