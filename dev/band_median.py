#!/usr/bin/env python3
"""Compute the committed quiet band from N bench detail samples.

Usage: python3 dev/band_median.py SAMPLE1.json SAMPLE2.json SAMPLE3.json [...]
       python3 dev/band_median.py s1.json s2.json s3.json > bench_detail.json

Requires 3+ samples (the BASELINE.md protocol); refuses samples with
failed queries, mismatched query sets, a non-empty "retried" list
(a run that tripped Bench's >2x outlier retry was not a quiet run), or
"drift" above 1.15 (uniform background load inflates every query alike
and never trips the per-query retry — round-11's 1.2-1.3x samples would
otherwise have been accepted as "quiet"). Pass --allow-drift for the one
legitimate high-drift case: a refresh after a deliberate code change that
moved the whole suite relative to the OLD band the drift is measured
against.

Refreshing after a deliberate change that slows any single query >2x its
OLD band entry needs one more step: every sample run would retry that
query (the real cost reproduces, so min(first, retry) keeps it — but the
non-empty "retried" list is still rejected above, correctly: retried
samples carry best-of-two semantics, which is not band material).
Collect those refresh samples with retries disabled outright:
  SPARK_GRAFT_BAND=/nonexistent ... graft.Bench
Each sample is then a pure single-pass run (retried:[], drift:-1) and
this script accepts it; quietness falls back to the idle-host vmstat
protocol that the drift gate only supplements.

Each SAMPLE is a bench_detail.out.json written by `graft.Bench` (one run).
Output (stdout) is the per-query MEDIAN across the samples, in the exact
bench_detail schema, with "value" recomputed as the sum of the medians —
the band definition BASELINE.md has used since round 6.

This is the ONLY supported way to refresh the committed band
`bench_detail.json`: Bench itself writes transient details to the
untracked bench_detail.out.json so that no bench run (driver or local)
can silently overwrite the band in the working tree (round-8 judge
finding — the band is the denominator every regression call depends on,
and it must only change deliberately).

Protocol (BASELINE.md "CURRENT BAND"): 3 sequential full-bench samples on
an idle host (vmstat confirmed), all rc=0 with 0 failed queries, then:
  cp bench_detail.out.json /tmp/s1.json   # after each run
  python3 dev/band_median.py /tmp/s1.json /tmp/s2.json /tmp/s3.json \
      > bench_detail.json
  git add bench_detail.json               # the deliberate step

Refuses (exit 1) if any sample has failed queries or the samples disagree
on the query set — a band must not be computed from partial runs.
"""
import json
import sys


MAX_DRIFT = 1.15


def main():
    allow_drift = "--allow-drift" in sys.argv[1:]
    paths = [p for p in sys.argv[1:] if p != "--allow-drift"]
    # >= 3 is the documented protocol (BASELINE.md and this docstring): with
    # 2 samples the per-query "median" silently degrades to a mean,
    # weakening the band definition without warning (round-9 ADVICE).
    if len(paths) < 3:
        sys.exit(__doc__)
    samples = []
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        if d.get("n_failed", 0) or d.get("failed"):
            sys.exit(f"{p}: has failed queries — not band material")
        if d.get("retried"):
            sys.exit(f"{p}: Bench retried {d['retried']} — a run that "
                     "tripped the outlier retry is not a quiet run; "
                     "re-sample on an idle host")
        # Old samples (pre-round-11) carry no "drift"; only reject a
        # POSITIVE measured drift over the bar — -1 means no band was
        # readable during the run, which says nothing about quietness.
        if d.get("drift", -1) > MAX_DRIFT and not allow_drift:
            sys.exit(f"{p}: drift {d['drift']} > {MAX_DRIFT} — uniform "
                     "background load; re-sample on an idle host, or pass "
                     "--allow-drift iff a deliberate code change moved the "
                     "whole suite vs the old band")
        samples.append(d)
    keys = set(samples[0]["queries"])
    for p, d in zip(paths, samples):
        if set(d["queries"]) != keys:
            sys.exit(f"{p}: query set differs from {paths[0]} — "
                     "band samples must cover the identical declared set")
    sfs = {d.get("sf") for d in samples}
    if len(sfs) != 1:
        sys.exit(f"samples mix scale factors {sfs}")
    med = {}
    for q in sorted(keys):
        xs = sorted(d["queries"][q] for d in samples)
        n = len(xs)
        m = xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2.0
        med[q] = round(m, 3)
    total = round(sum(med.values()), 3)
    qjson = ",".join(f'"{q}":{med[q]:.3f}' for q in sorted(keys))
    n_ok = samples[0].get("n_ok", len(keys))
    print(f'{{"metric":"total","value":{total:.3f},"unit":"sec",'
          f'"queries":{{{qjson}}},"n_ok":{n_ok},"n_failed":0,'
          f'"sf":"{samples[0].get("sf")}",'
          f'"band_samples":{len(samples)}}}')


if __name__ == "__main__":
    main()
