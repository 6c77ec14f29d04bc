#!/usr/bin/env python3
"""Cross-round per-query bench regression report.

Compares two bench_per_query artifacts (written by graft.Bench at the end
of every full run) and prints the queries whose steady time moved more
than a threshold, plus inventory adds/removals — the audit the driver's
BENCH_r*.json tail truncation can't support.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio_threshold=1.5]
"""
import json, sys

if len(sys.argv) < 3:
    print(__doc__)
    sys.exit(2)
old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
oq, nq = old["queries"], new["queries"]

added = sorted(set(nq) - set(oq))
removed = sorted(set(oq) - set(nq))
moved = []
for name in sorted(set(oq) & set(nq)):
    a, b = oq[name]["sec"], nq[name]["sec"]
    ratio = b / a if a > 0 else float("inf")
    # sub-0.5s absolute times are window noise at this granularity
    # (PERF_NOTES methodology); only flag moves that are big AND slow
    if (ratio > thr or ratio < 1 / thr) and max(a, b) > 0.5:
        moved.append((ratio, name, a, b,
                      oq[name].get("shuffle_mb"), nq[name].get("shuffle_mb")))

print(f"old: {old.get('sf')} total={old.get('total_sec')}s n={old.get('n_queries')}")
print(f"new: {new.get('sf')} total={new.get('total_sec')}s n={new.get('n_queries')}")
if added:
    print(f"added ({len(added)}): " + ", ".join(
        f"{n} ({nq[n]['sec']:.2f}s)" for n in added))
if removed:
    print(f"removed ({len(removed)}): " + ", ".join(removed))
errs = sorted(n for n, r in nq.items() if r.get("error"))
if errs:
    print(f"ERRORS in new ({len(errs)}): " + ", ".join(errs))
if not moved:
    print(f"no per-query movement beyond {thr}x (above 0.5s absolute)")
else:
    print(f"moved beyond {thr}x:")
    for ratio, name, a, b, sa, sb in sorted(moved, reverse=True):
        shuf = "" if sa is None else f"  shuffle {sa}->{sb} MB"
        print(f"  {name}: {a:.2f}s -> {b:.2f}s ({ratio:.2f}x){shuf}")
