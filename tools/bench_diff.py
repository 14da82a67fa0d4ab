"""Compare two bench.py result files the way the noise doctrine says to:
per-query MEDIANS, ratio-sorted, with the host-variance band called out.

Totals lie on this container (same-code runs drift up to 2x per entry;
MEASURE.md documents 144 s vs 199 s for identical code). The only
meaningful signals are (a) a per-query median ratio far outside the
uniform drift band, and (b) a drift that correlates with code changes.
This tool prints both halves of that judgment.

Usage: python tools/bench_diff.py OLD.json NEW.json [ratio_flag]
       ratio_flag: flag queries whose median ratio exceeds it (default 1.5)
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    def load(path: str) -> dict:
        """bench_result.json directly, or the driver's BENCH_r{N}.json
        wrapper (whose 'parsed' holds the bench JSON when it parsed;
        its 'tail' is front-truncated and unusable otherwise)."""
        d = json.load(open(path))
        if "parsed" in d:
            if not isinstance(d["parsed"], dict):
                raise SystemExit(
                    f"{path}: driver wrapper without parsed bench JSON — "
                    "diff against a bench_result.json instead"
                )
            d = d["parsed"]
        return d.get("medians") or d["queries"]

    mo = load(sys.argv[1])
    mn = load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    shared = sorted(set(mo) & set(mn))
    only_old = sorted(set(mo) - set(mn))
    only_new = sorted(set(mn) - set(mo))

    ratios = []
    for q in shared:
        if mo[q] > 0:
            ratios.append((mn[q] / mo[q], q, mo[q], mn[q]))
    ratios.sort(reverse=True)
    drift = statistics.median(r for r, *_ in ratios)
    print(
        f"{len(shared)} shared queries; median per-query ratio {drift:.2f}x "
        f"(uniform drift = host variance, not regression)"
    )
    print(
        f"totals: old {sum(mo[q] for q in shared):.1f}s -> "
        f"new {sum(mn[q] for q in shared):.1f}s (shared set only)"
    )
    flagged = [t for t in ratios if t[0] > flag * drift]
    if flagged:
        print(f"\nqueries beyond {flag}x the uniform drift (check for code changes):")
        for r, q, o, n in flagged:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    else:
        print(f"\nno query beyond {flag}x the uniform drift — no regression signal")
    improved = [t for t in ratios if t[0] < drift / flag]
    if improved:
        print("\nimproved beyond the drift band:")
        for r, q, o, n in improved:
            print(f"  {q}: {o:.2f}s -> {n:.2f}s ({r:.2f}x)")
    if only_old or only_new:
        print(f"\nset drift: -{only_old} +{only_new}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
