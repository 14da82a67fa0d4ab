"""Run bench.py's exact methodology (same warmups, noop sink, min-of-N)
over a SUBSET of the headline queries — the per-change before/after
measurement tool for optimization rounds, where a full 78-query pass
per edit would burn the sitting.

Usage: python tools/bench_subset.py out.json query [query ...]
Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_BENCH_REPEATS
exactly like bench.py (it IS bench.py, with HEADLINE filtered).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import bench


def main() -> None:
    out, names = sys.argv[1], sys.argv[2:]
    if not names:
        raise SystemExit("usage: bench_subset.py out.json query [query ...]")
    # validate against the FULL registry (non-headline queries are
    # allowed — the subset tool is for optimization evidence, not the
    # driver contract), and fail loudly on typos instead of producing
    # an empty/KeyError bench run (ADVICE r10)
    from arcon_spark.plans.registry import queries

    unknown = [n for n in names if n not in queries()]
    if unknown:
        raise SystemExit(f"unknown queries (not in registry): {unknown}")
    bench.HEADLINE = names
    os.environ["SPARK_GRAFT_BENCH_OUT"] = out
    bench.main()


if __name__ == "__main__":
    main()
