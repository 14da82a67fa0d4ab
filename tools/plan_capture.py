"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python tools/plan_capture.py <tag> <suffix> <query> [<query> ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query — the
before/after plan evidence files the optimization rounds commit
(OPTIMIZATION_r{N}.md cites them). Queries that run driver-side jobs at
construction time (iterative loops, router stats) still capture the
plan of the RETURNED frame — the final verify/output fragment — which
is the part a plan diff can meaningfully compare.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")

from arcon_spark.session import get_spark


def capture(spark, qmap, name: str, sf_dir: str) -> str:
    df = qmap[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return re.sub(r"\n{3,}", "\n\n", plan.strip()) + "\n"


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture")
    from arcon_spark.plans.registry import queries

    qmap = queries()
    outdir = f"/root/repo/plans/{tag}"
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        path = f"{outdir}/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(capture(spark, qmap, name, sf_dir))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
