"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB at the
given scale factor, then compares row count, sorted column names, and
order-insensitive values (exact equality; floats reported with the
max absolute delta when they mismatch so near-misses are visible).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from arcon_spark.io import TABLES
from arcon_spark.session import get_spark


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from arcon_spark.plans.registry import REGISTRY, queries

    qmap = queries()
    spark = get_spark("parity_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = n_rows_only = 0
    for name, fn in sorted(qmap.items()):
        if only and name not in only:
            continue
        spark.catalog.clearCache()  # no cross-query cached-block accumulation
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(spec.oracle)
            dcols = [d[0] for d in rel.description]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            n_fail += 1
            continue
        sc, sr = _norm_rows(scols, srows)
        dc, dr = _norm_rows(dcols, drows)
        if sc != dc:
            print(f"FAIL  {name}: schema mismatch spark={sc} duckdb={dc}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL  {name}: rowcount spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
            continue
        if sr == dr:
            print(f"OK    {name}: {len(sr)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        # diagnose float near-misses
        max_delta = 0.0
        n_diff = 0
        for a, b in zip(sr, dr):
            if a != b:
                n_diff += 1
                for x, y in zip(a, b):
                    if isinstance(x, float) and isinstance(y, float):
                        max_delta = max(max_delta, abs(x - y))
        print(
            f"FAIL  {name}: {n_diff}/{len(sr)} differing rows, max float delta {max_delta:.3e}"
        )
        for a, b in zip(sr, dr):
            if a != b:
                print(f"      spark : {a}\n      duckdb: {b}")
                break
        n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
