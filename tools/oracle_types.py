"""Audit oracle SQL result types under DuckDB.

The driver's value hash canonicalizes DuckDB HUGEINT (int128) results
differently from int64, so any oracle whose outer aggregate is an
uncast SUM(BIGINT) hash-mismatches even when the values are identical
(CORRECTNESS_r02: 5 such rows). This tool DESCRIBEs every registered
oracle against the sf0.001 parquet views and reports any column whose
DuckDB type is HUGEINT / UHUGEINT / DECIMAL — types the Spark side can
never produce.

Usage: python tools/oracle_types.py [sf_dir]
Exits non-zero if any offending column exists.
"""

from __future__ import annotations

import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BAD_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def audit(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    from arcon_spark.plans.registry import oracle_sql

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(oracle_sql().items()):
        try:
            desc = con.sql(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # oracle needs runtime temp data etc.
            print(f"SKIP {name}: {type(e).__name__}: {str(e).splitlines()[0][:120]}")
            continue
        offending = [
            (col, typ)
            for col, typ, *_ in desc
            if any(b in typ.upper() for b in BAD_TYPES)
        ]
        if offending:
            bad[name] = offending
    return bad


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad = audit(sf_dir)
    for name, cols in bad.items():
        print(f"BAD {name}: {cols}")
    print(f"{len(bad)} oracles with HUGEINT/DECIMAL columns")
    sys.exit(1 if bad else 0)
