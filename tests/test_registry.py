"""Registry contract tests: every registered query runs at sf0.001 and
returns a stable schema; every oracle is syntactically valid DuckDB.

The full value-parity gate lives in tools/check_parity.py (and the
driver's CORRECTNESS_r{N}.json); these tests are the fast guard that
keeps `pytest -x -q` meaningful during development.
"""

from __future__ import annotations

import duckdb
import pytest

from arcon_spark.io import TABLES
from arcon_spark.plans.registry import REGISTRY, oracle_sql, queries


def test_registry_nonempty():
    assert len(queries()) >= 40


def test_every_oracle_key_is_a_query():
    q = queries()
    for name in oracle_sql():
        assert name in q


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_runs_and_schema_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    n = df.count()
    assert n >= 0
    if spec.oracle is None:
        return
    rel = duck.sql(spec.oracle)
    assert sorted(c.lower() for c in df.columns) == sorted(
        c.lower() for c in [d[0] for d in rel.description]
    ), f"{name}: column names diverge from oracle"
    assert n == len(rel.fetchall()), f"{name}: row count diverges from oracle"


def test_ensure_session_confs_repairs_foreign_session(spark):
    """The driver may run queries() in a session it built itself;
    load_table must repair the runtime-settable confs it needs
    (events nanos handling, UTC, Arrow)."""
    from arcon_spark.io import ensure_session_confs, load_table

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        ensure_session_confs(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        # events read still yields a proper timestamp column
        dt = dict(load_table(spark, "/root/testdata/sf0.001", "events").dtypes)
        assert dt["ts"] == "timestamp"
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


@pytest.mark.parametrize("name", sorted(oracle_sql()))
def test_oracle_types_never_hugeint(duck, name):
    """The driver's value hash canonicalizes DuckDB HUGEINT (int128)
    and DECIMAL differently from Spark's int64/double, so an oracle
    whose outer aggregate is an uncast SUM(BIGINT) hash-mismatches
    even when the values are identical (all 5 red CORRECTNESS_r02
    rows were exactly this). Spark can never produce those types, so
    no oracle column may type as them."""
    desc = duck.sql(f"DESCRIBE ({oracle_sql()[name]})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in ("HUGEINT", "DECIMAL"))
    ]
    assert not bad, f"{name}: HUGEINT/DECIMAL oracle columns {bad}"
