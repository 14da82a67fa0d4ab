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


#: The driver's pandas canonicalizer sorts/factorizes every output
#: column; numpy arrays, dicts and raw bytes are unhashable there, so
#: a query emitting these at top level is PERMANENTLY driver-red even
#: when value-parity passes (CORRECTNESS_r04 `vec_state_collect`).
#: This is a fixed external contract — no registered query may emit
#: them. Reshape: array_join/sort_array to a scalar string (mirror
#: with DuckDB array_to_string/list_sort), or emit per-element rows.
_DRIVER_UNHASHABLE = ("ArrayType", "MapType", "BinaryType", "StructType")


def _assert_driver_canon_safe(name, df):
    bad = [
        (f.name, f.dataType.typeName())
        for f in df.schema.fields
        if type(f.dataType).__name__ in _DRIVER_UNHASHABLE
    ]
    assert not bad, (
        f"{name}: top-level {bad} output column(s) — the driver's pandas "
        "canonicalizer cannot hash these; emit a joined string instead"
    )


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_runs_and_schema_matches_oracle(spark, sf_dir, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    _assert_driver_canon_safe(name, df)
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


def test_reshaped_array_queries_emit_scalar_strings(spark):
    """Regression for the r4 driver-red row: the two queries that used
    to emit ArrayType columns now emit '|'-joined scalar strings."""
    from arcon_spark.functions.similarity import embedding_quantize_int8
    from arcon_spark.operators.stateful import vec_state_collect

    sf = "/root/testdata/sf0.001"
    assert dict(vec_state_collect(spark, sf).dtypes)["event_types"] == "string"
    assert dict(embedding_quantize_int8(spark, sf).dtypes)["qvec"] == "string"


def test_oracle_covers_every_query():
    """CORRECTNESS badge requires a value oracle per query; a queries()
    entry with no oracle_sql() twin gets only a rows-only check (the
    r4 `approx_distinct_users` gap). Keep coverage at 100%."""
    missing = sorted(set(queries()) - set(oracle_sql()))
    assert not missing, f"queries with no oracle: {missing}"


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


# ---------------------------------------------------------------------------
# Determinism doctrine (locked from convention into contract, r6)
# ---------------------------------------------------------------------------

#: Call names that make a query's VALUES nondeterministic — anything
#: here breaks the 346-green invariant on the next parity run, because
#: DuckDB cannot replay it. (uuid in scratch-path names is fine; these
#: are flagged only when CALLED inside a registered query function.)
_NONDET_CALLS = {
    "rand",
    "randn",
    "random",
    "randint",
    "uniform",
    "choice",
    "shuffle",
    "monotonically_increasing_id",
    "current_timestamp",
    "current_date",
    "now",
}

#: Engine-specific approximate aggregates: their estimates differ
#: across engines, so they may appear only behind a contract-boolean
#: reshape that both engines agree on (the approx_distinct_users
#: pattern), never as raw output.
_APPROX_CALLS = {"approx_count_distinct", "percentile_approx", "approx_percentile"}
_APPROX_OK = {"approx_distinct_users"}

#: Oracle-side bans (regex over the SQL): DuckDB nondeterminism and
#: engine-specific sketches that can never hash-match Spark.
_ORACLE_BANNED = (
    r"\brandom\s*\(",
    r"\bsetseed\s*\(",
    r"\bgen_random_uuid\s*\(",
    r"\bnow\s*\(\)",
    r"\bcurrent_timestamp\b",
    r"\bcurrent_date\b",
    r"\bapprox_count_distinct\s*\(",
    r"\bapprox_quantile\s*\(",
    r"\breservoir_quantile\s*\(",
)


def _called_names(tree):
    import ast

    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Attribute):
                yield f.attr, node
            elif isinstance(f, ast.Name):
                yield f.id, node


def test_no_nondeterministic_calls_in_registered_queries():
    """The cross-engine determinism doctrine (micronat quantization,
    md5-seeded pseudo-randomness, integer fixed-point) is what makes
    every oracle value-hash match. This test turns the convention into
    a contract: no registered query function may call a
    nondeterministic or engine-specific-approximate function, and none
    may compute `x ** 0.5` (Python pow is not guaranteed to be the
    correctly-rounded sqrt that SQL sqrt / math.sqrt give)."""
    import ast
    import inspect
    import textwrap

    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            src = textwrap.dedent(inspect.getsource(spec.fn))
        except (OSError, TypeError):  # builtins / dynamically built
            continue
        tree = ast.parse(src)
        for called, node in _called_names(tree):
            if called in _NONDET_CALLS:
                offenders.append((name, called))
            if called in _APPROX_CALLS and name not in _APPROX_OK:
                offenders.append((name, called))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.BinOp)
                and isinstance(node.op, ast.Pow)
                and isinstance(node.right, ast.Constant)
                and node.right.value == 0.5
            ):
                offenders.append((name, "** 0.5 (use math.sqrt / np.sqrt)"))
    assert not offenders, f"nondeterministic constructs in queries: {offenders}"


def test_no_nondeterministic_sql_in_oracles():
    """Oracle side of the same contract: DuckDB nondeterminism or
    engine-specific sketches in an oracle would make the parity gate
    flaky or permanently red."""
    import re

    offenders = []
    for name, sql in sorted(oracle_sql().items()):
        low = sql.lower()
        for pat in _ORACLE_BANNED:
            if re.search(pat, low):
                offenders.append((name, pat))
    assert not offenders, f"banned SQL constructs in oracles: {offenders}"


def test_spark_sql_strings_avoid_rand_and_clock():
    """Registered queries build many expressions via F.expr(...) SQL
    strings — scan the string literals inside each registered function
    for rand()/clock calls the AST call-scan cannot see."""
    import ast
    import inspect
    import re
    import textwrap

    banned = re.compile(
        r"\brand\s*\(\)|\brandn\s*\(|\brandom\s*\(\)|\buuid\s*\(\)"
        r"|\bcurrent_timestamp\b|\bcurrent_date\b|\bnow\s*\(\)",
        re.IGNORECASE,
    )
    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        try:
            src = textwrap.dedent(inspect.getsource(spec.fn))
        except (OSError, TypeError):
            continue
        tree = ast.parse(src)
        # skip docstrings: only scan strings that are NOT a lone Expr
        # statement's value (module/function/class docstrings)
        doc_nodes = set()
        for node in ast.walk(tree):
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Module)):
                if (
                    node.body
                    and isinstance(node.body[0], ast.Expr)
                    and isinstance(node.body[0].value, ast.Constant)
                ):
                    doc_nodes.add(id(node.body[0].value))
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Constant)
                and isinstance(node.value, str)
                and id(node) not in doc_nodes
                and banned.search(node.value)
            ):
                offenders.append((name, node.value[:60]))
    assert not offenders, f"nondeterministic SQL strings in queries: {offenders}"


def test_generated_docs_match_registry_counts():
    """Doc-regen contract (r6 verdict #7): the counts stated in the
    generated docs must equal the registry at HEAD — QUERIES.md's
    header count and per-query sections, README's registry size, and
    SCALE.md's batch-plan table and summary line. These drifted across
    r6's three regenerations; a stale doc now fails CI instead of
    shipping. Regenerate with tools/queries_report.py and
    tools/scale_audit.py after any registry change."""
    import pathlib
    import re

    from arcon_spark.plans.registry import queries

    reg = queries()
    n = len(reg)
    n_batch = sum(1 for q in reg if not q.startswith("stream_"))
    repo = pathlib.Path(__file__).resolve().parent.parent

    queries_md = (repo / "QUERIES.md").read_text()
    m = re.search(r"^(\d+) queries;", queries_md, re.M)
    assert m and int(m.group(1)) == n, f"QUERIES.md header says {m and m.group(1)}, registry has {n}"
    sections = re.findall(r"^## ([a-z0-9_]+)\s", queries_md, re.M)
    assert len(sections) == n, f"QUERIES.md has {len(sections)} sections, registry {n}"
    assert set(sections) == set(reg)

    readme = (repo / "README.md").read_text()
    m = re.search(r"registry holds (\d+)", readme)
    assert m and int(m.group(1)) == n, f"README registry count {m and m.group(1)} != {n}"

    scale_md = (repo / "SCALE.md").read_text()
    rows = re.findall(r"^\| ([a-z0-9_]+) \| \d+ \|", scale_md, re.M)
    assert len(rows) == n_batch, f"SCALE.md table has {len(rows)} rows, batch registry {n_batch}"
    assert set(rows) == {q for q in reg if not q.startswith("stream_")}
    m = re.search(r"\*\*(\d+) batch queries\*\*", scale_md)
    assert m and int(m.group(1)) == n_batch


def test_bench_stdout_line_fits_driver_capture():
    """bench.py's stdout contract (r7): the driver captures only the
    LAST 2000 bytes of stdout and json-parses it — through r6 the full
    per-query line was ~4.5 KB, so every BENCH_r*.json recorded
    'parsed': null. The compact line must parse, fit the budget, trim
    slowest-first, and declare the trim explicitly."""
    import importlib.util
    import json
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "bench", pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    timings = {f"query_with_a_long_name_{i:03d}": 0.1 + i * 0.037 for i in range(120)}
    medians = {k: v * 1.5 for k, v in timings.items()}
    line = bench.stdout_line(
        timings, 99.9, 0.1, 3, 400.0, "bench_result.json", medians=medians
    )
    assert len(line) <= 1900
    d = json.loads(line)
    assert d["n_queries"] == 120
    assert d["queries_shown"] == len(d["queries"]) < 120
    # r8: the median table rides the same line, same names as the min
    # table (driver-artifact-only drift adjudication, VERDICT r7 #7)
    assert set(d["medians"]) == set(d["queries"])
    for k, v in d["medians"].items():
        assert abs(v - medians[k]) <= 0.005  # 2-decimal stdout trim
    # slowest-first: every shown entry >= every hidden entry (stdout
    # values are trimmed to 2 decimals, hence the half-ulp tolerance)
    hidden_max = max(v for k, v in timings.items() if k not in d["queries"])
    assert min(d["queries"].values()) >= hidden_max - 0.005
    # a small set is emitted whole
    small = {"a": 1.0, "b": 2.0}
    d2 = json.loads(bench.stdout_line(small, 3.0, 0.1, 2, 5.0, "x.json"))
    assert d2["queries"] == small and d2["queries_shown"] == 2
    assert d2["medians"] == small  # medians default to the min table


def test_generated_docs_match_source_digest():
    """Doc-staleness pin (VERDICT r8 #3): the count-based contract
    above let SCALE.md/PLANS.md go stale when r8 rewrote three kernels
    without changing the registry SIZE. Every doc-regen tool now
    stamps the sha256 digest of the arcon_spark package source it ran
    against (tools/doc_digest.py); this test recomputes the digest at
    HEAD and fails on mismatch — any package edit forces a doc regen
    (tools/queries_report.py, tools/scale_audit.py,
    tools/explain_report.py). Content-based rather than mtime-based:
    git checkouts rewrite mtimes wholesale."""
    import importlib.util
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "doc_digest", repo / "tools" / "doc_digest.py"
    )
    dd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(dd)
    want = dd.digest_line(str(repo))
    for doc in ("QUERIES.md", "SCALE.md", "PLANS.md"):
        text = (repo / doc).read_text()
        assert text.rstrip().endswith(want), (
            f"{doc} is stale for the current package source — regenerate it "
            f"(expected footer {want!r})"
        )
