"""Property-based tests (hypothesis) for the pure contracts the
oracle-matched queries rely on — the reference has no property tests
(SURVEY §5); these guard the invariants that make the cross-engine
determinism rules (plans/compat.py docstring) actually hold.

Spark-level semantics are covered by the example-based suites; these
exercise the Python mirrors of the arithmetic at thousands of random
points per run.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from arcon_spark.functions.multimodal import (
    RESIZE_TARGET,
    decode_image_stub,
    resize_dims_stub,
)

# ---------------------------------------------------------------------------
# exact-units aggregation (plans/compat.msum contract)
# ---------------------------------------------------------------------------


def _units(x: float, scale: int) -> int:
    # Python mirror of round(x * 10^s) with half-away-from-zero ties,
    # matching Spark/DuckDB round() on doubles
    v = x * float(10**scale)
    f = Decimal(v).to_integral_value(rounding="ROUND_HALF_UP" if v >= 0 else "ROUND_HALF_DOWN")
    return int(f)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
    st.randoms(),
)
@settings(max_examples=200, deadline=None)
def test_msum_units_are_order_and_partition_independent(xs, scale, rnd):
    """The integer-unit sum must be identical for any permutation and
    any partitioning (map-side partial aggregation reorders both ways
    at any parallelism)."""
    base = sum(_units(x, scale) for x in xs)
    shuffled = list(xs)
    rnd.shuffle(shuffled)
    assert sum(_units(x, scale) for x in shuffled) == base
    # partial-aggregate in random chunks, then merge
    cut = rnd.randrange(len(shuffled) + 1)
    partials = [
        sum(_units(x, scale) for x in shuffled[:cut]),
        sum(_units(x, scale) for x in shuffled[cut:]),
    ]
    assert sum(partials) == base


@given(
    st.lists(
        st.decimals(
            min_value=Decimal("-99999.99"),
            max_value=Decimal("99999.99"),
            places=2,
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_msum_exact_for_two_decimal_money(decs):
    """For true 2-decimal money values the unit sum divided back equals
    the exact Decimal sum — no fp drift regardless of magnitude mix."""
    units = sum(_units(float(d), 2) for d in decs)
    assert Decimal(units) / 100 == sum(decs)


# ---------------------------------------------------------------------------
# multimodal stubs
# ---------------------------------------------------------------------------


@given(st.integers(min_value=1, max_value=100_000), st.integers(min_value=1, max_value=100_000))
@settings(max_examples=500, deadline=None)
def test_resize_contract(w, h):
    ow, oh = resize_dims_stub(w, h)
    assert 1 <= ow <= RESIZE_TARGET and 1 <= oh <= RESIZE_TARGET
    assert max(ow, oh) == RESIZE_TARGET  # larger side lands exactly on target
    assert (w >= h) == (ow >= oh) or ow == oh  # aspect ordering preserved


@given(st.binary(min_size=0, max_size=4096))
@settings(max_examples=200, deadline=None)
def test_decode_stub_deterministic_and_bounded(payload):
    a = decode_image_stub(payload)
    b = decode_image_stub(payload)
    assert a == b
    assert 64 <= a["width"] < 64 + 640
    assert 64 <= a["height"] < 64 + 480
    assert 1 <= a["n_frames"] <= 16
    assert a["n_bytes"] == len(payload)


# ---------------------------------------------------------------------------
# token-budget packing (corpus_pack_bins rule)
# ---------------------------------------------------------------------------


@given(
    st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=4096),
)
@settings(max_examples=200, deadline=None)
def test_cumsum_packing_overflow_bounded_by_one_doc(tokens, budget):
    """bin_id = cum_before // budget ⟹ every bin's total is less than
    budget + the largest single document (one doc may straddle the
    boundary, never more) and bin ids are contiguous non-decreasing."""
    bins: dict[int, int] = {}
    cum = 0
    ids = []
    for n in tokens:
        b = cum // budget
        ids.append(b)
        bins[b] = bins.get(b, 0) + n
        cum += n
    assert ids == sorted(ids)
    max_doc = max(tokens)
    for total in bins.values():
        assert total < budget + max_doc or total == max_doc


# ---------------------------------------------------------------------------
# two-level exact sum (plans/compat.usum_partial/usum_final contract)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=6),
    st.randoms(),
)
@settings(max_examples=200, deadline=None)
def test_two_level_sum_equals_single_level_for_any_partitioning(xs, scale, rnd):
    """tpch_q1's two-level sum (long partials per partition, decimal
    final) must equal the direct integer-unit sum no matter how rows
    land in partitions — partition assignment is a runtime accident."""
    direct = sum(_units(x, scale) for x in xs)
    rnd.shuffle(xs)
    n_parts = rnd.randint(1, len(xs))
    partials = [0] * n_parts
    for i, x in enumerate(xs):
        partials[i % n_parts] += _units(x, scale)  # long arithmetic per partition
    assert sum(partials) == direct


# ---------------------------------------------------------------------------
# pareto frontier: two-pass threshold algorithm ≡ naive dominance
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # date bucket
            st.integers(min_value=0, max_value=1000),  # price
        ),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=200, deadline=None)
def test_pareto_threshold_algorithm_matches_naive_dominance(points):
    """pareto_frontier_orders replaces the O(n²) NOT EXISTS with
    per-date max → running max over strictly later dates → threshold
    filter. The two must select exactly the same points, including
    ties (survivors need price >= every strictly-later max)."""
    naive = [
        (d, p)
        for (d, p) in points
        if not any(d2 > d and p2 > p for (d2, p2) in points)
    ]
    per_date: dict[int, int] = {}
    for d, p in points:
        per_date[d] = max(per_date.get(d, -1), p)
    dates = sorted(per_date)
    later_max: dict[int, int | None] = {}
    running: int | None = None
    for d in reversed(dates):
        later_max[d] = running
        running = per_date[d] if running is None else max(running, per_date[d])
    fast = [
        (d, p)
        for (d, p) in points
        if later_max[d] is None or p >= later_max[d]
    ]
    assert sorted(naive) == sorted(fast)


# ---------------------------------------------------------------------------
# SCD2 run-length collapse: intervals must reconstruct the change log
# ---------------------------------------------------------------------------


@given(
    st.lists(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=50)
)
@settings(max_examples=200, deadline=None)
def test_scd2_runs_reconstruct_sequence_and_single_current(seq):
    """scd2_user_type_history's run-length collapse: versions must be
    contiguous from 1, valid_from/valid_to must chain without holes,
    exactly one open (is_current) row exists, and expanding the runs
    reproduces the original sequence."""
    runs = []  # (version, value, start_idx, n)
    for i, v in enumerate(seq):
        if not runs or runs[-1][1] != v:
            runs.append([len(runs) + 1, v, i, 1])
        else:
            runs[-1][3] += 1
    # contiguous versions, chained validity, one current
    for k, (ver, _, start, n) in enumerate(runs):
        assert ver == k + 1
        if k + 1 < len(runs):
            assert runs[k + 1][2] == start + n  # valid_to = next valid_from
    assert sum(1 for r in runs if r is runs[-1]) == 1
    rebuilt = [v for _, v, _, n in runs for v in [v] * n]
    assert rebuilt == seq


# ---------------------------------------------------------------------------
# Z-order key (operators/maintenance._z_expr contract)
# ---------------------------------------------------------------------------


def _z_py(x: int, y: int) -> int:
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zorder_sql_expr_matches_python_reference(pairs):
    """The generated DuckDB-syntax interleave expression computes the
    same Morton key as a bit-twiddling Python reference, and the key is
    injective (distinct (x, y) → distinct key)."""
    import duckdb

    from arcon_spark.operators.maintenance import _z_expr

    rows = ", ".join(f"({x}, {y})" for x, y in pairs)
    # BIGINT like the real oracle columns — INT32 literals overflow << 31
    sql = (
        f"SELECT {_z_expr('x', 'y', False)} AS z "
        f"FROM (SELECT CAST(x0 AS BIGINT) AS x, CAST(y0 AS BIGINT) AS y "
        f"      FROM (VALUES {rows}) AS t(x0, y0))"
    )
    got = [r[0] for r in duckdb.sql(sql).fetchall()]
    assert got == [_z_py(x, y) for x, y in pairs]
    assert len(set(_z_py(x, y) for x, y in set(pairs))) == len(set(pairs))


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=500),
)
@settings(max_examples=60, deadline=None)
def test_sweep_line_island_union_matches_brute_force(starts, width):
    """The island recurrence used by interval_coverage_users (running
    max end → island break on s > max_end) must compute exactly the
    measure and component count of the union of [s, s+width)
    intervals, for ANY multiset of starts — verified against a
    brute-force point-coverage oracle."""
    # operator-style sweep (mirrors the SQL/window formulation)
    xs = sorted(starts)
    n_islands = 0
    covered = 0
    cur_s = cur_e = None
    for s in xs:
        e = s + width
        if cur_s is None or s > cur_e:
            if cur_s is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
            n_islands += 1
        else:
            cur_e = max(cur_e, e)
    covered += cur_e - cur_s

    # brute force: union measure via coverage marks
    marks = set()
    for s in starts:
        marks.update(range(s, s + width))
    assert covered == len(marks)
    # brute force component count: gaps in the sorted coverage
    pts = sorted(marks)
    comps = 1 + sum(1 for a, b in zip(pts, pts[1:]) if b > a + 1)
    assert n_islands == comps


def test_hilbert_key_is_injective_on_random_sample(spark):
    """Hypothesis: distinct (x, y) grid points must map to distinct
    Hilbert keys (the curve is a bijection on the 256x256 grid) and
    every key lies in [0, 65536)."""
    from hypothesis import given, settings, strategies as st

    from arcon_spark.operators.maintenance import hilbert_key

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=255),
                st.integers(min_value=0, max_value=255),
            ),
            min_size=2,
            max_size=40,
            unique=True,
        )
    )
    def check(pts):
        df = spark.createDataFrame(pts, "px long, py long")
        rows = hilbert_key(df, "px", "py").collect()
        keys = [r.hkey for r in rows]
        assert all(0 <= k < 65536 for k in keys)
        assert len(set(keys)) == len(pts)

    check()


def test_h264_emulation_prevention_is_inverse_and_safe():
    """EP insertion never leaves a forbidden 00 00 0x (x<=3) triple and
    stripping is its exact inverse, for arbitrary zero-heavy payloads
    (the cascade case that broke the naive single-pass regex)."""
    from arcon_spark.functions.codecs import _ep_insert, _ep_strip

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=300).map(
        # bias hard toward 0x00-0x03 so zero runs and cascades dominate
        lambda b: bytes(x % 5 if x < 200 else x for x in b)
    ))
    def check(rbsp):
        nal = _ep_insert(rbsp)
        # spec constraint: within the NAL, no 00 00 pair may be
        # followed by a byte < 3 (a 3 there IS the emulation byte)
        i = 0
        while True:
            i = nal.find(b"\x00\x00", i)
            if i == -1 or i + 2 >= len(nal):
                break
            assert nal[i + 2] >= 3, (rbsp.hex(), nal.hex(), i)
            i += 1
        assert _ep_strip(nal) == rbsp

    check()


def test_h264_ipcm_roundtrip_property():
    """encode∘decode = identity for arbitrary frame contents and
    macroblock geometries — the I_PCM subset is exactly invertible."""
    import os as _os

    from arcon_spark.functions.codecs import h264_decode_ipcm, h264_encode_ipcm

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=3),  # width in MBs
        st.integers(min_value=1, max_value=3),  # height in MBs
        st.integers(min_value=1, max_value=4),  # frames
        st.randoms(use_true_random=False),
    )
    def check(wm, hm, nf, rnd):
        w, h = wm * 16, hm * 16
        frames = [bytes(rnd.randrange(256) for _ in range(w * h)) for _ in range(nf)]
        dec = h264_decode_ipcm(h264_encode_ipcm(frames, w, h))
        assert (dec["width"], dec["height"]) == (w, h)
        assert dec["frames"] == frames

    check()


def test_mojibake_table_matches_the_encoding_law():
    """Every (good, bad) repair pair must BE the UTF-8/CP1252 double
    encoding — recomputed here independently so the table in text.py
    can never drift from the real law it claims to invert."""
    from arcon_spark.functions.text import _MOJI_GOODS, _MOJI_PAIRS

    assert {g for g, _ in _MOJI_PAIRS} == set(_MOJI_GOODS)
    for good, bad in _MOJI_PAIRS:
        assert bad == good.encode("utf-8").decode("cp1252"), good
        assert len(good) == 1 and len(bad) in (2, 3)


@given(st.text(alphabet=st.sampled_from(list(
    "abc XYZ.,!?'\"\n\t0189" "éèêâçôîûùüöäñóáú°«»€–—…"
)), max_size=120))
@settings(max_examples=300, deadline=None)
def test_mojibake_corrupt_then_repair_is_identity(s):
    """The chained-replace corrupt pass (nesting-safe order) composed
    with the repair pass (longest-bad-first) is the identity on any
    text over ASCII + the repair alphabet — pure Python re-execution
    of the exact chains both engines run."""
    from arcon_spark.functions.text import _MOJI_PAIRS

    corrupted = s
    for good, bad in _MOJI_PAIRS:
        corrupted = corrupted.replace(good, bad)
    repaired = corrupted
    for good, bad in sorted(_MOJI_PAIRS, key=lambda p: -len(p[1])):
        repaired = repaired.replace(bad, good)
    assert repaired == s
