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
