"""Custom stateful operators with per-key state and event-time timers.

Re-expresses the reference's core abstraction — the ``Operator`` trait
(arcon/src/stream/operator/mod.rs:21-54: ``handle_element`` →
ElementIterator, ``handle_timeout``) plus the five ``arcon_state``
primitives (SURVEY.md §1.7):

| reference                       | here                                 |
|---------------------------------|--------------------------------------|
| ValueState<T> (backend/mod.rs:172) | ctx.value(name)                   |
| MapState<K,V>  (:183)           | ctx.map(name)                        |
| VecState<T>    (:194)           | ctx.vec(name)                        |
| ReducerState   (:204)           | ctx.reduce(name, fn, v)              |
| AggregatorState(:218)           | ctx.aggregate(name, add, init)       |
| ctx.schedule_at(time, ...)      | ctx.schedule_at(epoch_ms)            |
|   (operator/mod.rs:129-137)     |   (timer heap, earliest → timeout)   |

Execution vehicle: ``applyInPandasWithState`` over ``groupBy(keys)``.
The whole per-key state dict rides in one binary (pickle) field of the
GroupState — the moral equivalent of the reference persisting its
``ArconState`` struct to sled/rocks per epoch (the RocksDB state store
behind the scenes here IS the backend; SURVEY §1.7 mapping).

Timer parity (SURVEY §7 'What's hard' #1): the reference's quad-wheel
timer (stream/node/timer.rs:61-274) allows N pending timers per key;
``applyInPandasWithState`` exposes ONE timeout per key — so pending
timers live in a min-heap inside the state and the single timeout is
always set to the earliest. When a timeout fires, every timer whose
time <= current watermark is delivered, then the next earliest is
re-armed — exactly the reference's "advance wheel to watermark, fire
all due" (timer.rs:252-269, driven at node/mod.rs:379-395).

``apply_operator_batch`` runs the same Operator over a *batch*
DataFrame (groupBy().applyInPandas, events ordered by timestamp) so
operator logic is testable and oracle-checkable without a streaming
context — the reference similarly unit-tests operators by feeding
ordered ArconMessages (SURVEY §5 item 6).
"""

from __future__ import annotations

import heapq
import pickle
from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import BinaryType, StructField, StructType

STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])


class _Value:
    """ValueState: put/get/take/clear/rmw (reference index/mod.rs:133-157)."""

    def __init__(self, store: dict, name: str) -> None:
        self._store = store
        self._name = f"v:{name}"

    def get(self, default: Any = None) -> Any:
        return self._store.get(self._name, default)

    def put(self, value: Any) -> None:
        self._store[self._name] = value

    def take(self) -> Any:
        return self._store.pop(self._name, None)

    def clear(self) -> None:
        self._store.pop(self._name, None)

    def rmw(self, fn: Callable[[Any], Any], default: Any = None) -> Any:
        out = fn(self.get(default))
        self.put(out)
        return out


class _Map:
    """MapState (reference arcon_state MapOps)."""

    def __init__(self, store: dict, name: str) -> None:
        self._d = store.setdefault(f"m:{name}", {})

    def get(self, k: Any, default: Any = None) -> Any:
        return self._d.get(k, default)

    def put(self, k: Any, v: Any) -> None:
        self._d[k] = v

    def remove(self, k: Any) -> Any:
        return self._d.pop(k, None)

    def items(self):
        return self._d.items()

    def __len__(self) -> int:
        return len(self._d)


class _Vec:
    """VecState / AppenderIndex: append/consume/len
    (reference index/mod.rs:113-128)."""

    def __init__(self, store: dict, name: str) -> None:
        self._store = store
        self._name = f"a:{name}"
        self._store.setdefault(self._name, [])

    def append(self, v: Any) -> None:
        self._store[self._name].append(v)

    def consume(self) -> list:
        out = self._store[self._name]
        self._store[self._name] = []
        return out

    def get(self) -> list:
        return self._store[self._name]

    def __len__(self) -> int:
        return len(self._store[self._name])


class OperatorContext:
    """Per-(key, invocation) context handed to Operator methods —
    the reference's ``OperatorContext`` (operator/mod.rs:95-137):
    state access + ``schedule_at``."""

    def __init__(self, store: dict, key: tuple) -> None:
        self._store = store
        self.key = key

    # state primitives -----------------------------------------------------
    def value(self, name: str) -> _Value:
        return _Value(self._store, name)

    def map(self, name: str) -> _Map:
        return _Map(self._store, name)

    def vec(self, name: str) -> _Vec:
        return _Vec(self._store, name)

    def reduce(self, name: str, fn: Callable[[Any, Any], Any], v: Any) -> Any:
        """ReducerState: fold v into the running value."""
        cur = self._store.get(f"r:{name}")
        out = v if cur is None else fn(cur, v)
        self._store[f"r:{name}"] = out
        return out

    def reduced(self, name: str, default: Any = None) -> Any:
        """Read a ReducerState's current value without folding."""
        return self._store.get(f"r:{name}", default)

    def aggregate(
        self, name: str, add: Callable[[Any, Any], Any], v: Any, init: Callable[[], Any]
    ) -> Any:
        """AggregatorState: create/add (merge is the engine's job)."""
        cur = self._store.get(f"g:{name}")
        if cur is None:
            cur = init()
        out = add(cur, v)
        self._store[f"g:{name}"] = out
        return out

    # timers ---------------------------------------------------------------
    def schedule_at(self, when_ms: int, payload: Any = None) -> None:
        """Event-time timer (reference operator/mod.rs:129-137). Fires
        via handle_timeout once the watermark passes when_ms."""
        heapq.heappush(self._store.setdefault("t:", []), (when_ms, payload))


class Operator:
    """User operator base (reference Operator trait, operator/mod.rs:21-54).

    Subclass and override:
      handle_element(key, pdf, ctx) -> Iterable[dict] | pd.DataFrame | None
      handle_timeout(key, time_ms, payload, ctx) -> same
    Elements arrive as Arrow-batched pandas DataFrames per key (the
    reference batches too — 1024-element source batches)."""

    def handle_element(
        self, key: tuple, pdf: pd.DataFrame, ctx: OperatorContext
    ) -> Iterable[dict] | pd.DataFrame | None:
        raise NotImplementedError

    def handle_timeout(
        self, key: tuple, time_ms: int, payload: Any, ctx: OperatorContext
    ) -> Iterable[dict] | pd.DataFrame | None:
        return None


def _load(state: GroupState) -> dict:
    if state.exists:
        (blob,) = state.get
        if blob is not None:
            return pickle.loads(bytes(blob))
    return {}


def _emit(out, frames: list[pd.DataFrame]) -> None:
    if out is None:
        return
    if isinstance(out, pd.DataFrame):
        if len(out):
            frames.append(out)
    else:
        rows = list(out)
        if rows:
            frames.append(pd.DataFrame(rows))


def apply_operator(
    df: DataFrame,
    keys: list[str],
    operator: Operator,
    output_schema: StructType | str,
    ts_col: str | None = None,
    late_arrival: str = "0 seconds",
) -> DataFrame:
    """Wire an Operator into a streaming DataFrame:
    withWatermark → groupBy(keys) → applyInPandasWithState with
    EventTimeTimeout. The returned stream appends whatever the operator
    emits (multi-out supported, like the reference's ElementIterator)."""

    has_time = ts_col is not None
    if has_time:
        df = df.withWatermark(ts_col, late_arrival)

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        store = _load(state)
        ctx = OperatorContext(store, key)
        frames: list[pd.DataFrame] = []
        wm_ms = state.getCurrentWatermarkMs() if has_time else 0

        if state.hasTimedOut:
            timers = store.get("t:", [])
            while timers and timers[0][0] <= wm_ms:
                when, payload = heapq.heappop(timers)
                _emit(operator.handle_timeout(key, when, payload, ctx), frames)
        else:
            for pdf in pdfs:
                _emit(operator.handle_element(key, pdf, ctx), frames)

        timers = store.get("t:", [])
        if timers and has_time:
            # a timeout timestamp must be beyond the current watermark
            state.setTimeoutTimestamp(max(timers[0][0], wm_ms + 1))
        state.update((pickle.dumps(store),))
        yield from frames

    return df.groupBy(*keys).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout
        if has_time
        else GroupStateTimeout.NoTimeout,
    )


def apply_operator_batch(
    df: DataFrame,
    keys: list[str],
    operator: Operator,
    output_schema: StructType | str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Batch-mode harness for the same Operator: per key, elements are
    delivered in (order_cols) order, then all pending timers fire (the
    end-of-input watermark → +inf, reference node drains timers on
    final watermark). Semantically a single-epoch run of the stream."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        store: dict = {}
        ctx = OperatorContext(store, key)
        frames: list[pd.DataFrame] = []
        if order_cols:
            pdf = pdf.sort_values(order_cols, kind="mergesort")
        _emit(operator.handle_element(key, pdf, ctx), frames)
        timers = store.get("t:", [])
        while timers:
            when, payload = heapq.heappop(timers)
            _emit(operator.handle_timeout(key, when, payload, ctx), frames)
        return pd.concat(frames) if frames else pd.DataFrame()

    return df.groupBy(*keys).applyInPandas(fn, output_schema)
