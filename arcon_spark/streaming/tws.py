"""transformWithState operators (Spark 4 native stateful API).

This is the closest Spark surface to the reference's state model
(reference: arcon/arcon_state/src/backend/mod.rs:144-242 — ValueState /
MapState / VecState / ReducerState / AggregatorState handles registered
against a backend): ``StatefulProcessorHandle`` hands out typed
ValueState / ListState / MapState objects persisted in the RocksDB
state store, plus per-key timers (the quad-wheel timer parity,
reference: arcon/src/stream/node/timer.rs:61-274).

PROTOBUF: the tWS Python worker speaks protobuf to the JVM state
server. This container has no ``google.protobuf`` wheel, so the engine
vendors a spec-conformant pure-Python runtime
(arcon_spark/protoshim — wire conformance pinned in
tests/test_protoshim.py) and bootstraps it onto the worker PYTHONPATH
before the JVM launches. A real protobuf install, when present, always
wins. The applyInPandasWithState twin (streaming/stateful.py) remains
the fallback surface covering the same five state primitives.

TWS_AVAILABLE is the import-try flag callers check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from arcon_spark.protoshim import ensure_protobuf

TWS_AVAILABLE = ensure_protobuf()

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def first_seen_processor():
    """StatefulProcessor enriching each element with the first value
    seen for its key — the reference's `Map::stateful` example
    (arcon/src/test/keyby_integration.rs:68-91) on native ValueState,
    plus a ListState audit trail and a MapState per-event-type counter
    to exercise all three handle kinds."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class FirstSeen(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # ValueState<T>  (reference backend/mod.rs:172-181)
            self.first = handle.getValueState("first", "v long")
            # VecState<T> → ListState  (reference backend/mod.rs:194-202)
            self.seen = handle.getListState("seen", "v long")
            # MapState<K,V>  (reference backend/mod.rs:183-191)
            self.counts = handle.getMapState("counts", "t string", "n long")

        def handleInputRows(self, key, rows, timerValues):
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                if not self.first.exists():
                    self.first.update((int(pdf["v"].iloc[0]),))
                first_v = self.first.get()[0]
                self.seen.appendList([(int(v),) for v in pdf["v"]])
                for t, n in pdf.groupby("t").size().items():
                    prev = self.counts.getValue((t,)) if self.counts.containsKey((t,)) else None
                    self.counts.updateValue((t,), (int(prev[0] if prev else 0) + int(n),))
                yield pd.DataFrame(
                    {
                        "k": [key[0]] * len(pdf),
                        "v": pdf["v"].astype("int64"),
                        "first_v": [first_v] * len(pdf),
                        "n_seen": [len(list(self.seen.get()))] * len(pdf),
                    }
                )

        def close(self) -> None:
            pass

    return FirstSeen()


def run_first_seen(df: DataFrame) -> DataFrame:
    """Apply the FirstSeen processor to a streaming frame with columns
    (k long, v long, t string). Caller must set the RocksDB provider
    (tWS requires it) before starting the query."""
    return df.groupBy("k").transformWithStateInPandas(
        first_seen_processor(),
        "k long, v long, first_v long, n_seen long",
        "Append",
        "None",
    )
