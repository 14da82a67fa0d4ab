"""Native typed state on the fluent Stream API — the reference's
custom-Operator slot (examples/custom_operator.rs) on BOTH stateful
vehicles, plus the CUMULATE window assigner.

Pipeline 1: keyed running max via `.operator()` — the
applyInPandasWithState engine path (pickled-state blob per key).

Pipeline 2: the same logic via `.operator_tws()` — Spark 4's
transformWithStateInPandas with typed ValueState in RocksDB, speaking
the protobuf state protocol through the vendored runtime
(arcon_spark/protoshim; no protobuf wheel needed).

Pipeline 3: `.window(Cumulate(...))` — growing within-period windows
(Flink's third windowing TVF) emitting append-mode partials.

Run: python examples/native_state.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from arcon_spark import get_spark
from arcon_spark.streaming import Cumulate, Operator, Stream
from arcon_spark.streaming.tws import ROCKSDB_PROVIDER


def main() -> None:
    spark = get_spark("native_state_example")
    rows = [(i % 3, i, i * 1000) for i in range(30)]
    schema = "k long, v long, ts_ms long"

    # -- 1. engine path: applyInPandasWithState ------------------------
    class RunningMax(Operator):
        def handle_element(self, key, pdf, ctx):
            st = ctx.value("mx")
            mx = max(int(pdf["v"].max()), st.get() or 0)
            st.put(mx)
            return [{"k": int(key[0]), "running_max": mx}]

    out1 = (
        Stream.from_collection(spark, rows, schema)
        .key_by("k")
        .operator(RunningMax(), "k long, running_max long")
    )
    cap1 = out1.to_debug_capture("apipws_max").run()
    print("applyInPandasWithState:", sorted(
        (r.k, r.running_max) for r in cap1.data.collect())[-3:])

    # -- 2. native path: transformWithStateInPandas --------------------
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor

    class RunningMaxTws(StatefulProcessor):
        def init(self, handle) -> None:
            self.mx = handle.getValueState("mx", "m long")

        def handleInputRows(self, key, rows_it, timerValues):
            mx = self.mx.get()[0] if self.mx.exists() else 0
            for pdf in rows_it:
                mx = max(mx, int(pdf["v"].max()))
            self.mx.update((mx,))
            yield pd.DataFrame({"k": [int(key[0])], "running_max": [mx]})

        def close(self) -> None:
            pass

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    out2 = (
        Stream.from_collection(spark, rows, schema)
        .key_by("k")
        .operator_tws(RunningMaxTws(), "k long, running_max long")
    )
    cap2 = out2.to_debug_capture("tws_max").run()
    print("transformWithStateInPandas:", sorted(
        (r.k, r.running_max) for r in cap2.data.collect())[-3:])

    # -- 3. CUMULATE windows -------------------------------------------
    out3 = (
        Stream.from_collection(spark, rows, schema)
        .map(F.col("k"), F.col("v"), F.timestamp_millis(F.col("ts_ms")).alias("ts"))
        .with_timestamp_extractor("ts")
        .window(Cumulate("20 seconds", "5 seconds"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cap3 = out3.to_debug_capture("cumulate").run()
    got = sorted(
        (r.win_start.second, r.win_end.second + 60 * r.win_end.minute, r.n)
        for r in cap3.data.collect()
    )
    print("cumulate partials:", got[:4])


if __name__ == "__main__":
    main()
