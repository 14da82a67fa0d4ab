"""Structured-Streaming re-expression of the reference's dataflow API.

Module map (reference → here):

- Stream fluent API (arcon/src/dataflow/stream/*)        → stream.py
- ArconTime / timestamp extraction (stream/time/mod.rs)  → stream.py
- Window assigner semantics (operator/window/assigner.rs)→ stream.py
- Operator trait + state indexes + timers
  (stream/operator/mod.rs, arcon_state, node/timer.rs)   → stateful.py
- SnapshotManager / epoch catalog (manager/snapshot.rs)  → snapshot.py
- MeasureSink (operator/sink/measure.rs)                 → measure.py
- Sources (stream/source/*)                              → stream.py (Stream.from_*)
"""

from arcon_spark.streaming.stream import ArconTime, Cumulate, Stream, Tumbling, Sliding, Session
from arcon_spark.streaming.stateful import (
    Operator,
    OperatorContext,
    apply_operator,
    apply_operator_batch,
)
from arcon_spark.streaming.snapshot import SnapshotCatalog
from arcon_spark.streaming.measure import MeasureListener

__all__ = [
    "ArconTime",
    "Stream",
    "Tumbling",
    "Sliding",
    "Session",
    "Cumulate",
    "Operator",
    "OperatorContext",
    "apply_operator",
    "apply_operator_batch",
    "SnapshotCatalog",
    "MeasureListener",
]
