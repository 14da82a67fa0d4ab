"""Throughput measurement — the reference's MeasureSink on Spark.

The reference logs events/sec every ``log_freq`` records in a
forced-parallelism-1 sink (arcon/src/stream/operator/sink/measure.rs:
9-96, Yahoo streaming-benchmark logging style). On Spark the engine
already meters every micro-batch; a StreamingQueryListener surfaces
numInputRows / processedRowsPerSecond without adding an operator (let
alone a parallelism-1 chokepoint) to the pipeline.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MeasureListener(StreamingQueryListener):
    """Collects per-batch progress; ``rates`` is the rows/sec series —
    the MeasureSink log line equivalent."""

    def __init__(self) -> None:
        self.batches: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.batches.append(
            {
                "batch_id": p.batchId,
                "num_input_rows": p.numInputRows,
                "rows_per_sec": p.processedRowsPerSecond,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_rows(self) -> int:
        return sum(b["num_input_rows"] for b in self.batches)

    @property
    def rates(self) -> list[float]:
        return [b["rows_per_sec"] for b in self.batches if b["rows_per_sec"]]


def observed_metrics(df, name: str, *exprs):
    """Zero-cost inline metrics via Spark's Observation API — the
    `.measure(log_freq)` idea (reference MeasureSink) for BATCH jobs:
    accumulator-backed aggregates collected DURING the action, no
    second scan, no extra stage.

    Returns (instrumented_df, observation). After any action on the
    instrumented frame, `observation.get` yields the metric dict.
    Metrics must be aggregate expressions (count/sum/min/max/...) —
    they ride the existing task results as accumulators, which is why
    they're free at 100 TB while a separate `.agg()` audit would be a
    second full scan. Use for row-count reconciliation, null audits,
    and data-quality tripwires on production writes."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *exprs), obs
