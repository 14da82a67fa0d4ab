"""arcon_spark — a PySpark-native analytics/streaming engine.

A from-scratch re-expression of the capabilities of cda-group/arcon
(a Rust state-first stream processor, see /root/reference) on top of
Apache Spark: DataFrame/SQL for the relational surface, Structured
Streaming for the dataflow/stateful surface, plus the large-scale
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) the reference never had.

Design stance (SURVEY.md §7): wrap Spark, don't re-implement it.
Arcon's hand-rolled runtime (channels, epochs, watermark alignment,
state backends) is Structured Streaming's job; what we provide is the
API surface, the operator semantics, and scale-aware query plans.
"""

from arcon_spark.session import get_spark
from arcon_spark.io import load_table, compact_files, TABLES
from arcon_spark.streaming.stream import Stream

__all__ = ["get_spark", "load_table", "compact_files", "Stream", "TABLES"]
__version__ = "0.1.0"
