"""Central query registry: every implemented operator from SURVEY.md §2
registers (a) a Spark callable and (b) its DuckDB oracle SQL here.

The driver contract (__spark_entry__.py) runs each Spark query at
sf0.01 side-by-side with the oracle and compares row-count + schema +
order-insensitive value hash. Cross-engine determinism rules used by
every registered query:

- Alias EVERY computed column identically in Spark and SQL.
- Float aggregations go through exact integer/decimal arithmetic
  (see arcon_spark.plans.compat) so sums are order-independent and
  bit-identical across engines.
- Any top-k / limit has a total (unique-key) ordering.
- Timestamps: Spark session TZ pinned to UTC; DuckDB is UTC-naive.

Cache lifecycle contract: query functions may persist() intermediate
frames that feed multiple branches of the returned (lazy) plan, so
they cannot unpersist before returning — the CALLER owns cleanup.
Long-lived sessions running many queries should clearCache() between
them (bench.py and tools/check_parity.py do); persisted blocks use
the default MEMORY_AND_DISK level, so even without cleanup they are
LRU-evicted under pressure rather than failing the session.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import arcon_spark.operators.relational  # noqa: F401
    import arcon_spark.operators.windows  # noqa: F401
    import arcon_spark.operators.stateful  # noqa: F401
    import arcon_spark.operators.temporal  # noqa: F401
    import arcon_spark.operators.analytics  # noqa: F401
    import arcon_spark.operators.maintenance  # noqa: F401
    import arcon_spark.operators.tpch  # noqa: F401
    import arcon_spark.functions.curation  # noqa: F401
    import arcon_spark.functions.dedup  # noqa: F401
    import arcon_spark.functions.graph  # noqa: F401
    import arcon_spark.functions.similarity  # noqa: F401
    import arcon_spark.functions.text  # noqa: F401
    import arcon_spark.functions.multimodal  # noqa: F401
    import arcon_spark.sources.python_datasource  # noqa: F401
    import arcon_spark.sources.arrow_ipc  # noqa: F401
    import arcon_spark.sources.avro_io  # noqa: F401
    import arcon_spark.proto  # noqa: F401
    import arcon_spark.sources.kafka_log  # noqa: F401
    import arcon_spark.sources.kafka_wire  # noqa: F401
    import arcon_spark.streaming.queries  # noqa: F401


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
