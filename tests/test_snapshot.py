"""SnapshotCatalog (TSS) + MeasureListener tests."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from arcon_spark.streaming import MeasureListener, SnapshotCatalog
from tests.streaming_util import write_segments

SCHEMA = "key long, value long, ts timestamp"


def _ts(sec: float):
    import datetime

    return datetime.datetime(1970, 1, 1) + datetime.timedelta(seconds=sec)


def test_snapshot_catalog_epochs_and_time_travel(spark):
    """Each micro-batch commits an epoch snapshot; snapshots are
    readable per epoch and via latest() — the reference's
    SnapshotManager catalog (manager/snapshot.rs:50-57) + the TSS
    query promise."""
    segments = [
        [(1, 10, _ts(1)), (2, 20, _ts(2))],
        [(1, 30, _ts(3))],
    ]
    root = write_segments(spark, SCHEMA, segments)
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(root)

    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="arcon_snap_"))
    q = (
        src.writeStream.foreachBatch(cat.writer("raw_events"))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="arcon_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    eps = cat.epochs("raw_events")
    assert eps == [0, 1], eps
    assert cat.read("raw_events", 0).count() == 2
    assert cat.read("raw_events", 1).count() == 1
    # time-travel query over a committed snapshot
    top = cat.latest("raw_events").agg(F.max("value").alias("m")).collect()[0].m
    assert top == 30


def test_measure_listener_counts_rows(spark):
    """MeasureSink equivalent (operator/sink/measure.rs): listener
    records per-batch input rows and rates."""
    segments = [[(i, i, _ts(i)) for i in range(100)]]
    root = write_segments(spark, SCHEMA, segments)
    listener = MeasureListener()
    spark.streams.addListener(listener)
    try:
        src = spark.readStream.schema(SCHEMA).parquet(root)
        q = src.writeStream.format("noop").trigger(availableNow=True).start()
        q.processAllAvailable()
        q.stop()
        # listener delivery is async; give it a moment
        import time

        for _ in range(50):
            if listener.total_rows >= 100:
                break
            time.sleep(0.1)
        assert listener.total_rows >= 100
    finally:
        spark.streams.removeListener(listener)


def test_checkpoint_recovery_exactly_once(spark):
    """Exactly-once across a stop/restart (reference §2.7: aligned epoch
    barriers + replayable source ≅ checkpointed offsets + transactional
    file sink): rows arriving before the stop and after the restart all
    land exactly once in the sink."""
    import os
    import shutil
    import time

    from arcon_spark.streaming.tape import write_segments

    seg1 = spark.createDataFrame([(i, _ts(i)) for i in range(10)], "k long, ts timestamp")
    seg2 = spark.createDataFrame([(i, _ts(i)) for i in range(10, 25)], "k long, ts timestamp")
    root = write_segments([seg1])

    ckpt = tempfile.mkdtemp(prefix="arcon_recover_ckpt_")
    sink = tempfile.mkdtemp(prefix="arcon_recover_sink_") + "/out"

    def start_query():
        src = spark.readStream.schema("k long, ts timestamp").parquet(root)
        return (
            src.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = start_query()
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(sink).count() == 10

    # new data lands while the query is DOWN; mtime after seg1
    part = root + "_tmp"
    seg2.coalesce(1).write.parquet(part)
    files = [
        os.path.join(dp, n)
        for dp, _, ns in os.walk(part)
        for n in ns
        if n.endswith(".parquet")
    ]
    dst = os.path.join(root, "later.parquet")
    shutil.copyfile(files[0], dst)
    now = time.time() + 60
    os.utime(dst, (now, now))
    shutil.rmtree(part)

    # restart from the same checkpoint: only NEW rows are processed
    q2 = start_query()
    q2.processAllAvailable()
    q2.stop()
    got = sorted(r.k for r in spark.read.parquet(sink).collect())
    assert got == list(range(25)), got  # each row exactly once


def test_snapshot_expire_keeps_recent_epochs(spark):
    """Retention vacuum: expire() drops old epochs from the manifest
    and disk but time travel over the kept window still works."""
    import os

    segments = [[(i, i * 10, _ts(i))] for i in range(4)]
    root = write_segments(spark, SCHEMA, segments)
    src = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(root)
    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="arcon_snap_"))
    q = (
        src.writeStream.foreachBatch(cat.writer("s"))
        .option("checkpointLocation", tempfile.mkdtemp(prefix="arcon_ckpt_"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert cat.epochs("s") == [0, 1, 2, 3]

    expired = cat.expire("s", keep_last=2)
    assert expired == [0, 1]
    assert cat.epochs("s") == [2, 3]
    assert not os.path.exists(os.path.join(cat.root, "s", "epoch=0"))
    assert cat.read("s", 2).count() == 1  # kept epoch still queryable
    assert cat.latest("s").count() == 1
    assert cat.expire("s", keep_last=2) == []  # idempotent


def test_snapshot_catalog_epoch_sweep_vacuum_under_reader_load(spark, tmp_path):
    """Scale probe for the manifest-first vacuum: 120 committed epochs
    (reference SnapshotManager keeps every epoch, manager/snapshot.rs:
    50-57 — here retention is real), expire(keep_last=20) every 10
    epochs while a concurrent reader hammers latest() — the commit
    order (shrink manifest, THEN delete data) means a reader working
    from a fresh manifest must never hit a missing path. Ends by
    checking the manifest and the on-disk epoch dirs agree exactly."""
    import os
    import threading

    from pyspark.sql import functions as F

    from arcon_spark.streaming.snapshot import SnapshotCatalog

    root = str(tmp_path / "snaps")
    cat = SnapshotCatalog(spark, root)
    sid = "user_stats"
    write = cat.writer(sid)
    stop = threading.Event()
    errors: list[str] = []
    reads = [0]

    def reader():
        while not stop.is_set():
            try:
                eps = cat.epochs(sid)
                if eps:
                    # newest epoch: committed before it is listed, and
                    # never the vacuum's victim
                    assert cat.read(sid, eps[-1]).count() == 3
                    reads[0] += 1
            except Exception as e:  # noqa: BLE001
                errors.append(f"{type(e).__name__}: {e}")
                break

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    keep = 20
    try:
        for e in range(120):
            write(spark.range(3).withColumn("epoch", F.lit(e)), e)
            if e % 10 == 9:
                expired = cat.expire(sid, keep_last=keep)
                assert all(x <= e - keep for x in expired), (e, expired)
    finally:
        stop.set()
        t.join(timeout=120)
    assert not errors, errors
    assert reads[0] > 0  # the reader actually raced the vacuum
    cat.expire(sid, keep_last=keep)
    eps = cat.epochs(sid)
    assert len(eps) == keep and eps[-1] == 119 and eps[0] == 100
    for e in eps:
        assert cat.read(sid, e).count() == 3
    on_disk = {d for d in os.listdir(os.path.join(root, sid)) if d.startswith("epoch=")}
    assert on_disk == {f"epoch={e}" for e in eps}


def test_repartition_checkpoint_rescaled_restart(spark):
    """State rescaling via the catalog (VERDICT r7 #6, SURVEY §7#3):
    Spark pins a streaming checkpoint's shuffle width forever at first
    start, and the reference only DESIGNED key-range rescaling. The
    catalog closes the gap because keyed state is already exported as
    DataFrames: run a counting query at width 8, snapshot its state,
    repartition_checkpoint it to width 3, restart the query with a
    FRESH checkpoint at width 3 seeded through tWS initialState — and
    the merged result must equal a plain batch count over ALL input,
    i.e. the rescale lost and invented nothing."""
    import os

    import pandas as pd
    import pytest
    from pyspark.sql.streaming import StatefulProcessor

    from arcon_spark.streaming.tws import ROCKSDB_PROVIDER, TWS_AVAILABLE

    if not TWS_AVAILABLE:
        pytest.skip("protobuf bootstrap failed")

    class Count(StatefulProcessor):
        """Per-key running count; emits the post-batch count per key
        (the exported state row). handleInitialState makes the same
        processor restartable from a catalog snapshot."""

        def init(self, handle) -> None:
            self.n = handle.getValueState("n", "n long")

        def handleInitialState(self, key, initialState, timerValues) -> None:
            self.n.update((int(initialState["n"].iloc[0]),))

        def handleInputRows(self, key, rows, timerValues):
            n = self.n.get()[0] if self.n.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self.n.update((n,))
            yield pd.DataFrame({"k": [key[0]], "n": [n]})

        def close(self) -> None:
            pass

    # phase-1 input: keys 0..9 x3; phase-2 input: keys 5..14 x2
    rows_a = [(k, i) for k in range(10) for i in range(3)]
    rows_b = [(k, i) for k in range(5, 15) for i in range(2)]
    seg_a = spark.createDataFrame(rows_a, "k long, v long")
    seg_b = spark.createDataFrame(rows_b, "k long, v long")
    root_a = write_segments(spark, "k long, v long", [rows_a])
    root_b = write_segments(spark, "k long, v long", [rows_b])
    cat = SnapshotCatalog(spark, tempfile.mkdtemp(prefix="arcon_rescale_"))

    skey = "spark.sql.shuffle.partitions"
    pkey = "spark.sql.streaming.stateStore.providerClass"
    prev_s, prev_p = spark.conf.get(skey), spark.conf.get(pkey, None)
    spark.conf.set(pkey, ROCKSDB_PROVIDER)
    try:
        # phase 1 at width 8
        spark.conf.set(skey, "8")
        q = (
            spark.readStream.schema("k long, v long")
            .parquet(root_a)
            .groupBy("k")
            .transformWithStateInPandas(Count(), "k long, n long", "Append", "None")
            .writeStream.foreachBatch(cat.writer("counts"))
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="arcon_rescale_c1_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        assert cat.latest("counts").count() == 10

        # in-place rescale is forbidden: the overwrite write would
        # target the same epoch directory being read (ADVICE r8)
        import pytest

        with pytest.raises(ValueError, match="dest_state_id"):
            cat.repartition_checkpoint("counts", ["k"], 3, dest_state_id="counts")

        # rescale the exported state 8 -> 3
        seed_path = cat.repartition_checkpoint("counts", ["k"], 3)
        files = [f for f in os.listdir(seed_path) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 3  # physically rewritten at the new width
        manifest = cat.epochs("counts__p3")
        assert manifest == cat.epochs("counts")  # epoch carried over

        # phase 2: FRESH checkpoint at width 3, state seeded from the
        # rescaled snapshot
        spark.conf.set(skey, "3")
        seed = cat.latest("counts__p3").groupBy("k")
        q2 = (
            spark.readStream.schema("k long, v long")
            .parquet(root_b)
            .groupBy("k")
            .transformWithStateInPandas(
                Count(), "k long, n long", "Append", "None", initialState=seed
            )
            .writeStream.foreachBatch(cat.writer("counts_p3"))
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="arcon_rescale_c2_")
            )
            .trigger(availableNow=True)
            .start()
        )
        q2.processAllAvailable()
        q2.stop()

        # merged final state: phase-2 rows win, untouched keys keep the
        # seed value — and the whole thing must equal the batch truth
        got = {r.k: r.n for r in cat.latest("counts__p3").collect()}
        got.update({r.k: r.n for r in cat.latest("counts_p3").collect()})
        truth = {
            r.k: r.n
            for r in seg_a.unionAll(seg_b).groupBy("k").agg(F.count("*").alias("n")).collect()
        }
        assert got == truth
    finally:
        spark.conf.set(skey, prev_s)
        if prev_p is not None:
            spark.conf.set(pkey, prev_p)
        else:
            spark.conf.unset(pkey)
