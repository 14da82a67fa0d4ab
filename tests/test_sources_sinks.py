"""Source/sink surface tests (reference §2.1 / §2.5): text/csv/json
readers (LocalFileSource), file sinks, console/noop, streaming text
source round-trip.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from arcon_spark.streaming import Stream


def test_local_file_source_text_stream(spark):
    """LocalFileSource (local_file.rs:17-62): read a text file line by
    line, parse each line (the FromStr ≅ downstream map/cast)."""
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "input.txt"), "w") as f:
        f.write("\n".join(str(i) for i in range(10)))
    s = Stream.from_file(spark, d, fmt="text").map(
        parsed=F.col("value").cast("long")
    )
    q = s.to_debug("txt_src")
    q.processAllAvailable()
    q.stop()
    got = sorted(r.parsed for r in spark.table("txt_src").collect())
    assert got == list(range(10))


def test_csv_json_roundtrip(spark):
    """Structured readers + file sinks."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    d = tempfile.mkdtemp()
    df.write.csv(f"{d}/c", header=True)
    df.write.json(f"{d}/j")
    back_c = spark.read.csv(f"{d}/c", header=True, schema="id long, s string")
    back_j = spark.read.json(f"{d}/j", schema="id long, s string")
    assert sorted(map(tuple, back_c.collect())) == [(1, "a"), (2, "b")]
    assert sorted(map(tuple, back_j.collect())) == [(1, "a"), (2, "b")]


def test_streaming_file_sink_exactly_once(spark):
    """LocalFileSink ≅ checkpointed parquet sink: committed files only."""
    rows = [(i, i * 2) for i in range(20)]
    s = Stream.from_collection(spark, rows, "k long, v long")
    out = tempfile.mkdtemp()
    q = s.to_file(f"{out}/data")
    q.processAllAvailable()
    q.stop()
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 20


def test_noop_and_console_sinks_run(spark):
    s = Stream.from_collection(spark, [(1,)], "x long")
    q = s.to_ignore()
    q.processAllAvailable()
    q.stop()


def test_socket_sink_delivers_json_lines(spark):
    """SocketSink (reference socket.rs UDP sink test :114-153 ports to
    a TCP listener): every record arrives JSON-encoded."""
    import json
    import socket
    import threading

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(8)
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        srv.settimeout(0.5)
        while not stop.is_set():
            try:
                conn, _ = srv.accept()
            except socket.timeout:
                continue
            with conn:
                buf = b""
                while chunk := conn.recv(65536):
                    buf += chunk
                received.extend(
                    json.loads(l) for l in buf.decode().splitlines() if l
                )

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        s = Stream.from_collection(spark, [(i, i * 10) for i in range(7)], "k long, v long")
        q = s.to_socket("127.0.0.1", port)
        q.processAllAvailable()
        q.stop()
        import time as _t

        for _ in range(50):
            if len(received) >= 7:
                break
            _t.sleep(0.1)
    finally:
        stop.set()
        t.join(timeout=2)
        srv.close()
    assert sorted((r["k"], r["v"]) for r in received) == [(i, i * 10) for i in range(7)]


def test_measure_sink_counts(spark):
    rows = [(i,) for i in range(50)]
    s = Stream.from_collection(spark, rows, "x long")
    q, listener = s.measure()
    q.processAllAvailable()
    q.stop()
    import time as _t

    for _ in range(50):
        if listener.total_rows >= 50:
            break
        _t.sleep(0.1)
    spark.streams.removeListener(listener)
    assert listener.total_rows >= 50


def test_orc_source_and_sink(spark):
    """ORC as a first-class columnar format alongside parquet/csv/json
    (reference §2.1/§2.5 file IO surface): batch roundtrip, streaming
    ORC sink via to_file, and a streaming ORC source read back through
    the Stream API."""
    d = tempfile.mkdtemp()
    df = spark.createDataFrame([(i, f"s{i}") for i in range(12)], "id long, s string")
    df.write.orc(f"{d}/batch")
    assert sorted(r.id for r in spark.read.orc(f"{d}/batch").collect()) == list(range(12))

    s = Stream.from_collection(spark, [(i, i * 3) for i in range(9)], "k long, v long")
    q = s.to_file(f"{d}/stream_out", fmt="orc")
    q.processAllAvailable()
    q.stop()
    assert spark.read.orc(f"{d}/stream_out").count() == 9

    s2 = Stream.from_file(spark, f"{d}/stream_out", fmt="orc", schema="k long, v long")
    q2 = s2.to_debug("orc_src")
    q2.processAllAvailable()
    q2.stop()
    got = sorted((r.k, r.v) for r in spark.table("orc_src").collect())
    assert got == [(i, i * 3) for i in range(9)]


def test_socket_source_receives_lines(spark):
    """SocketSource end-to-end (reference stream/source/socket.rs — the
    TCP text source, dead code there, live here): a local TCP server
    feeds lines; the socket stream must deliver each line as one row.
    Mirrors the reference test's send-then-assert shape."""
    import socket
    import threading
    import time
    import uuid

    from arcon_spark.streaming.stream import Stream

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    lines = [f"line-{i}" for i in range(5)]

    def serve():
        conn, _ = srv.accept()
        with conn:
            for ln in lines:
                conn.sendall((ln + "\n").encode())
            time.sleep(3)  # keep the connection open past the first poll

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    s = Stream.from_socket(spark, "127.0.0.1", port)
    name = f"sock_src_{uuid.uuid4().hex[:8]}"
    q = (
        s.df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            got = {r["value"] for r in spark.table(name).collect()}
            if got >= set(lines):
                break
            time.sleep(0.5)
        assert got >= set(lines), got
    finally:
        q.stop()
        srv.close()


def test_rate_source_produces_rows(spark):
    """Rate source (the benchmarking/testing source; reference
    iterator-source analog for load generation): rows with
    (timestamp, value) must arrive."""
    import time
    import uuid

    from arcon_spark.streaming.stream import Stream

    s = Stream.from_rate(spark, rows_per_second=100)
    name = f"rate_{uuid.uuid4().hex[:8]}"
    q = (
        s.df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        n = 0
        while time.time() < deadline:
            n = spark.table(name).count()
            if n > 0:
                break
            time.sleep(0.5)
        assert n > 0
        assert set(spark.table(name).columns) == {"timestamp", "value"}
    finally:
        q.stop()


def test_python_datasource_stream_replays_collection_exactly(spark):
    """The Python DataSource's SimpleDataSourceStreamReader must
    deliver the full deterministic collection exactly once across
    offset-paced micro-batches (batch_size 40 over n=100 → ≥3
    batches), matching the batch read row-for-row."""
    from arcon_spark.sources import register_collection_source

    register_collection_source(spark)
    import time

    got = []
    q = (
        spark.readStream.format("arcon_collection")
        .option("n", "100")
        .option("batch_size", "40")
        .load()
        .writeStream.foreachBatch(lambda df, _bid: got.extend(df.collect()))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # a simple stream reader paces itself batch_size rows per trigger —
    # availableNow would stop after one read(); poll until drained
    deadline = time.time() + 120
    while len(got) < 100 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    batch = (
        spark.read.format("arcon_collection").option("n", "100").load().collect()
    )
    key = lambda r: (r.id, r.payload, r.ts)  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, batch))
    assert len(got) == 100


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution across parquet writes: a reader with
    mergeSchema unifies old (id, a) and new (id, a, b) file schemas,
    null-filling the added column for old rows — the contract a
    long-lived 100 TB table relies on when columns are added."""
    old = spark.createDataFrame([(1, "x")], "id long, a string")
    new = spark.createDataFrame([(2, "y", 5.0)], "id long, a string, b double")
    old.write.parquet(str(tmp_path / "t"), mode="append")
    new.write.parquet(str(tmp_path / "t"), mode="append")
    got = {
        r.id: (r.a, r.b)
        for r in spark.read.option("mergeSchema", "true")
        .parquet(str(tmp_path / "t"))
        .collect()
    }
    assert got == {1: ("x", None), 2: ("y", 5.0)}


def test_binaryfile_source_reads_blobs_with_metadata(spark, tmp_path):
    """The binaryFile format is the batch ingestion path for multimodal
    blobs (images/audio) — whole-file rows with path/length metadata
    and the content as a binary column, ready for mapInPandas decode
    stages (arcon_spark.functions.multimodal)."""
    import os

    blob_dir = tmp_path / "blobs"
    os.makedirs(blob_dir)
    payloads = {f"img_{i}.bin": bytes([i]) * (10 + i) for i in range(5)}
    for name, data in payloads.items():
        (blob_dir / name).write_bytes(data)

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(blob_dir))
    )
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}
    rows = df.collect()
    assert len(rows) == 5
    by_name = {r["path"].rsplit("/", 1)[-1]: r for r in rows}
    for name, data in payloads.items():
        assert bytes(by_name[name]["content"]) == data
        assert by_name[name]["length"] == len(data)


def test_socket_sink_udp_one_datagram_per_record(spark):
    """The wire-faithful UDP SocketSink (reference socket.rs:114-153
    `udp_sink_test`: a UDP receiver gets each element as one
    JSON-serialized datagram). Loopback UDP, so no datagram loss."""
    import json
    import socket
    import threading

    received = []
    srv = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    stop = threading.Event()

    def serve():
        srv.settimeout(0.5)
        while not stop.is_set():
            try:
                data, _ = srv.recvfrom(65536)
            except socket.timeout:
                continue
            received.append(json.loads(data.decode()))

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    try:
        s = Stream.from_collection(
            spark, [(i, i * 10) for i in range(7)], "k long, v long"
        )
        q = s.to_socket_udp("127.0.0.1", port)
        q.processAllAvailable()
        q.stop()
        import time as _t

        for _ in range(50):
            if len(received) >= 7:
                break
            _t.sleep(0.1)
    finally:
        stop.set()
        t.join(timeout=2)
        srv.close()
    # one datagram per record, each a standalone JSON object
    assert sorted((r["k"], r["v"]) for r in received) == [
        (i, i * 10) for i in range(7)
    ]
