"""Kafka wire protocol: broker/client framing, CRC, offset slicing,
and the Spark DataSource round trip (streaming/kafkawire.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_mastery_pipeline_spark.streaming import kafkawire as kw


@pytest.fixture(scope="module")
def broker():
    b = kw.MiniKafkaBroker().start()
    yield b
    b.stop()


def test_produce_fetch_roundtrip_with_null_key(broker):
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        base = c.produce("t_rt", [(b"k1", b"v1"), (None, b"v2")])
        assert base == 0
        assert c.list_offsets("t_rt", -2) == 0
        assert c.list_offsets("t_rt", -1) == 2
        hwm, msgs = c.fetch("t_rt", 0)
        assert hwm == 2
        assert msgs == [(0, b"k1", b"v1"), (1, None, b"v2")]


def test_fetch_pagination_respects_max_bytes(broker):
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        c.produce("t_page", [(b"k%d" % i, b"x" * 50) for i in range(10)])
        got, off = [], 0
        while off < 10:
            _hwm, page = c.fetch("t_page", off, max_bytes=150)
            assert 0 < len(page) < 10  # genuinely paginated
            got += page
            off = page[-1][0] + 1
        assert [o for o, _, _ in got] == list(range(10))


def test_crc_corruption_fails_loudly():
    raw = bytearray(kw.encode_message_set([(0, b"k", b"hello")]))
    raw[-1] ^= 0xFF  # flip a payload byte → CRC must catch it
    with pytest.raises(IOError, match="CRC mismatch"):
        kw.decode_message_set(bytes(raw))


def test_partial_trailing_message_dropped():
    full = kw.encode_message_set([(0, b"k", b"v"), (1, b"k2", b"v2")])
    # cut into the second message's body: decoder keeps message 0 only
    cut = full[: len(full) - 3]
    assert kw.decode_message_set(cut) == [(0, b"k", b"v")]


def test_metadata_lists_topic_and_broker(broker):
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        c.produce("t_meta", [(None, b"v")])
        brokers, topics = c.metadata(["t_meta"])
        assert brokers == [(0, broker.host, broker.port)]
        err, parts = topics["t_meta"]
        assert err == 0 and parts == [(0, 0, 0)]


def test_reader_offset_slices_cover_range_disjointly(broker):
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        c.produce("t_slices", [(None, b"v%d" % i) for i in range(17)])
    r = kw.KafkaWireReader(
        {"port": str(broker.port), "topic": "t_slices", "num_partitions": "4"}
    )
    parts = r.partitions()
    spans = [(p.start, p.end) for p in parts]
    assert spans[0][0] == 0 and spans[-1][1] == 17
    for (_, e1), (s2, _) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous, disjoint
    assert sum(e - s for s, e in spans) == 17


def test_datasource_roundtrip_executor_parallel(spark, broker):
    kw.register(spark)
    df = spark.range(100).select(
        F.col("id").cast("string").cast("binary").alias("key"),
        F.concat(F.lit("payload-"), F.col("id").cast("string"))
        .cast("binary")
        .alias("value"),
    )
    (
        df.write.format("kafka_wire")
        .option("port", broker.port)
        .option("topic", "t_spark")
        .mode("append")
        .save()
    )
    back = (
        spark.read.format("kafka_wire")
        .option("port", broker.port)
        .option("topic", "t_spark")
        .option("num_partitions", 8)
        .load()
    )
    rows = back.collect()
    assert len(rows) == 100
    assert sorted(r.offset for r in rows) == list(range(100))
    vals = sorted(bytes(r.value).decode() for r in rows)
    assert vals == sorted(f"payload-{i}" for i in range(100))


def test_writer_rejects_overwrite(spark, broker):
    kw.register(spark)
    df = spark.range(1).select(
        F.lit(b"k").alias("key"), F.lit(b"v").alias("value")
    )
    with pytest.raises(Exception, match="append-only"):
        (
            df.write.format("kafka_wire")
            .option("port", broker.port)
            .option("topic", "t_ow")
            .mode("overwrite")
            .save()
        )


def test_streaming_source_consumes_incrementally(spark, broker):
    """readStream over the wire source: a batch produced BEFORE the
    stream starts and one produced WHILE it runs both arrive; offsets
    advance with the log end."""
    import tempfile
    import time
    import uuid

    kw.register(spark)
    topic = f"t_stream_{uuid.uuid4().hex[:8]}"
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        c.produce(topic, [(None, b"early-%d" % i) for i in range(5)])

    name = f"kwire_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("kafka_wire")
        .option("port", broker.port)
        .option("topic", topic)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 5:
            time.sleep(0.2)
        assert spark.table(name).count() == 5
        with kw.KafkaWireClient(broker.host, broker.port) as c:
            c.produce(topic, [(None, b"late-%d" % i) for i in range(3)])
        while time.time() < deadline and spark.table(name).count() < 8:
            time.sleep(0.2)
    finally:
        q.stop()
    rows = spark.table(name).collect()
    assert sorted(r.offset for r in rows) == list(range(8))
    vals = {bytes(r.value).decode() for r in rows}
    assert {"early-0", "early-4", "late-0", "late-2"} <= vals


def test_stream_replay_is_exact(broker):
    """readBetweenOffsets (the checkpoint-WAL replay path) returns the
    identical rows for the identical offset pair — S8's guarantee."""
    import uuid

    topic = f"t_replay_{uuid.uuid4().hex[:8]}"
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        c.produce(topic, [(b"k%d" % i, b"v%d" % i) for i in range(10)])
    r = kw.KafkaWireStreamReader({"port": str(broker.port), "topic": topic})
    assert r.initialOffset() == {"offset": 0}
    it, end = r.read({"offset": 0})
    batch = list(it)  # read() returns an iterator (idle-tick contract)
    assert end == {"offset": 10} and len(batch) == 10
    replay = r.readBetweenOffsets({"offset": 3}, {"offset": 7})
    assert replay == batch[3:7]
    assert r.readBetweenOffsets({"offset": 7}, {"offset": 7}) == []


def test_strict_decode_rejects_tail_inside_entry_header():
    # ADVICE r05: a produce set cut INSIDE the 12-byte offset/size
    # header (0 < remaining < 12) must raise in strict mode, not be
    # silently accepted with the tail dropped
    full = kw.encode_message_set([(0, b"k", b"v"), (1, b"k2", b"v2")])
    first_len = len(kw.encode_message_set([(0, b"k", b"v")]))
    cut = full[: first_len + 5]  # 5 bytes into entry 2's header
    assert kw.decode_message_set(cut) == [(0, b"k", b"v")]  # fetch: legal
    with pytest.raises(IOError, match="trailing bytes"):
        kw.decode_message_set(cut, strict=True)


def test_strict_decode_rejects_negative_message_size():
    import struct as _s

    bad = _s.pack(">qi", 0, -5)
    with pytest.raises(IOError, match="negative message size"):
        kw.decode_message_set(bad, strict=True)


def test_broker_drops_connection_on_bad_frame_size(broker):
    # ADVICE r05: the 4-byte frame size is untrusted — a negative or
    # over-cap value must drop the connection, not crash the handler
    # or allocate unboundedly. The broker must stay healthy after.
    import socket as _sk
    import struct as _s

    for bad in (-1, kw._MAX_FRAME_BYTES + 1):
        with _sk.create_connection((broker.host, broker.port), timeout=5) as s:
            s.sendall(_s.pack(">i", bad))
            assert s.recv(4) == b""  # broker closed on us
    with kw.KafkaWireClient(broker.host, broker.port) as c:  # still alive
        c.produce("t_badframe", [(b"k", b"v")])
        _hwm, msgs = c.fetch("t_badframe", 0)
        assert msgs == [(0, b"k", b"v")]


def test_writer_chunks_large_partitions(broker):
    """Review r6: one frame per Spark partition breaks past the 64 MiB
    frame guard — the writer must chunk produces by byte budget. With a
    tiny budget, 100 rows must land complete and in order across many
    produce frames (and an empty partition must open no connection)."""
    import pyarrow as pa

    w = kw.KafkaWireWriter({"port": broker.port, "topic": "t_chunk"}, schema=None)
    w._CHUNK_BYTES = 64  # force many chunks
    rows = [(str(i).encode(), f"payload-{i}".encode()) for i in range(100)]
    # the writer is a DataSourceArrowWriter (r12): it consumes
    # RecordBatches, split here mid-stream to exercise batch boundaries
    def rb(chunk):
        ks, vs = zip(*chunk)
        return pa.RecordBatch.from_arrays(
            [pa.array(ks, type=pa.binary()), pa.array(vs, type=pa.binary())],
            names=["key", "value"],
        )

    w.write(iter([rb(rows[:37]), rb(rows[37:])]))
    got: list = []
    with kw.KafkaWireClient(broker.host, broker.port) as c:
        end = c.list_offsets("t_chunk", -1)
        off = 0
        while off < end:
            _hwm, msgs = c.fetch("t_chunk", off)
            assert msgs, "fetch made no progress"
            got.extend(msgs)
            off = msgs[-1][0] + 1
    assert len(got) == 100
    assert [v for _o, _k, v in got] == [v for _k, v in rows]
    # empty partition: no produce, no connection needed
    w2 = kw.KafkaWireWriter({"port": 1, "topic": "t_chunk"}, schema=None)
    w2.write(iter([]))  # port 1 unreachable — would raise if it connected
