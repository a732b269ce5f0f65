"""From-scratch Kafka WIRE PROTOCOL — minimal broker + client + Spark
Python DataSource, all stdlib.

The reference's backbone is a Kafka producer/consumer pair
(weather_producer.py:132-199 publishes JSON with a city key;
kafka_consumer_s3.py:127-160 polls, batches, lands parquet). The
container ships no broker and no Kafka connector jar, so rounds 1-4
covered S3/S4 at the FORMAT level only (streaming/kafka.py). This
module closes the wire gap the same way sources/pgwire.py did for
JDBC: implement the actual binary protocol from the public spec
(https://kafka.apache.org/protocol — v0 APIs, the stable original
wire format) and drive it over real TCP sockets:

  Metadata (key 3, v0)     broker/topic/partition discovery
  Produce (key 0, v0)      append a message set, acks=1
  Fetch (key 1, v0)        offset-addressed batch read
  ListOffsets (key 2, v0)  earliest(-2)/latest(-1) offsets

MessageSet v0 entry: offset int64 | size int32 | crc32 int32 (over
magic..value) | magic=0 int8 | attributes=0 int8 | key bytes | value
bytes (length-prefixed, -1 = null). CRC is verified on every read —
a framing bug fails loudly, not with garbage rows.

The broker (`MiniKafkaBroker`) is a threaded in-process TCP server:
one node, one partition per topic, an append-only in-memory log —
the smallest thing that makes the PROTOCOL real. The Spark source
(`kafka_wire`) mirrors the real Kafka connector's planning model:
the driver asks ListOffsets for [earliest, latest), slices the offset
range into N input partitions, and each EXECUTOR task opens its own
socket and fetches only its slice — S4's parallel-consumption shape,
S8's offset-bounded semantics. The writer is the S3 keyed sink:
each Spark partition produces its rows as one keyed message set.

At scale the broker is an external cluster and partitions map to real
Kafka partitions (one input slice per partition-offset-range, exactly
this planner's shape); the client/codec here still applies verbatim.

Deliberately NOT implemented (documented contract): consumer groups /
coordinators (Spark-style sources track offsets themselves — S8),
compression attributes, and the v2 record-batch format.
"""

from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
import zlib

# ---------------------------------------------------------------- codec

_API_PRODUCE = 0
_API_FETCH = 1
_API_LIST_OFFSETS = 2
_API_METADATA = 3


def _enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def _enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


class _Cursor:
    """Big-endian struct reader over a buffer."""

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, fmt: str):
        vals = struct.unpack_from(">" + fmt, self.buf, self.pos)
        self.pos += struct.calcsize(">" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def string(self) -> str | None:
        n = self.take("h")
        if n == -1:
            return None
        s = self.buf[self.pos : self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def bytes_(self) -> bytes | None:
        n = self.take("i")
        if n == -1:
            return None
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def remaining(self) -> int:
        return len(self.buf) - self.pos


def _encode_message(key: bytes | None, value: bytes | None) -> bytes:
    """v0 message body (magic..value) with its CRC prefix."""
    body = struct.pack(">bb", 0, 0) + _enc_bytes(key) + _enc_bytes(value)
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_message_set(
    entries: list[tuple[int, bytes | None, bytes | None]]
) -> bytes:
    """[(offset, key, value)] → wire message set."""
    out = io.BytesIO()
    for offset, key, value in entries:
        msg = _encode_message(key, value)
        out.write(struct.pack(">qi", offset, len(msg)))
        out.write(msg)
    return out.getvalue()


def decode_message_set(
    buf: bytes, strict: bool = False
) -> list[tuple[int, bytes | None, bytes | None]]:
    """Wire message set → [(offset, key, value)]; CRC-checked. A
    trailing partial message is LEGAL in Fetch v0 responses (dropped),
    but a Produce request must be complete — ``strict=True`` raises on
    truncation instead of silently acking a half-landed set."""
    cur = _Cursor(buf)
    out: list[tuple[int, bytes | None, bytes | None]] = []
    while cur.remaining() >= 12:
        offset, size = cur.take("qi")
        if size < 0:
            raise IOError(f"kafka_wire: negative message size {size}")
        if cur.remaining() < size:
            if strict:
                raise IOError(
                    f"kafka_wire: truncated message set (need {size} bytes "
                    f"at offset {offset}, have {cur.remaining()})"
                )
            break  # partial trailing message (fetch semantics)
        msg = cur.buf[cur.pos : cur.pos + size]
        cur.pos += size
        crc = struct.unpack_from(">I", msg, 0)[0]
        body = msg[4:]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise IOError(f"kafka_wire: CRC mismatch at offset {offset}")
        mcur = _Cursor(body)
        magic, _attrs = mcur.take("bb")
        if magic != 0:
            raise IOError(f"kafka_wire: unsupported magic {magic}")
        key = mcur.bytes_()
        value = mcur.bytes_()
        out.append((offset, key, value))
    if strict and cur.remaining():
        # a tail cut INSIDE the 12-byte offset/size header (0 < rem < 12)
        # would otherwise be silently dropped — produce must be complete
        raise IOError(
            f"kafka_wire: truncated message set ({cur.remaining()} trailing "
            "bytes inside an entry header)"
        )
    return out


# Frame-size sanity cap (broker AND client side): the real broker's
# socket.request.max.bytes default is 100 MiB; 64 MiB is ample for the
# message-set sizes this v0 path produces.
_MAX_FRAME_BYTES = 64 * 1024 * 1024


def _read_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("kafka_wire: peer closed mid-frame")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


# ---------------------------------------------------------------- broker


class _TopicLog:
    """Single-partition append-only in-memory log."""

    def __init__(self) -> None:
        self.entries: list[tuple[bytes | None, bytes | None]] = []
        self.lock = threading.Lock()

    def append(self, msgs: list[tuple[bytes | None, bytes | None]]) -> int:
        with self.lock:
            base = len(self.entries)
            self.entries.extend(msgs)
            return base

    def slice(self, start: int, max_bytes: int):
        # bound the copy under the lock by what max_bytes can possibly
        # carry (26 B is the minimum wire size per entry) — an
        # unbounded tail copy per fetch is O(remaining) while producers
        # block on the lock
        with self.lock:
            snapshot = self.entries[start : start + max_bytes // 26 + 1]
        out, size = [], 0
        for i, (k, v) in enumerate(snapshot):
            m = 12 + 4 + 2 + len(k or b"") + 4 + len(v or b"") + 4
            if out and size + m > max_bytes:
                break
            out.append((start + i, k, v))
            size += m
        return out

    def __len__(self) -> int:
        with self.lock:
            return len(self.entries)


class MiniKafkaBroker:
    """One-node, one-partition-per-topic wire-protocol broker."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.topics: dict[str, _TopicLog] = {}
        self._tlock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                while True:
                    try:
                        size = struct.unpack(">i", _read_exact(self.request, 4))[0]
                        # the 4-byte frame size is untrusted input: a
                        # negative value would make recv() raise deep in
                        # _read_exact, a huge one would allocate
                        # unboundedly — validate, then drop the peer
                        if not 0 <= size <= _MAX_FRAME_BYTES:
                            return
                        req = _read_exact(self.request, size)
                    except (ConnectionError, OSError):
                        return  # client hung up between frames — normal
                    try:
                        resp = broker._dispatch(req)
                    except Exception:
                        # protocol error (bad CRC, unsupported version,
                        # unknown api): IOError is OSError in py3, so a
                        # blanket handler would silently eat it as a
                        # hangup — log loudly, then drop the connection
                        import traceback

                        traceback.print_exc()
                        return
                    try:
                        self.request.sendall(struct.pack(">i", len(resp)) + resp)
                    except (ConnectionError, OSError):
                        return

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="mini-kafka", daemon=True
        )

    def start(self) -> "MiniKafkaBroker":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    def _log(self, topic: str) -> _TopicLog:
        with self._tlock:
            return self.topics.setdefault(topic, _TopicLog())

    def drop_topic(self, topic: str) -> None:
        """Delete a topic's log (admin surface — callers with
        per-invocation uuid topics reclaim the PREVIOUS one here, or a
        long-lived in-process broker would retain every batch ever
        produced)."""
        with self._tlock:
            self.topics.pop(topic, None)

    # -- request dispatch

    def _dispatch(self, req: bytes) -> bytes:
        cur = _Cursor(req)
        api_key, api_version, corr_id = cur.take("hhi")
        cur.string()  # client_id
        if api_version != 0:
            raise IOError(f"kafka_wire broker: only v0 supported, got v{api_version}")
        body = {
            _API_PRODUCE: self._produce,
            _API_FETCH: self._fetch,
            _API_LIST_OFFSETS: self._list_offsets,
            _API_METADATA: self._metadata,
        }[api_key](cur)
        return struct.pack(">i", corr_id) + body

    def _metadata(self, cur: _Cursor) -> bytes:
        n = cur.take("i")
        names = [cur.string() for _ in range(n)]
        if not names:
            with self._tlock:
                names = sorted(self.topics)
        out = io.BytesIO()
        out.write(struct.pack(">i", 1))  # one broker
        out.write(struct.pack(">i", 0) + _enc_str(self.host) + struct.pack(">i", self.port))
        out.write(struct.pack(">i", len(names)))
        for t in names:
            out.write(struct.pack(">h", 0) + _enc_str(t))
            out.write(struct.pack(">i", 1))  # one partition
            out.write(struct.pack(">hiii", 0, 0, 0, 1))  # err, id, leader, |replicas|
            out.write(struct.pack(">i", 0))  # replicas = [0]
            out.write(struct.pack(">ii", 1, 0))  # isr = [0]
        return out.getvalue()

    def _produce(self, cur: _Cursor) -> bytes:
        _acks, _timeout = cur.take("hi")
        n_topics = cur.take("i")
        out = io.BytesIO()
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic = cur.string()
            n_parts = cur.take("i")
            out.write(_enc_str(topic) + struct.pack(">i", n_parts))
            for _ in range(n_parts):
                pid, set_size = cur.take("ii")
                raw = cur.buf[cur.pos : cur.pos + set_size]
                cur.pos += set_size
                msgs = decode_message_set(raw, strict=True)
                base = self._log(topic).append([(k, v) for _, k, v in msgs])
                out.write(struct.pack(">ihq", pid, 0, base))
        return out.getvalue()

    def _fetch(self, cur: _Cursor) -> bytes:
        cur.take("iii")  # replica_id, max_wait, min_bytes
        n_topics = cur.take("i")
        out = io.BytesIO()
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic = cur.string()
            n_parts = cur.take("i")
            out.write(_enc_str(topic) + struct.pack(">i", n_parts))
            log = self._log(topic)
            for _ in range(n_parts):
                pid, offset, max_bytes = cur.take("iqi")
                entries = log.slice(offset, max_bytes)
                ms = encode_message_set(entries)
                out.write(struct.pack(">ihqi", pid, 0, len(log), len(ms)))
                out.write(ms)
        return out.getvalue()

    def _list_offsets(self, cur: _Cursor) -> bytes:
        cur.take("i")  # replica_id
        n_topics = cur.take("i")
        out = io.BytesIO()
        out.write(struct.pack(">i", n_topics))
        for _ in range(n_topics):
            topic = cur.string()
            n_parts = cur.take("i")
            out.write(_enc_str(topic) + struct.pack(">i", n_parts))
            log = self._log(topic)
            for _ in range(n_parts):
                pid, time_, _max = cur.take("iqi")
                off = 0 if time_ == -2 else len(log)
                out.write(struct.pack(">ihi", pid, 0, 1) + struct.pack(">q", off))
        return out.getvalue()


# ---------------------------------------------------------------- client


class KafkaWireClient:
    """Blocking single-connection client (one per executor task)."""

    def __init__(self, host: str, port: int, client_id: str = "dmps"):
        self.sock = socket.create_connection((host, port), timeout=30)
        self.client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _call(self, api_key: int, body: bytes) -> _Cursor:
        self._corr += 1
        hdr = struct.pack(">hhi", api_key, 0, self._corr) + _enc_str(self.client_id)
        req = hdr + body
        self.sock.sendall(struct.pack(">i", len(req)) + req)
        size = struct.unpack(">i", _read_exact(self.sock, 4))[0]
        if not 0 <= size <= _MAX_FRAME_BYTES:  # same guard as the broker:
            raise IOError(f"kafka_wire: bad frame size {size}")  # untrusted input
        resp = _read_exact(self.sock, size)
        cur = _Cursor(resp)
        corr = cur.take("i")
        if corr != self._corr:
            raise IOError(f"kafka_wire: correlation {corr} != {self._corr}")
        return cur

    def metadata(self, topics: list[str]):
        body = struct.pack(">i", len(topics)) + b"".join(_enc_str(t) for t in topics)
        cur = self._call(_API_METADATA, body)
        n_brokers = cur.take("i")
        brokers = []
        for _ in range(n_brokers):
            nid = cur.take("i")
            host = cur.string()
            port = cur.take("i")
            brokers.append((nid, host, port))
        out = {}
        for _ in range(cur.take("i")):
            terr = cur.take("h")
            name = cur.string()
            parts = []
            for _ in range(cur.take("i")):
                perr, pid, leader = cur.take("hii")
                nrep = cur.take("i")
                [cur.take("i") for _ in range(nrep)]
                nisr = cur.take("i")
                [cur.take("i") for _ in range(nisr)]
                parts.append((perr, pid, leader))
            out[name] = (terr, parts)
        return brokers, out

    def produce(
        self, topic: str, entries: list[tuple[bytes | None, bytes | None]]
    ) -> int:
        """Append (key, value) pairs; returns the base offset."""
        ms = encode_message_set([(0, k, v) for k, v in entries])
        body = (
            struct.pack(">hi", 1, 10_000)  # acks=1, timeout
            + struct.pack(">i", 1)
            + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">ii", 0, len(ms))
            + ms
        )
        cur = self._call(_API_PRODUCE, body)
        cur.take("i")  # n topics
        cur.string()
        cur.take("i")  # n parts
        _pid, err, base = cur.take("ihq")
        if err:
            raise IOError(f"kafka_wire: produce error {err}")
        return base

    def fetch(
        self, topic: str, offset: int, max_bytes: int = 1 << 20
    ) -> tuple[int, list[tuple[int, bytes | None, bytes | None]]]:
        """→ (high_watermark, [(offset, key, value)]) from ``offset``."""
        body = (
            struct.pack(">iii", -1, 0, 0)
            + struct.pack(">i", 1)
            + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", 0, offset, max_bytes)
        )
        cur = self._call(_API_FETCH, body)
        cur.take("i")
        cur.string()
        cur.take("i")
        _pid, err, hwm, set_size = cur.take("ihqi")
        if err:
            raise IOError(f"kafka_wire: fetch error {err}")
        raw = cur.buf[cur.pos : cur.pos + set_size]
        return hwm, decode_message_set(raw)

    def list_offsets(self, topic: str, time_: int = -1) -> int:
        """-1 → latest (log-end offset), -2 → earliest."""
        body = (
            struct.pack(">i", -1)
            + struct.pack(">i", 1)
            + _enc_str(topic)
            + struct.pack(">i", 1)
            + struct.pack(">iqi", 0, time_, 1)
        )
        cur = self._call(_API_LIST_OFFSETS, body)
        cur.take("i")
        cur.string()
        cur.take("i")
        _pid, err, n = cur.take("ihi")
        if err:
            raise IOError(f"kafka_wire: list_offsets error {err}")
        offs = [cur.take("q") for _ in range(n)]
        return offs[0]


# ------------------------------------------------------- Spark DataSource

try:  # Spark >= 4.0
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )
    from pyspark.sql.datasource import DataSourceArrowWriter

    HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAVE_DATASOURCE_API = False


if HAVE_DATASOURCE_API:

    class _OffsetSlice(InputPartition):
        def __init__(self, start: int, end: int):
            self.start, self.end = start, end

    class KafkaWireReader(DataSourceReader):
        """Offset-range-sliced parallel consumption: the driver resolves
        [earliest, latest) once via ListOffsets, slices it into
        ``num_partitions`` input partitions, and each EXECUTOR task
        fetches only its slice over its own socket — the real Kafka
        connector's planning model (one slice per partition-offset-range)
        against the real wire protocol."""

        def __init__(self, options):
            self.host = options.get("host", "127.0.0.1")
            self.port = int(options["port"])
            self.topic = options["topic"]
            self.n = int(options.get("num_partitions", 4))

        def partitions(self):
            with KafkaWireClient(self.host, self.port) as c:
                lo = c.list_offsets(self.topic, -2)
                hi = c.list_offsets(self.topic, -1)
            if hi <= lo:
                return [_OffsetSlice(lo, hi)]
            n = max(1, min(self.n, hi - lo))
            step = (hi - lo) / n
            cuts = [lo + round(step * i) for i in range(n)] + [hi]
            return [
                _OffsetSlice(a, b) for a, b in zip(cuts, cuts[1:]) if b > a
            ]

        def read(self, partition: _OffsetSlice):
            # rows cross the Python-worker boundary as ARROW BATCHES —
            # one per fetch response — instead of pickled tuples (r12,
            # guide §4). The stream reader below stays row-based: its
            # rows surface on the DRIVER through the prefetch cache,
            # which probes iterators with next() (no Arrow path there).
            if partition.end <= partition.start:
                return
            import pyarrow as pa

            pas = pa.schema(
                [
                    ("offset", pa.int64()),
                    ("key", pa.binary()),
                    ("value", pa.binary()),
                ]
            )
            with KafkaWireClient(self.host, self.port) as c:
                off = partition.start
                while off < partition.end:
                    _hwm, msgs = c.fetch(self.topic, off)
                    if not msgs:
                        raise IOError(
                            f"kafka_wire: empty fetch at {off} below "
                            f"end {partition.end} (log truncated?)"
                        )
                    kept = [m for m in msgs if m[0] < partition.end]
                    if kept:
                        cols = list(zip(*kept))
                        yield pa.RecordBatch.from_arrays(
                            [
                                pa.array(cols[0], type=pa.int64()),
                                pa.array(cols[1], type=pa.binary()),
                                pa.array(cols[2], type=pa.binary()),
                            ],
                            schema=pas,
                        )
                    if len(kept) < len(msgs):
                        return
                    off = msgs[-1][0] + 1

    class KafkaWireStreamReader(SimpleDataSourceStreamReader):
        """Streaming consumption with REAL offset tracking (S4+S8): each
        micro-batch reads [committed, log-end) — the offset pair IS the
        checkpointed source offset, so `readBetweenOffsets` replays a
        WAL-recorded batch byte-for-byte after restart (the
        exactly-once-source half of the reference's consumer loop,
        kafka_consumer_s3.py:127-135, minus its consumer group: Spark
        tracks offsets itself, which is why no group coordinator is
        needed or implemented)."""

        def __init__(self, options):
            self.host = options.get("host", "127.0.0.1")
            self.port = int(options["port"])
            self.topic = options["topic"]
            self.starting = options.get("startingOffsets", "earliest")

        def initialOffset(self) -> dict:
            with KafkaWireClient(self.host, self.port) as c:
                off = c.list_offsets(self.topic, -2 if self.starting == "earliest" else -1)
            return {"offset": off}

        def _range(self, start: int, end: int, client=None) -> list[tuple]:
            rows, off = [], start
            if end <= start:
                return rows
            c = client or KafkaWireClient(self.host, self.port)
            try:
                while off < end:
                    _hwm, msgs = c.fetch(self.topic, off)
                    if not msgs:
                        raise IOError(
                            f"kafka_wire stream: empty fetch at {off} < {end}"
                        )
                    for o, k, v in msgs:
                        if o >= end:
                            return rows
                        rows.append((o, k, v))
                        off = o + 1
            finally:
                if client is None:
                    c.close()
            return rows

        def read(self, start: dict):
            s = int(start["offset"])
            with KafkaWireClient(self.host, self.port) as c:
                end = c.list_offsets(self.topic, -1)
                rows = self._range(s, end, client=c)  # one socket per tick
            # MUST be an iterator, not a list: on an idle tick (end ==
            # start) the prefetch cache probes emptiness with next(it)
            # (datasource_internal.add_result_to_cache) — a list raises
            # TypeError there. list_iterator also pickles fine.
            return iter(rows), {"offset": end}

        def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
            return self._range(int(start["offset"]), int(end["offset"]))

    class _Produced(WriterCommitMessage):
        pass

    class KafkaWireWriter(DataSourceArrowWriter):
        """Keyed producer sink (S3): each Spark partition produces its
        rows as one message set over its own connection. The input must
        CARRY ``key`` and ``value`` columns — bound by NAME from the
        declared schema, so column order can't silently swap key/value
        (e.g. writing the source's own (offset, key, value) output
        back).

        DELIVERY: AT-LEAST-ONCE, exactly like the real Spark Kafka sink
        (which also produces from the task with non-transactional
        semantics) — rows land in ``write()``, and ``commit``/``abort``
        cannot retract an append from the log, so a retried or
        speculative task double-appends. The v0 protocol has no
        idempotent producer; consumers needing exactly-once dedupe on
        read (streaming/dedup.py keyed sink, or group on (key, value)).
        Staging rows through WriterCommitMessage for a driver-side
        commit would funnel ALL data through the driver — wrong at any
        scale."""

        def __init__(self, options, schema=None):
            self.host = options.get("host", "127.0.0.1")
            self.port = int(options["port"])
            self.topic = options["topic"]
            names = [f.name for f in schema.fields] if schema is not None else []
            if schema is not None and not {"key", "value"} <= set(names):
                raise ValueError(
                    f"kafka_wire writer needs key+value columns, got {names}"
                )
            self.ki = names.index("key") if names else 0
            self.vi = names.index("value") if names else 1

        @staticmethod
        def _b(x) -> bytes | None:
            if x is None or isinstance(x, (bytes, bytearray)):
                return bytes(x) if x is not None else None
            return str(x).encode("utf-8")

        # produce-batch byte budget: well under the 64 MiB frame guard
        # (review r6: one frame per Spark partition breaks past ~450k
        # rows — the broker drops the oversized frame and the client
        # dies opaquely mid-read), and bounds writer memory to one
        # chunk instead of the whole partition.
        _CHUNK_BYTES = 8 * 1024 * 1024
        _MSG_OVERHEAD = 26  # offset+size+crc+magic+attr+2 length prefixes

        def write(self, batches) -> _Produced:
            # Arrow writer (r12, guide §4): record batches in, the two
            # produced columns come off the batch as plain lists — the
            # JVM→Python hop carries Arrow buffers, not pickled rows.
            batch: list[tuple[bytes | None, bytes | None]] = []
            size = 0
            c = None  # lazy: empty partitions open no connection
            try:
                for rb in batches:
                    keys = rb.column(self.ki).to_pylist()
                    vals = rb.column(self.vi).to_pylist()
                    for k, v in zip(keys, vals):
                        k, v = self._b(k), self._b(v)
                        batch.append((k, v))
                        size += (
                            self._MSG_OVERHEAD + len(k or b"") + len(v or b"")
                        )
                        if size >= self._CHUNK_BYTES:
                            c = c or KafkaWireClient(self.host, self.port)
                            c.produce(self.topic, batch)
                            batch, size = [], 0
                if batch:
                    c = c or KafkaWireClient(self.host, self.port)
                    c.produce(self.topic, batch)
            finally:
                if c is not None:
                    c.close()
            return _Produced()

        def commit(self, messages) -> None:
            return None

        def abort(self, messages) -> None:  # pragma: no cover
            return None

    class KafkaWireDataSource(DataSource):
        """``spark.read.format("kafka_wire")`` — schema mirrors the real
        Kafka connector's core columns (offset, key, value)."""

        @classmethod
        def name(cls) -> str:
            return "kafka_wire"

        def schema(self):
            return "offset long, key binary, value binary"

        def reader(self, schema):
            return KafkaWireReader(self.options)

        def simpleStreamReader(self, schema):
            return KafkaWireStreamReader(self.options)

        def writer(self, schema, overwrite: bool):
            if overwrite:
                raise ValueError("kafka_wire is an append-only log; no overwrite")
            return KafkaWireWriter(self.options, schema)


_BROKER: MiniKafkaBroker | None = None
_BROKER_LOCK = threading.Lock()


def register(spark) -> None:
    """Register the data source on this session. Registration is an
    overwrite-by-name (re-registering is harmless), so no caching — an
    id(spark)-keyed cache would wrongly skip a NEW session allocated at
    a GC'd session's address."""
    spark.dataSource.register(KafkaWireDataSource)


def ensure_local_broker() -> MiniKafkaBroker:
    """Process-wide broker singleton (driver-side; executors in local
    mode reach it over loopback TCP — on a real cluster, point host/port
    options at the external cluster instead)."""
    global _BROKER
    with _BROKER_LOCK:
        if _BROKER is None:
            _BROKER = MiniKafkaBroker().start()
        return _BROKER
