"""Minimal Kafka v0 wire codec — pure stdlib (struct + zlib).

Implements the PUBLIC Apache Kafka protocol (kafka.apache.org/protocol)
for the four APIs a v0-era consumer/producer needs:

- Produce   (api_key 0, v0)
- Fetch     (api_key 1, v0)
- ListOffsets (api_key 2, v0)
- Metadata  (api_key 3, v0)

plus the v0 MessageSet on-disk/wire format:

    offset:int64  message_size:int32  message
    message = crc:uint32 magic:int8(=0) attributes:int8(=0)
              key:bytes32 value:bytes32

All framing is big-endian. ``bytes32`` / ``string16`` use -1 length for
null, exactly per spec. The codec is shared by the loopback broker
(decode requests / encode responses) and the client (the reverse), so
the two sides can never disagree about the frame layout — and a real
v0-speaking client would interoperate byte-for-byte.

Cite: the "topic" ingress concept in /root/reference/README.md:2; the
wire layout is from the public Kafka protocol guide [PUB].
"""

from __future__ import annotations

import struct
import zlib

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3


# ---------------------------------------------------------------------------
# primitive encoders
# ---------------------------------------------------------------------------


def enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode("utf-8")
    return struct.pack(">h", len(b)) + b


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def enc_array(items, enc) -> bytes:
    return struct.pack(">i", len(items)) + b"".join(enc(x) for x in items)


class Cursor:
    """Sequential big-endian decoder over one frame."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        if len(b) != n:
            raise EOFError("truncated frame")
        self.pos += n
        return b

    def i8(self) -> int:
        return struct.unpack(">b", self._take(1))[0]

    def i16(self) -> int:
        return struct.unpack(">h", self._take(2))[0]

    def i32(self) -> int:
        return struct.unpack(">i", self._take(4))[0]

    def u32(self) -> int:
        return struct.unpack(">I", self._take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self._take(8))[0]

    def string(self) -> str | None:
        n = self.i16()
        return None if n < 0 else self._take(n).decode("utf-8")

    def bytes_(self) -> bytes | None:
        n = self.i32()
        return None if n < 0 else self._take(n)

    def array(self, dec) -> list:
        return [dec(self) for _ in range(self.i32())]


# ---------------------------------------------------------------------------
# v0 MessageSet
# ---------------------------------------------------------------------------


def encode_message(key: bytes | None, value: bytes | None) -> bytes:
    body = struct.pack(">bb", 0, 0) + enc_bytes(key) + enc_bytes(value)
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">I", crc) + body


def encode_message_set(base_offset: int, messages) -> bytes:
    """``messages``: iterable of (key, value) byte pairs."""
    out = []
    for i, (k, v) in enumerate(messages):
        m = encode_message(k, v)
        out.append(struct.pack(">qi", base_offset + i, len(m)) + m)
    return b"".join(out)


def decode_message_set(data: bytes) -> list[tuple[int, bytes | None, bytes | None]]:
    """Returns [(offset, key, value)]; a truncated trailing message is
    silently dropped (per spec — brokers cut message sets at max_bytes
    and clients re-fetch from the next offset)."""
    out = []
    pos = 0
    n = len(data)
    while pos + 12 <= n:
        offset, size = struct.unpack(">qi", data[pos : pos + 12])
        if pos + 12 + size > n:
            break  # partial trailing message
        c = Cursor(data, pos + 12)
        crc = c.u32()
        body = data[pos + 16 : pos + 12 + size]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch at offset {offset}")
        magic = c.i8()
        if magic != 0:
            raise ValueError(f"unsupported message magic {magic}")
        c.i8()  # attributes (no compression in v0 here)
        key = c.bytes_()
        value = c.bytes_()
        out.append((offset, key, value))
        pos += 12 + size
    return out


# ---------------------------------------------------------------------------
# request/response framing
# ---------------------------------------------------------------------------


def encode_request(
    api_key: int,
    api_version: int,
    correlation_id: int,
    client_id: str,
    body: bytes,
) -> bytes:
    payload = (
        struct.pack(">hhi", api_key, api_version, correlation_id)
        + enc_str(client_id)
        + body
    )
    return struct.pack(">i", len(payload)) + payload


def encode_response(correlation_id: int, body: bytes) -> bytes:
    payload = struct.pack(">i", correlation_id) + body
    return struct.pack(">i", len(payload)) + payload


def read_frame(sock) -> bytes | None:
    """Read one size-prefixed frame off a socket; None on clean EOF."""
    hdr = _read_exact(sock, 4)
    if hdr is None:
        return None
    (size,) = struct.unpack(">i", hdr)
    frame = _read_exact(sock, size)
    if frame is None:
        raise EOFError("connection closed mid-frame")
    return frame


def _read_exact(sock, n: int) -> bytes | None:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            return None if not buf else buf  # EOF
        buf += chunk
    return buf
