"""Baseline JPEG (ITU-T T.81 / JFIF) codec, pure python + numpy.

JPEG is the dominant raster format of the live web — a Common-Crawl
multimodal pipeline that can't read it decodes almost nothing — and
this container ships no PIL/libjpeg, so as with PNG (stdlib zlib +
Paeth), BMP and GIF (LZW), the codec is implemented from the public
spec and certified by planted-payload round trip:

* ``decode_jpeg_array`` — a general baseline decoder: marker parse,
  DQT/DHT/SOF0/SOS/DRI, canonical Huffman tables, byte-unstuffed
  entropy reader, restart-marker resync, DC prediction + EXTEND,
  dequantize + inverse zigzag, vectorized float IDCT, chroma
  upsampling for sampling factors {1, 2}, BT.601 YCbCr->RGB.
  Progressive (SOF2) / arithmetic / 12-bit streams raise ValueError
  (decode_media quarantines them); every malformed-stream path
  raises ValueError, never a bare struct/index error.
* ``encode_jpeg`` — an OPTIMIZING two-pass encoder (libjpeg
  `-optimize` style): forward DCT + quantization (Annex K tables,
  IJG quality scaling), then per-image canonical Huffman tables
  built from the actual symbol frequencies (length-limited to 16
  bits with the standard adjustment), 4:4:4 or 4:2:0, optional
  restart intervals. Arbitrary DHT tables are valid JPEG, and
  building them beats transcribing Annex K's 162-entry AC lists.
* ``synth_jpeg`` — the planted payload for the exact oracle: a
  32x32 grayscale image of constant 8x8 tiles. A constant tile has
  ONLY a DC coefficient, and gray pixels put chroma DC at exactly
  zero, so the decoded value is a closed form of the planted value
  (k = floor((v-128)/2 + 0.5); y = clamp(2k + 128)) that the DuckDB
  oracle recomputes per tile — lossy-codec round trip certified to
  the exact integer, no tolerance band.

Scale: the codec runs inside the same mapInPandas batches as the
other image formats (multimodal.decode_media / png_pixel_stats);
nothing here touches a driver or a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg_array", "synth_jpeg",
           "expected_tile_value"]

JPEG_SIG = b"\xff\xd8\xff"

# Annex K.1 quantization tables, natural (row-major) order
_QT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)
_QT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag index order, generated (not transcribed):
    diagonal s walks top-right for odd s, bottom-left for even s."""
    order = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        order.extend(ij if s % 2 == 1 else ij[::-1])
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)

# orthonormal 8-point DCT basis: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
    _A[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)


def _scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 50 = Annex K verbatim."""
    q = min(100, max(1, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for t in (_QT_LUMA, _QT_CHROMA):
        scaled = (t * s + 50) // 100
        out.append(np.clip(scaled, 1, 255).astype(np.int32))
    return out[0], out[1]


# ------------------------------------------------------------- encoder

def _size_cat(v: int) -> int:
    """JPEG magnitude category (bits needed for |v|)."""
    return abs(v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        # truncate consumed high bits — without this the accumulator
        # grows into an unbounded bigint and every later shift is
        # O(stream), turning large-image encode quadratic
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.write(0x7F, 8 - self.nbits)  # pad with 1-bits


def _huff_lengths(freq: dict[int, int]) -> dict[int, int]:
    """Code lengths for the observed symbols, length-limited to 16.

    libjpeg's jpeg_gen_optimal_table scheme: reserve a never-emitted
    dummy symbol (freq 1) so no real code is all 1-bits, build the
    Huffman tree, then push over-long leaves up with the standard
    BITS adjustment."""
    freq = dict(freq)
    freq[256] = 1  # dummy
    # leaf merge (Huffman) tracking code length per symbol
    lens = {s: 0 for s in freq}
    groups = [{"f": f, "syms": [s]} for s, f in freq.items()]
    while len(groups) > 1:
        groups.sort(key=lambda g: (g["f"], -max(g["syms"])))
        a, b = groups[0], groups[1]
        for s in a["syms"] + b["syms"]:
            lens[s] += 1
        groups = [{"f": a["f"] + b["f"], "syms": a["syms"] + b["syms"]}] \
            + groups[2:]
    if len(lens) == 1:
        lens = {s: 1 for s in lens}
    # BITS histogram + the T.81 K.3 length-limiting adjustment
    maxlen = max(lens.values())
    bits = [0] * (maxlen + 1)
    for s, ln in lens.items():
        bits[ln] += 1
    i = maxlen
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    bits = bits[:17] + [0] * max(0, 17 - len(bits))
    # drop the dummy from the LONGEST used length
    for ln in range(16, 0, -1):
        if bits[ln]:
            bits[ln] -= 1
            break
    # canonical assignment: symbols sorted by (length, symbol)
    real = sorted((s for s in lens if s != 256),
                  key=lambda s: (lens[s], s))
    out: dict[int, int] = {}
    idx = 0
    for ln in range(1, 17):
        for _ in range(bits[ln]):
            if idx < len(real):
                out[real[idx]] = ln
                idx += 1
    # over-long symbols spill into whatever lengths remain; canonical
    # order keeps the table valid
    while idx < len(real):
        out[real[idx]] = 16
        idx += 1
    return out


def _canonical_codes(lengths: dict[int, int]
                     ) -> tuple[dict[int, tuple[int, int]], bytes]:
    """(symbol -> (code, len), DHT payload bits+vals)."""
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev = 0
    bits = [0] * 17
    vals = bytearray()
    for s in syms:
        ln = lengths[s]
        code <<= (ln - prev)
        codes[s] = (code, ln)
        code += 1
        prev = ln
        bits[ln] += 1
        vals.append(s & 0xFF)
    payload = bytes(bits[1:17]) + bytes(vals)
    return codes, payload


def _fdct_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial blocks -> (n, 64) zigzagged quantized coeffs.
    Quantization rounds half toward +inf (floor(x/q + .5)) — the
    closed form the planted-payload oracle replicates."""
    f = plane.astype(np.float64) - 128.0
    F = np.einsum("ux,nxy,vy->nuv", _A, f, _A)
    # the 1e-9 settles exact .5 boundaries deterministically UP —
    # float DCT noise (~1e-13 absolute) would otherwise flip them run
    # to run, and the planted-payload oracle's closed form assumes
    # floor(x + 0.5) on exact arithmetic
    q = np.floor(F / qt + 0.5 + 1e-9).astype(np.int64)
    return q.reshape(-1, 64)[:, _ZZ]


def _encode_component_blocks(blocks: np.ndarray, freq_dc, freq_ac,
                             emit, dc_codes=None, ac_codes=None,
                             pred: int = 0) -> int:
    """One pass over (n, 64) coeff blocks: with emit=False just count
    symbol frequencies; with emit=True write bits. Returns final DC
    predictor."""
    for blk in blocks:
        diff = int(blk[0]) - pred
        pred = int(blk[0])
        s = _size_cat(diff)
        if emit:
            c, ln = dc_codes[s]
            emit((c, ln))
            if s:
                v = diff if diff >= 0 else diff + (1 << s) - 1
                emit((v, s))
        else:
            freq_dc[s] = freq_dc.get(s, 0) + 1
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                if emit:
                    c, ln = ac_codes[0xF0]
                    emit((c, ln))
                else:
                    freq_ac[0xF0] = freq_ac.get(0xF0, 0) + 1
                run -= 16
            s = _size_cat(v)
            sym = (run << 4) | s
            if emit:
                c, ln = ac_codes[sym]
                emit((c, ln))
                vv = v if v >= 0 else v + (1 << s) - 1
                emit((vv, s))
            else:
                freq_ac[sym] = freq_ac.get(sym, 0) + 1
            run = 0
        if last < 63:
            if emit:
                c, ln = ac_codes[0x00]
                emit((c, ln))
            else:
                freq_ac[0x00] = freq_ac.get(0x00, 0) + 1
    return pred


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """Pad to 8-multiples by edge replication, return (n, 8, 8) in
    raster block order plus the block grid shape."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (padded.reshape(ph // 8, 8, pw // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    return blocks


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = [px[..., i].astype(np.float64) for i in range(3)]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255)


def encode_jpeg(px: np.ndarray, quality: int = 50,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """RGB (h, w, 3) or gray (h, w) uint8 -> baseline JFIF bytes."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l, qt_c = _scaled_tables(quality)
    ycc = _rgb_to_ycbcr(px)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    if subsample:
        # 2x2 box average, edge-padded to even dims
        def down(p):
            ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
            p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                       mode="edge")
            return np.floor(
                p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)) + 0.5)
        cb, cr = down(cb), down(cr)
        hy, vy = 2, 2
    else:
        hy, vy = 1, 1

    # interleaved MCU order: for 4:2:0 each MCU is 4 Y blocks (2x2) +
    # 1 Cb + 1 Cr; for 4:4:4 one block each
    yb = _plane_blocks(y)
    cbb = _plane_blocks(cb)
    crb = _plane_blocks(cr)
    by_w = -(-w // 8)
    if subsample:
        mcu_w, mcu_h = -(-w // 16), -(-h // 16)
        # y blocks padded grid may exceed 2*mcu dims; re-pad plane to
        # 16-multiples for consistent MCU tiling
        yp = np.pad(y, ((0, mcu_h * 16 - h), (0, mcu_w * 16 - w)),
                    mode="edge")
        yb = _plane_blocks(yp)
        by_w = mcu_w * 2
        order_y = []
        for my in range(mcu_h):
            for mx in range(mcu_w):
                for dy in range(2):
                    for dx in range(2):
                        order_y.append((my * 2 + dy) * by_w + mx * 2 + dx)
        yq = _fdct_blocks(yb, qt_l)[order_y]
        cbq = _fdct_blocks(cbb, qt_c)
        crq = _fdct_blocks(crb, qt_c)
        per_mcu = [("y", 4), ("cb", 1), ("cr", 1)]
        n_mcu = mcu_w * mcu_h
    else:
        yq = _fdct_blocks(yb, qt_l)
        cbq = _fdct_blocks(cbb, qt_c)
        crq = _fdct_blocks(crb, qt_c)
        per_mcu = [("y", 1), ("cb", 1), ("cr", 1)]
        n_mcu = yq.shape[0]
    comps = {"y": yq, "cb": cbq, "cr": crq}

    def mcu_stream():
        """Yield (comp_key, block) in interleaved scan order, split by
        restart intervals."""
        idx = {"y": 0, "cb": 0, "cr": 0}
        for m in range(n_mcu):
            for key, cnt in per_mcu:
                for _ in range(cnt):
                    yield key, comps[key][idx[key]]
                    idx[key] += 1

    # pass 1: frequencies (DC/AC split per luma/chroma table class)
    fdc = [{}, {}]
    fac = [{}, {}]
    preds = {"y": 0, "cb": 0, "cr": 0}
    ri = int(restart_interval)
    m = 0
    for key, blk in mcu_stream():
        t = 0 if key == "y" else 1
        preds[key] = _encode_component_blocks(
            blk[None, :], fdc[t], fac[t], emit=None, pred=preds[key])
        # restart boundaries reset predictors between MCUs
        if key == "cr":
            m += 1
            if ri and m % ri == 0:
                preds = {"y": 0, "cb": 0, "cr": 0}
    for t in range(2):
        fdc[t] = fdc[t] or {0: 1}
        fac[t] = fac[t] or {0: 1}
    dc_codes, dc_payload, ac_codes, ac_payload = [], [], [], []
    for t in range(2):
        c, p = _canonical_codes(_huff_lengths(fdc[t]))
        dc_codes.append(c)
        dc_payload.append(p)
        c, p = _canonical_codes(_huff_lengths(fac[t]))
        ac_codes.append(c)
        ac_payload.append(p)

    # pass 2: emit
    bw = _BitWriter()
    preds = {"y": 0, "cb": 0, "cr": 0}
    m = 0
    pend = []
    for key, blk in mcu_stream():
        t = 0 if key == "y" else 1
        preds[key] = _encode_component_blocks(
            blk[None, :], None, None,
            emit=lambda cl: bw.write(*cl),
            dc_codes=dc_codes[t], ac_codes=ac_codes[t], pred=preds[key])
        if key == "cr":
            m += 1
            if ri and m % ri == 0 and m < n_mcu:
                bw.pad_to_byte()
                bw.out += bytes([0xFF, 0xD0 + ((m // ri - 1) % 8)])
                preds = {"y": 0, "cb": 0, "cr": 0}
    bw.pad_to_byte()
    del pend

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00"
               + qt_l.reshape(-1)[_ZZ].astype(np.uint8).tobytes())
    out += seg(0xDB, b"\x01"
               + qt_c.reshape(-1)[_ZZ].astype(np.uint8).tobytes())
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (hy << 4) | vy, 0])
    sof += bytes([2, 0x11, 1])
    sof += bytes([3, 0x11, 1])
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + dc_payload[0])
    out += seg(0xC4, b"\x10" + ac_payload[0])
    out += seg(0xC4, b"\x01" + dc_payload[1])
    out += seg(0xC4, b"\x11" + ac_payload[1])
    if ri:
        out += seg(0xDD, struct.pack(">H", ri))
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------------------- decoder

class _BitReader:
    """MSB-first reader over entropy data with 0xFF00 unstuffing;
    stops (raises _Marker) at any real marker so the scan loop can
    resync on RSTn."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise ValueError("truncated entropy stream")
        b = self.d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.d):
                raise ValueError("truncated after 0xFF")
            nxt = self.d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _Marker(nxt)
        else:
            self.pos += 1
        # mask to the live window (acc must not grow into a bigint —
        # same quadratic-shift hazard as the writer side)
        self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def peek16(self) -> tuple[int, int]:
        """Up to 16 buffered bits left-aligned into a 16-bit window,
        plus how many are real; the tail is virtually padded with
        1-bits when the stream ends at a marker (T.81 pad
        convention) so the fast Huffman path needs exactly one call."""
        while self.nbits < 16:
            try:
                self._fill()
            except (_Marker, ValueError):
                pad = 16 - self.nbits
                return (((self.acc << pad)
                         | ((1 << pad) - 1)) & 0xFFFF, self.nbits)
        return (self.acc >> (self.nbits - 16)) & 0xFFFF, 16

    def drop(self, n: int) -> None:
        self.nbits -= n

    def align(self) -> None:
        self.nbits -= self.nbits % 8
        # drop consumed whole bytes from acc bookkeeping
        self.acc &= (1 << self.nbits) - 1


class _Marker(Exception):
    def __init__(self, code: int):
        self.code = code


class _HuffTable:
    """Canonical decode via mincode/maxcode/valptr (T.81 F.2.2.3)."""

    def __init__(self, bits: list[int], vals: bytes):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        # peek-16 fast path: one buffered window, then pure int
        # compares — replaces 1..16 per-bit reader calls per symbol
        code16, avail = br.peek16()
        for ln in range(1, 17):
            c = code16 >> (16 - ln)
            if c <= self.maxcode[ln]:
                if ln > avail:
                    raise ValueError("truncated Huffman code")
                br.drop(ln)
                return self.vals[self.valptr[ln] + c - self.mincode[ln]]
        raise ValueError("bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_array(payload: bytes):
    """JPEG bytes -> (pixels uint8 (h, w, 3), w, h)."""
    try:
        return _decode(payload)
    except _Marker as m:
        raise ValueError(f"unexpected marker 0x{m.code:02x}") from m
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode(d: bytes):
    if not d.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    hts: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    ri = 0
    while pos < len(d):
        if d[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — consume them or the next byte is misread as a
        # segment length
        while pos + 1 < len(d) and d[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(d):
            raise ValueError("truncated at marker")
        marker = d[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (ln,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2:pos + ln]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                hts[(tc, th)] = _HuffTable(bits, seg[p + 17:p + 17 + n])
                p += 17 + n
        elif marker == 0xC0 or marker == 0xC1:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG unsupported")
        elif marker == 0xDD:
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
            # quarantine contract: a scan not covering every frame
            # component (non-interleaved multi-scan, or corrupt ids)
            # must be a ValueError, not a KeyError task-killer
            missing = [c["id"] for c in frame["comps"]
                       if c["id"] not in scan]
            if missing:
                raise ValueError(
                    f"SOS missing components {missing} "
                    "(non-interleaved scans unsupported)")
            return _decode_scan(d, pos + ln, frame, scan, qts, hts, ri)
        pos += ln
    raise ValueError("no scan data")


def _decode_scan(d, pos, frame, scan, qts, hts, ri):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("sampling factors beyond 2 unsupported")
    mcu_w = -(-w // (8 * hmax))
    mcu_h = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcu_w * c["h"]
        c["bh"] = mcu_h * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int64)
        c["pred"] = 0
        if c["tq"] not in qts:
            raise ValueError("missing quant table")

    br = _BitReader(d, pos)
    n_mcu = mcu_w * mcu_h
    m = 0
    while m < n_mcu:
        try:
            my, mx = divmod(m, mcu_w)
            for c in comps:
                td, ta = scan[c["id"]]
                dc_t = hts.get((0, td))
                ac_t = hts.get((1, ta))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table")
                for dy in range(c["v"]):
                    for dx in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = dc_t.decode(br)
                        diff = _extend(br.bits(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = ac_t.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1
                        row = (my * c["v"] + dy) * c["bw"] \
                            + (mx * c["h"] + dx)
                        c["coef"][row] = blk
            m += 1
            if ri and m % ri == 0 and m < n_mcu:
                br.align()
                # expect RSTn next in the byte stream
                try:
                    br.bits(8)
                    raise ValueError("missing restart marker")
                except _Marker as mk:
                    if not (0xD0 <= mk.code <= 0xD7):
                        raise ValueError("bad restart marker") from mk
                    br.pos += 2  # consume FF + RSTn
                    br.acc = 0
                    br.nbits = 0
                for c in comps:
                    c["pred"] = 0
        except _Marker as mk:
            raise ValueError(f"marker 0x{mk.code:02x} inside scan") from mk

    planes = []
    for c in comps:
        # undo zigzag (coef[k] is zigzag index k), dequantize, IDCT
        nat = np.zeros(c["coef"].shape, dtype=np.float64)
        nat[:, _ZZ] = c["coef"]
        nat *= qts[c["tq"]].reshape(-1)[None, :].astype(np.float64)
        nat = nat.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,yv->nxy", _A.T, nat, _A.T)
        plane = (spatial.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # upsample to full resolution
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 3:
        y, cb, cr = planes
        y = y + 128.0
        r = y + 1.402 * cr
        g = y - 0.344136286 * cb - 0.714136286 * cr
        b = y + 1.772 * cb
        px = np.stack([r, g, b], axis=-1)
    else:
        px = np.stack([planes[0] + 128.0] * 3, axis=-1)
    px = np.clip(np.floor(px + 0.5), 0, 255).astype(np.uint8)
    return px, w, h


# ------------------------------------------------------------- planting

def expected_tile_value(v: int) -> int:
    """Closed-form decoded value of a constant gray 8x8 tile planted
    at value v with the Annex K luma table (q00 = 16): the only
    nonzero coefficient is DC = 8*(v-128); quantize floor(x/16+.5),
    dequantize, IDCT back to a constant — exactly 2k + 128."""
    k = int(np.floor((v - 128) / 2 + 0.5))
    return max(0, min(255, 2 * k + 128))


def synth_jpeg(doc_id: int) -> bytes:
    """32x32 gray image of 16 constant 8x8 tiles; tile t holds
    v_t = (doc_id * 31 + t * 97) % 256. DC-only blocks + zero chroma
    make the decode integer-exact (see expected_tile_value)."""
    tiles = (int(doc_id) * 31 + np.arange(16) * 97) % 256
    img = np.repeat(np.repeat(tiles.reshape(4, 4), 8, axis=0),
                    8, axis=1).astype(np.uint8)
    return encode_jpeg(img, quality=50, subsample=False)
