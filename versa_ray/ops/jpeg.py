"""Baseline JPEG (JFIF) codec — stdlib + numpy, no image libraries.

A REAL sequential-baseline codec, not a byte-level fake: the encoder
emits genuine JFIF streams (SOI/APP0/DQT/SOF0/DHT/SOS/EOI markers,
zigzag-ordered quantized DCT coefficients, canonical Huffman entropy
coding with 0xFF byte stuffing) and the decoder independently parses
the markers, rebuilds the Huffman tables FROM THE DHT SEGMENTS (it
decodes any 1x1-sampled baseline stream, not just its own output),
entropy-decodes with DC prediction, dequantizes, inverse-DCTs and
reconstructs pixels.

Supported: 8-bit baseline sequential, grayscale (1 component) and
YCbCr 4:4:4 color (3 components, 1x1 sampling), dimensions that are
multiples of 8. Not supported (clean ValueError): progressive
(SOF2), chroma subsampling, restart intervals, 16-bit quant tables.

Determinism contract (what makes a SQL oracle possible for a LOSSY
codec): every rounding step is half-up (``floor(x + 0.5)``), so for
an image whose 8x8 blocks are each a CONSTANT value c the entire
pipeline collapses to an analytic integer formula —

    dc_q   = floor(8 * (c - 128) / q_dc + 0.5)      (quantized DC)
    recon  = clip(floor(dc_q * q_dc / 8 + 0.5) + 128, 0, 255)

(AC coefficients of a constant block are exactly zero) — which
DuckDB replays bit-exactly. Arbitrary images round-trip within the
standard lossy tolerance (pytest gates max |err|).

The Huffman tables are self-generated canonical codes (DC: 12
symbols at 4 bits; AC: 255 symbols at 9 bits + 1 at 10), declared in
the DHT segments like any optimized-table JPEG — table-driven
decoding is exercised exactly as with the Annex K defaults, without
transcribing 162 constants.
"""

from __future__ import annotations

import struct

import numpy as np

# Annex K luminance base quantization table (row-major)
_BASE_QT = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)


def quant_table(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the Annex K luminance table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (_BASE_QT * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int64)


def _zigzag_order():
    # standard JPEG zigzag: diagonals alternate direction
    order = []
    for d in range(15):
        ys = range(min(d, 7), max(0, d - 7) - 1, -1)  # even d: y desc
        if d % 2:
            ys = reversed(list(ys))
        for y in ys:
            order.append((y, d - y))
    return order


_ZIG = _zigzag_order()
_ZIG_FLAT = np.array([y * 8 + x for y, x in _ZIG], dtype=np.int64)

# orthonormal DCT-II basis: F = C @ f @ C.T ; f = C.T @ F @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = np.cos((2 * _x + 1) * _u * np.pi / 16) * (
            np.sqrt(0.125) if _u == 0 else 0.5
        )


def _half_up(x):
    # half-up with a 1e-9 robustness bias: exact half-way values reach
    # this function through float matrix products carrying ~1e-13
    # noise, which would make floor(x + 0.5) nondeterministic; the
    # bias dwarfs the noise and shifts nothing else. The SQL oracle
    # replays the same floor(x + 0.5 + 1e-9).
    return np.floor(x + 0.5 + 1e-9)


# --------------------------------------------------------------------------
# Canonical Huffman tables (self-generated; emitted in DHT)

# DC: 12 symbols (size categories 0..11), all 4-bit codes
_DC_BITS = [0] * 16
_DC_BITS[3] = 12  # 12 codes of length 4 (index 3 = length 4)
_DC_VALS = list(range(12))
# AC: symbols 0..255 — 255 codes at 9 bits + 1 at 10 (respects the
# one-byte-per-length DHT field and leaves the all-ones code unused)
_AC_BITS = [0] * 16
_AC_BITS[8] = 255
_AC_BITS[9] = 1
_AC_VALS = list(range(256))


def _canonical_codes(bits, vals):
    """symbol -> (code, length) per the JPEG canonical construction."""
    out = {}
    code = 0
    k = 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _amp_bits(v: int, s: int) -> int:
    # one's-complement amplitude encoding for negatives
    return v if v >= 0 else v + (1 << s) - 1


# --------------------------------------------------------------------------
# Encoder


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = _half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _half_up(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
    cr = _half_up(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
    return np.clip(np.stack([y, cb, cr], axis=-1), 0, 255)


def _encode_block(w: _BitWriter, block: np.ndarray, qt: np.ndarray,
                  dc_pred: int) -> int:
    # block: 8x8 float, already level-shifted
    coeffs = _C @ block @ _C.T
    q = _half_up(coeffs / qt).astype(np.int64)
    zz = q.reshape(64)[_ZIG_FLAT]
    dc = int(zz[0])
    diff = dc - dc_pred
    s = _size_cat(diff)
    code, ln = _DC_ENC[s]
    w.put(code, ln)
    if s:
        w.put(_amp_bits(diff, s), s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, ln = _AC_ENC[0x00]  # EOB
                w.put(code, ln)
                break
            run += 1
            if run == 16:
                code, ln = _AC_ENC[0xF0]  # ZRL
                w.put(code, ln)
                run = 0
            continue
        s = _size_cat(v)
        code, ln = _AC_ENC[(run << 4) | s]
        w.put(code, ln)
        w.put(_amp_bits(v, s), s)
        run = 0
    return dc


def _marker(tag: int, body: bytes) -> bytes:
    return struct.pack(">HH", tag, len(body) + 2) + body


def _dht_segment(tc_th: int, bits, vals) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_jpeg(arr: np.ndarray, quality: int = 85) -> bytes:
    """JFIF bytes from an (H, W) grayscale or (H, W, 3) RGB uint8
    array; H and W must be multiples of 8 (baseline 1x1 sampling,
    no partial-MCU padding)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        comps = arr[:, :, None].astype(np.float64)
    elif arr.ndim == 3 and arr.shape[2] == 3:
        comps = _rgb_to_ycbcr(arr)
    else:
        raise ValueError("encode_jpeg expects (H, W) or (H, W, 3) uint8")
    h, w_, nc = comps.shape
    if h % 8 or w_ % 8:
        raise ValueError("encode_jpeg requires dimensions divisible by 8")
    qt = quant_table(quality)
    zz_qt = qt.reshape(64)[_ZIG_FLAT]

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xFFDB, b"\x00" + bytes(int(v) for v in zz_qt))
    sof = bytes([8]) + struct.pack(">HH", h, w_) + bytes([nc])
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # id, 1x1 sampling, quant table 0
    out += _marker(0xFFC0, sof)
    out += _marker(0xFFC4, _dht_segment(0x00, _DC_BITS, _DC_VALS))
    out += _marker(0xFFC4, _dht_segment(0x10, _AC_BITS, _AC_VALS))
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _marker(0xFFDA, sos)

    w = _BitWriter()
    preds = [0] * nc
    shifted = comps - 128.0
    for by in range(0, h, 8):
        for bx in range(0, w_, 8):
            for ci in range(nc):  # interleaved MCU = one block per comp
                preds[ci] = _encode_block(
                    w, shifted[by:by + 8, bx:bx + 8, ci], qt, preds[ci]
                )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream exhausted")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                raise ValueError("unexpected marker inside entropy data")
            self.pos += 1  # skip stuffed 0x00
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, k: int) -> int:
        while self.n < k:
            self._fill()
        self.n -= k
        v = (self.acc >> self.n) & ((1 << k) - 1)
        return v

    def bit(self) -> int:
        return self.bits(1)


def _build_decode_table(bits, vals):
    """(code, length) -> symbol dict from a DHT segment."""
    table = {}
    code = 0
    k = 0
    for li, n in enumerate(bits):
        length = li + 1
        for _ in range(n):
            table[(code, length)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    # inverse of the one's-complement amplitude encoding
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = _half_up(y + 1.402 * cr)
    g = _half_up(y - 0.344136 * cb - 0.714136 * cr)
    b = _half_up(y + 1.772 * cb)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(H, W, C) uint8 array from baseline JFIF bytes — real marker
    walk, DHT-driven Huffman decode, dequantize, inverse DCT. C is 1
    for grayscale streams, 3 (RGB) for YCbCr 4:4:4."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts = {}
    huff = {}
    sof = None
    comps = []
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment at offset %d" % pos)
        tag = payload[pos + 1]
        pos += 2
        if tag == 0xD9:  # EOI
            break
        if tag in (0x01,) or 0xD0 <= tag <= 0xD7:  # standalone
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if tag == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body, np.uint8, 64, off + 1).astype(
                    np.int64
                )
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZIG_FLAT] = zz
                qts[tq] = qt.reshape(8, 8)
                off += 65
        elif tag == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc_th = body[off]
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[tc_th] = _build_decode_table(bits, vals)
                off += 17 + n
        elif tag == 0xC0:  # SOF0 baseline
            prec = body[0]
            h, w_ = struct.unpack_from(">HH", body, 1)
            nc = body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + ci * 3 : 9 + ci * 3]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (need 1x1)"
                    )
                comps.append({"id": cid, "tq": tq})
            sof = (h, w_, nc)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                     0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif tag == 0xDD:  # DRI
            if struct.unpack_from(">H", body, 0)[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif tag == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = []
            for ci in range(ns):
                cid, tables = body[1 + ci * 2 : 3 + ci * 2]
                scan.append({"id": cid, "td": tables >> 4, "ta": tables & 0xF})
            pos += seglen
            break
        pos += seglen
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    h, w_, nc = sof
    if h % 8 or w_ % 8:
        raise ValueError("dimensions must be multiples of 8 (no padding)")
    if len(scan) != nc:
        raise ValueError("scan/frame component mismatch")

    # locate EOI to bound the entropy stream
    end = payload.rfind(b"\xff\xd9")
    if end < 0:
        raise ValueError("missing EOI")
    r = _BitReader(payload[pos:end])
    preds = [0] * nc
    comp_qt = []
    for ci in range(nc):
        tq = comps[ci]["tq"]
        if tq not in qts:
            raise ValueError("missing quant table %d" % tq)
        comp_qt.append(qts[tq])
    dec_tabs = []
    min_mcu_bits = 0
    for sc in scan:
        dkey, akey = 0x00 | sc["td"], 0x10 | sc["ta"]
        if dkey not in huff or akey not in huff:
            raise ValueError("missing Huffman table")
        dec_tabs.append((huff[dkey], huff[akey]))
        # every block spends at least one DC code and one AC code
        # (EOB); the shortest code length of EACH PARSED TABLE bounds
        # it — table-derived, so streams with other tables (e.g.
        # Annex K, ~6 bits/block) are judged by their own costs
        min_mcu_bits += min(ln for _, ln in huff[dkey]) + min(
            ln for _, ln in huff[akey]
        )
    # dims implying more blocks than the entropy stream could hold are
    # a corrupt SOF — reject before allocating h x w buffers
    if (h // 8) * (w_ // 8) * max(min_mcu_bits, 1) > (end - pos) * 8 + 7:
        raise ValueError("frame dimensions exceed entropy data")
    out = np.zeros((h, w_, nc), dtype=np.float64)
    for by in range(0, h, 8):
        for bx in range(0, w_, 8):
            for ci in range(nc):
                dct, act = dec_tabs[ci]
                zz = np.zeros(64, dtype=np.int64)
                s = _read_symbol(r, dct)
                if s > 11:  # baseline DC size categories are 0..11
                    raise ValueError("corrupt DC coefficient stream")
                diff = _extend(r.bits(s), s) if s else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(r, act)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    k += run
                    if k > 63 or size == 0 or size > 10:
                        # baseline AC size categories are 1..10
                        raise ValueError("corrupt AC coefficient stream")
                    zz[k] = _extend(r.bits(size), size)
                    k += 1
                q = np.zeros(64, dtype=np.int64)
                q[_ZIG_FLAT] = zz
                block = _C.T @ (q.reshape(8, 8) * comp_qt[ci]) @ _C
                out[by:by + 8, bx:bx + 8, ci] = block
    recon = np.clip(_half_up(out) + 128, 0, 255).astype(np.uint8)
    if nc == 3:
        return _ycbcr_to_rgb(recon)
    return recon
