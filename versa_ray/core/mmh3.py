"""MurmurHash3 x64-128 — pure-Python implementation from the public
algorithm (Austin Appleby's MurmurHash3, public domain;
https://github.com/aappleby/smhasher/blob/master/src/MurmurHash3.cpp).

Only the x64_128 variant is provided, because that is what the Versa ID
convention consumes (the first 64-bit lane of the 128-bit digest; see
reference /root/reference/tools/py/contrib/datachefids.py:49).

The hot path hashes many short strings per Arrow batch, so the block
loop is written with minimal allocation; for typical fingerprint
plaintexts (<200 bytes) this is a handful of iterations.
"""

from __future__ import annotations

import struct

_MASK = 0xFFFFFFFFFFFFFFFF
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def hash128_x64(data: bytes, seed: int = 0) -> tuple[int, int]:
    """Return the two unsigned 64-bit lanes of MurmurHash3 x64-128."""
    length = len(data)
    nblocks = length // 16
    h1 = seed & _MASK
    h2 = seed & _MASK

    if nblocks:
        blocks = struct.unpack_from("<%dQ" % (nblocks * 2), data)
        for i in range(nblocks):
            k1 = blocks[i * 2]
            k2 = blocks[i * 2 + 1]

            k1 = (k1 * _C1) & _MASK
            k1 = ((k1 << 31) | (k1 >> 33)) & _MASK
            k1 = (k1 * _C2) & _MASK
            h1 ^= k1
            h1 = ((h1 << 27) | (h1 >> 37)) & _MASK
            h1 = (h1 + h2) & _MASK
            h1 = (h1 * 5 + 0x52DCE729) & _MASK

            k2 = (k2 * _C2) & _MASK
            k2 = ((k2 << 33) | (k2 >> 31)) & _MASK
            k2 = (k2 * _C1) & _MASK
            h2 ^= k2
            h2 = ((h2 << 31) | (h2 >> 33)) & _MASK
            h2 = (h2 + h1) & _MASK
            h2 = (h2 * 5 + 0x38495AB5) & _MASK

    tail = data[nblocks * 16 :]
    tlen = len(tail)
    if tlen:
        k1 = 0
        k2 = 0
        if tlen > 8:
            k2 = int.from_bytes(tail[8:], "little")
            k2 = (k2 * _C2) & _MASK
            k2 = ((k2 << 33) | (k2 >> 31)) & _MASK
            k2 = (k2 * _C1) & _MASK
            h2 ^= k2
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK
        k1 = ((k1 << 31) | (k1 >> 33)) & _MASK
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    return h1, h2


def hash64_signed(data: str | bytes, seed: int = 0) -> tuple[int, int]:
    """Match the public ``mmh3.hash64`` default: signed 64-bit lane pair."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    h1, h2 = hash128_x64(data, seed)
    if h1 >= 1 << 63:
        h1 -= 1 << 64
    if h2 >= 1 << 63:
        h2 -= 1 << 64
    return h1, h2


def hash64_batch(keys, seed: int = 0):
    """First 64-bit lane of MurmurHash3 x64-128 for MANY short keys at
    once — numpy-vectorized, BIT-IDENTICAL to ``hash128_x64(k)[0]``
    (equality property-tested in tests/test_synth_vec.py).

    Accepts a numpy unicode/bytes array (fast path: zero per-key
    Python — ASCII keys only, the corpus generator's contract) or any
    iterable of str/bytes. The zero-padded unconditional tail mix is
    exactly the scalar switch: a zero word through the k-mix is the
    identity (0 * C is 0, rot 0 is 0, h ^= 0 is h), so rows whose tail
    is shorter than a full word — or absent — mix unchanged.
    """
    import numpy as np

    if isinstance(keys, np.ndarray) and keys.dtype.kind == "U":
        s = keys.astype("S%d" % max(keys.dtype.itemsize // 4, 1))
    elif isinstance(keys, np.ndarray) and keys.dtype.kind == "S":
        s = keys
    else:
        bs = [k.encode("utf-8") if isinstance(k, str) else bytes(k)
              for k in keys]
        maxlen = max((len(b) for b in bs), default=0)
        s = np.array(bs, dtype="S%d" % max(maxlen, 1))
    n = s.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    s = np.ascontiguousarray(s)
    W = s.dtype.itemsize
    lens = np.char.str_len(s).astype(np.int64)
    width = (W // 16 + 1) * 16
    buf = np.zeros((n, width), dtype=np.uint8)
    buf[:, :W] = s.view(np.uint8).reshape(n, W)
    return _murmur_rows(buf, lens, seed)


def hash64_arrow(arr, seed: int = 0):
    """``hash64_batch`` over a pyarrow string/binary array: the padded
    row buffer is built by ONE vectorized scatter from the Arrow
    offsets buffer, so key assembly can stay in pyarrow.compute
    kernels end to end (the corpus generator's fast path)."""
    import numpy as np
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        raise ValueError("hash64_arrow: null keys")
    import pyarrow.compute as pc

    large = pa.types.is_large_string(arr.type) or pa.types.is_large_binary(
        arr.type)
    odt = np.int64 if large else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    lens = np.diff(off)
    width = (int(lens.max(initial=0)) // 16 + 1) * 16
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        # NUL-pad every key to one fixed width in a single C kernel:
        # the result's data buffer IS the (n, width) padded matrix
        # (utf8_rpad counts codepoints, == bytes for the ASCII keys
        # this path serves). ~30x cheaper than a numpy index scatter.
        padded = pc.utf8_rpad(arr, width, padding="\x00")
        if isinstance(padded, pa.ChunkedArray):
            padded = padded.combine_chunks()
        buf = np.frombuffer(
            padded.buffers()[2], dtype=np.uint8
        )[padded.offset * width:(padded.offset + n) * width].reshape(
            n, width).copy()
    else:
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        buf = np.zeros((n, width), dtype=np.uint8)
        if off[-1] > off[0]:
            rows = np.repeat(np.arange(n), lens)
            cols = np.arange(off[0], off[-1]) - np.repeat(off[:-1], lens)
            buf[rows, cols] = data[off[0]: off[-1]]
    return _murmur_rows(buf, lens, seed)


def _murmur_rows(buf, lens, seed: int = 0):
    """Vectorized x64-128 first lane over zero-padded uint8 rows."""
    import numpy as np

    n = buf.shape[0]
    w = buf.view("<u8")

    C1 = np.uint64(_C1)
    C2 = np.uint64(_C2)
    FIVE = np.uint64(5)
    A1 = np.uint64(0x52DCE729)
    A2 = np.uint64(0x38495AB5)

    def _rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    def _fmixv(x):
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xFF51AFD7ED558CCD)
        x = x ^ (x >> np.uint64(33))
        x = x * np.uint64(0xC4CEB9FE1A85EC53)
        x = x ^ (x >> np.uint64(33))
        return x

    h1 = np.full(n, np.uint64(seed & _MASK))
    h2 = np.full(n, np.uint64(seed & _MASK))
    nblocks = lens // 16
    for b in range(int(nblocks.max())):
        m = nblocks > b
        k1 = w[m, 2 * b] * C1
        k1 = _rotl(k1, 31) * C2
        h1m = h1[m] ^ k1
        h1m = _rotl(h1m, 27) + h2[m]
        h1m = h1m * FIVE + A1
        k2 = w[m, 2 * b + 1] * C2
        k2 = _rotl(k2, 33) * C1
        h2m = h2[m] ^ k2
        h2m = _rotl(h2m, 31) + h1m
        h2m = h2m * FIVE + A2
        h1[m] = h1m
        h2[m] = h2m

    idx = np.arange(n)
    tb = (2 * nblocks).astype(np.int64)
    k2t = w[idx, tb + 1] * C2
    k2t = _rotl(k2t, 33) * C1
    h2 = h2 ^ k2t
    k1t = w[idx, tb] * C1
    k1t = _rotl(k1t, 31) * C2
    h1 = h1 ^ k1t

    L = lens.astype(np.uint64)
    h1 = h1 ^ L
    h2 = h2 ^ L
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmixv(h1)
    h2 = _fmixv(h2)
    h1 = h1 + h2
    return h1
