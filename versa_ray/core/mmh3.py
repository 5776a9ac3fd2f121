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
