"""Vectorized corpus generation and batched murmur vs the scalar
reference paths — bit-identity is the whole contract (the bench
headline and every KG golden depend on the corpus not shifting)."""

import random
import string

import numpy as np
import pyarrow as pa
import pytest

from versa_ray.core.mmh3 import hash64_batch, hash64_arrow, hash128_x64
from versa_ray.web.synth import page_batch, page_batch_rows


def _random_keys(n, maxlen=40):
    rng = random.Random(5)
    alpha = string.ascii_letters + string.digits + ":|"
    keys = ["".join(rng.choices(alpha, k=rng.randint(0, maxlen)))
            for _ in range(n)]
    # exact block/tail boundary lengths
    keys += ["", "a" * 7, "b" * 8, "c" * 9, "d" * 15, "e" * 16, "f" * 17,
             "g" * 31, "h" * 32, "i" * 33, "42:p1:99999:31"]
    return keys


def test_hash64_batch_bit_identical():
    keys = _random_keys(3000)
    want = np.array([hash128_x64(k.encode())[0] for k in keys],
                    dtype=np.uint64)
    assert np.array_equal(hash64_batch(np.array(keys)), want)
    assert np.array_equal(hash64_batch(keys), want)  # list path


def test_hash64_arrow_bit_identical():
    keys = _random_keys(3000)
    want = np.array([hash128_x64(k.encode())[0] for k in keys],
                    dtype=np.uint64)
    arr = pa.array(keys)
    assert np.array_equal(hash64_arrow(arr), want)
    # sliced array exercises the offset handling
    assert np.array_equal(hash64_arrow(arr.slice(7, 200)), want[7:207])
    # binary arrays take the scatter path
    barr = pa.array([k.encode() for k in keys], pa.binary())
    assert np.array_equal(hash64_arrow(barr), want)


@pytest.mark.parametrize("seed,start,stop,n_pages", [
    (42, 0, 500, 1000),
    (42, 995, 1005, 100_000),   # straddles a block boundary id range
    (7, 0, 50, 50),             # tiny pools (n_pages // 8 < 2 edges)
    (42, 99_990, 100_000, 100_000),
    (42, 0, 3, 3),
])
def test_page_batch_bit_identical(seed, start, stop, n_pages):
    got = page_batch(seed, start, stop, n_pages)
    want = page_batch_rows(seed, start, stop, n_pages)
    assert got.equals(want)
