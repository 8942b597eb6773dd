"""Device Poseidon (ops.poseidon) vs golden model — bit-exact (config 2)."""

import jax
import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import poseidon as gold
from blobstreamx_tpu.ops import poseidon as dev


def states_from_ints(batch):  # batch: list of 12-elem int lists -> (12, N) Gl
    arr = np.array(batch, dtype=np.uint64).T  # (12, N)
    return gf64.from_u64(arr)


def to_ints(x):  # (12, N) Gl -> list of columns
    arr = gf64.to_u64(x)
    return [list(map(int, arr[:, j])) for j in range(arr.shape[1])]


BATCH = [
    [0] * 12,
    list(range(12)),
    [gold.P - 1] * 12,
    [(i * 0x9E3779B97F4A7C15) % gold.P for i in range(12)],
    [(1 << 32) - 1] * 12,
    [(1 << 32)] * 12,
    [0xFFFFFFFF00000000] * 12,
    [(7**i) % gold.P for i in range(12)],
]


class TestPermute:
    def test_matches_golden(self):
        got = to_ints(jax.jit(dev.permute)(states_from_ints(BATCH)))
        for inp, out in zip(BATCH, got):
            assert out == gold.permute(inp)

    def test_large_batch_random(self):
        rng = np.random.default_rng(5)
        batch = rng.integers(0, gold.P, size=(256, 12), dtype=np.uint64)
        got = to_ints(jax.jit(dev.permute)(states_from_ints(batch)))
        for i in range(0, 256, 37):
            assert got[i] == gold.permute([int(x) for x in batch[i]])

    def test_pallas_interpret_matches_jnp(self):
        rng = np.random.default_rng(6)
        batch = rng.integers(0, gold.P, size=(16, 12), dtype=np.uint64)
        st = states_from_ints(batch)
        want = gf64.to_u64(dev.permute(st))
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            got = gf64.to_u64(dev.permute_pallas(st, block_n=16))
        np.testing.assert_array_equal(got, want)


class TestSponge:
    @pytest.mark.parametrize("L", [1, 4, 8, 9, 16, 20])
    def test_hash_columns(self, L):
        rng = np.random.default_rng(7)
        cols = rng.integers(0, gold.P, size=(L, 8), dtype=np.uint64)
        digests = gf64.to_u64(jax.jit(dev.hash_columns)(gf64.from_u64(cols)))
        for j in range(8):
            want = gold.hash_no_pad([int(x) for x in cols[:, j]])
            assert [int(v) for v in digests[:, j]] == want

    def test_compress_pairs(self):
        rng = np.random.default_rng(8)
        l = rng.integers(0, gold.P, size=(4, 16), dtype=np.uint64)
        r = rng.integers(0, gold.P, size=(4, 16), dtype=np.uint64)
        out = gf64.to_u64(jax.jit(dev.compress_pairs)(gf64.from_u64(l), gf64.from_u64(r)))
        for j in range(16):
            want = gold.two_to_one([int(x) for x in l[:, j]], [int(x) for x in r[:, j]])
            assert [int(v) for v in out[:, j]] == want
