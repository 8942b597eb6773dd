"""Device SHA-256 + tuple tree vs golden/hashlib — config 1 (bit-exact, CPU)."""

import hashlib

import jax
import numpy as np
import pytest

from blobstreamx_tpu.golden import merkle as gold_merkle
from blobstreamx_tpu.ops import sha256 as dev


class TestCompress:
    def test_packed_messages_various_lengths(self):
        msgs = [b"", b"abc", b"a" * 55, b"b" * 56, b"c" * 64, b"d" * 100, b"e" * 200]
        blocks, n_blocks = dev.pack_messages_host(msgs)
        digests = jax.jit(dev.sha256_packed)(jnp_blocks := np.asarray(blocks), n_blocks)
        got = dev.digests_to_bytes(digests)
        for m, d in zip(msgs, got):
            assert d == hashlib.sha256(m).digest(), m

    def test_large_batch(self):
        rng = np.random.default_rng(0)
        msgs = [rng.bytes(40) for _ in range(256)]
        blocks, n_blocks = dev.pack_messages_host(msgs)
        got = dev.digests_to_bytes(jax.jit(dev.sha256_packed)(blocks, n_blocks))
        for m, d in zip(msgs, got):
            assert d == hashlib.sha256(m).digest()


class TestPrefixedPair:
    def test_inner_hash(self):
        rng = np.random.default_rng(1)
        lefts = [rng.bytes(32) for _ in range(16)]
        rights = [rng.bytes(32) for _ in range(16)]
        out = jax.jit(dev.inner_hash_pairs)(
            dev.bytes32_to_words(lefts), dev.bytes32_to_words(rights)
        )
        got = dev.digests_to_bytes(out)
        for l, r, d in zip(lefts, rights, got):
            assert d == hashlib.sha256(b"\x01" + l + r).digest()

    def test_leaf_hash_tuples(self):
        rng = np.random.default_rng(2)
        heights = [1, 2**31, 2**33 + 5, 10**12]
        hashes = [rng.bytes(32) for _ in heights]
        hlo = np.array([h & 0xFFFFFFFF for h in heights], np.uint32)
        hhi = np.array([h >> 32 for h in heights], np.uint32)
        out = jax.jit(dev.leaf_hash_tuples)(hlo, hhi, dev.bytes32_to_words(hashes))
        got = dev.digests_to_bytes(out)
        for h, dh, d in zip(heights, hashes, got):
            leaf = gold_merkle.data_root_tuple(h, dh)
            assert d == hashlib.sha256(b"\x00" + leaf).digest()


class TestTupleTree:
    @pytest.mark.parametrize("n", [1, 2, 8, 64])
    def test_config1_bit_exact(self, n):
        """Config 1 (/root/repo/BASELINE.json:7): data-root tuple root."""
        rng = np.random.default_rng(3)
        heights = list(range(1000, 1000 + n))
        hashes = [rng.bytes(32) for _ in range(n)]
        hlo = np.array([h & 0xFFFFFFFF for h in heights], np.uint32)
        hhi = np.array([h >> 32 for h in heights], np.uint32)
        root = jax.jit(dev.tuple_tree_root)(hlo, hhi, dev.bytes32_to_words(hashes))
        got = dev.digests_to_bytes(root)[0]
        assert got == gold_merkle.data_commitment(heights, hashes)
