"""Multi-chip programs on the 8-device CPU mesh (SURVEY.md §4.3 item 4):
six-step all_to_all NTT, sharded LDE, sharded tuple tree, sharded Poseidon
tree. The same shard_map code runs unmodified on a pod slice."""

import jax
import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gl, merkle as gold_merkle, ntt as gold_ntt
from blobstreamx_tpu.ops import merkle as merkle_ops, ntt as ntt_ops, sha256 as sha_ops
from blobstreamx_tpu.parallel import merkle as pmerkle, mesh as pmesh, ntt as pntt


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return pmesh.make_mesh(8)


class TestShardedNtt:
    @pytest.mark.parametrize("log_n,inverse", [(8, False), (10, False), (10, True), (12, False)])
    def test_matches_single_chip(self, mesh8, log_n, inverse):
        rng = np.random.default_rng(log_n)
        n = 1 << log_n
        x = rng.integers(0, gl.P, size=(n,), dtype=np.uint64)
        want = gf64.to_u64(ntt_ops.ntt_four_step(gf64.from_u64(x), inverse))
        got = gf64.to_u64(pntt.ntt_sharded(gf64.from_u64(x), mesh8, inverse))
        np.testing.assert_array_equal(got, want)

    def test_fold_pairs_stay_local(self, mesh8):
        """The (n2, n1) output matrix pairs rows (k2, k2+n2/2) per FRI fold —
        document + verify index mapping out[k2*n1+k1] == Z[k2,k1]."""
        rng = np.random.default_rng(99)
        n = 1 << 8
        n1, n2 = pntt._factor(8)
        x = rng.integers(0, gl.P, size=(n,), dtype=np.uint64)
        xm = gf64.from_u64(x.reshape(n1, n2))
        xm = jax.device_put(xm, pmesh.col_sharding(mesh8))
        z = pntt.ntt_matrix_sharded(xm, mesh8)
        z_flat = gf64.to_u64(z).reshape(n)
        want = gf64.to_u64(ntt_ops.ntt_cols(gf64.from_u64(x[:, None])))[:, 0]
        np.testing.assert_array_equal(z_flat, want)

    def test_lde_cols_sharded(self, mesh8):
        rng = np.random.default_rng(3)
        coeffs = rng.integers(0, gl.P, size=(32, 16), dtype=np.uint64)
        x = jax.device_put(gf64.from_u64(coeffs), pmesh.col_sharding(mesh8))
        got = gf64.to_u64(pntt.lde_cols_sharded(x, 2, mesh8))
        want = gf64.to_u64(ntt_ops.lde_cols(gf64.from_u64(coeffs), 2))
        np.testing.assert_array_equal(got, want)


class TestShardedTrees:
    def test_tuple_tree_root(self, mesh8):
        rng = np.random.default_rng(4)
        n = 64
        heights = list(range(700, 700 + n))
        hashes = [rng.bytes(32) for _ in range(n)]
        hlo = np.array([h & 0xFFFFFFFF for h in heights], np.uint32)
        hhi = np.array([h >> 32 for h in heights], np.uint32)
        root = pmerkle.tuple_tree_root_sharded(
            hlo, hhi, sha_ops.bytes32_to_words(hashes), mesh8
        )
        got = sha_ops.digests_to_bytes(root)[0]
        assert got == gold_merkle.data_commitment(heights, hashes)

    @pytest.mark.parametrize("cap_height", [0, 1, 4])
    def test_poseidon_tree(self, mesh8, cap_height):
        rng = np.random.default_rng(5)
        n, L = 32, 3
        cols = rng.integers(0, gl.P, size=(L, n), dtype=np.uint64)
        leaves = jax.device_put(gf64.from_u64(cols), pmesh.col_sharding(mesh8))
        tree = pmerkle.poseidon_tree_sharded(leaves, mesh8, cap_height)
        want_tree = merkle_ops.build_tree(gf64.from_u64(cols), cap_height)
        assert merkle_ops.cap_to_ints(tree) == merkle_ops.cap_to_ints(want_tree)
        for idx in (0, 7, 31):
            assert tree.path(idx) == want_tree.path(idx)
