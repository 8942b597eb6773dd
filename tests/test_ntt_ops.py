"""Device NTT/LDE vs golden model — natural order, coset, four-step."""

import jax
import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gl, ntt as gold
from blobstreamx_tpu.ops import ntt as dev


def enc_cols(cols_np):  # (n, C) uint64 -> Gl
    return gf64.from_u64(cols_np)


class TestNttCols:
    @pytest.mark.parametrize("log_n", [0, 1, 3, 6, 10])
    def test_forward_matches_golden(self, log_n):
        rng = np.random.default_rng(log_n)
        n = 1 << log_n
        cols = rng.integers(0, gl.P, size=(n, 3), dtype=np.uint64)
        got = gf64.to_u64(jax.jit(dev.ntt_cols)(enc_cols(cols)))
        for j in range(3):
            want = gold.ntt([int(v) for v in cols[:, j]])
            assert [int(v) for v in got[:, j]] == want

    @pytest.mark.parametrize("log_n", [1, 5, 9])
    def test_roundtrip(self, log_n):
        rng = np.random.default_rng(20 + log_n)
        n = 1 << log_n
        cols = rng.integers(0, gl.P, size=(n, 2), dtype=np.uint64)
        fwd = dev.ntt_cols(enc_cols(cols))
        back = gf64.to_u64(dev.ntt_cols(fwd, inverse=True))
        np.testing.assert_array_equal(back, cols)

    def test_coset_lde_matches_golden(self):
        rng = np.random.default_rng(33)
        coeffs = rng.integers(0, gl.P, size=(16, 2), dtype=np.uint64)
        got = gf64.to_u64(jax.jit(lambda x: dev.lde_cols(x, 3))(enc_cols(coeffs)))
        for j in range(2):
            want = gold.lde([int(v) for v in coeffs[:, j]], 3)
            assert [int(v) for v in got[:, j]] == want

    def test_coset_roundtrip(self):
        rng = np.random.default_rng(34)
        coeffs = rng.integers(0, gl.P, size=(32, 2), dtype=np.uint64)
        ev = dev.coset_ntt_cols(enc_cols(coeffs))
        back = gf64.to_u64(dev.coset_intt_cols(ev))
        np.testing.assert_array_equal(back, coeffs)


class TestFourStep:
    @pytest.mark.parametrize("log_n", [2, 5, 8, 11])
    def test_matches_ntt_cols(self, log_n):
        rng = np.random.default_rng(40 + log_n)
        n = 1 << log_n
        x = rng.integers(0, gl.P, size=(n, 1), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_cols(enc_cols(x)))[:, 0]
        flat = gf64.from_u64(x[:, 0])
        got = gf64.to_u64(jax.jit(dev.ntt_four_step)(flat))
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("log_n", [4, 9])
    def test_roundtrip(self, log_n):
        rng = np.random.default_rng(50 + log_n)
        x = rng.integers(0, gl.P, size=(1 << log_n,), dtype=np.uint64)
        fwd = dev.ntt_four_step(gf64.from_u64(x))
        back = gf64.to_u64(dev.ntt_four_step(fwd, inverse=True))
        np.testing.assert_array_equal(back, x)


class TestPallasFused:
    """Roll-formulated fused-stage kernel (ops.ntt.ntt_cols_pallas): bit-exact
    vs ntt_cols. Interpret mode on CPU; the same kernel compiles on TPU (the
    bench harness cross-checks it on real silicon)."""

    @pytest.mark.parametrize("log_n", [3, 6, 9])
    def test_matches_ntt_cols(self, log_n):
        rng = np.random.default_rng(60 + log_n)
        n = 1 << log_n
        x = rng.integers(0, gl.P, size=(n, 128), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_cols(enc_cols(x)))
        got = gf64.to_u64(dev.ntt_cols_pallas(enc_cols(x), interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_inverse_matches(self):
        rng = np.random.default_rng(70)
        x = rng.integers(0, gl.P, size=(64, 128), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_cols(enc_cols(x), inverse=True))
        got = gf64.to_u64(dev.ntt_cols_pallas(enc_cols(x), inverse=True, interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_four_step_pallas(self):
        rng = np.random.default_rng(71)
        x = rng.integers(0, gl.P, size=(1 << 10,), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_four_step(gf64.from_u64(x)))
        got = gf64.to_u64(dev.ntt_four_step_pallas(gf64.from_u64(x), interpret=True))
        np.testing.assert_array_equal(got, want)


class TestPallasSplit:
    """Split-butterfly fused kernel (ops.ntt.ntt_cols_pallas_split): same
    contract as the roll kernel with half the twiddle multiplies."""

    @pytest.mark.parametrize("log_n", [3, 6, 9])
    def test_matches_ntt_cols(self, log_n):
        rng = np.random.default_rng(80 + log_n)
        n = 1 << log_n
        x = rng.integers(0, gl.P, size=(n, 128), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_cols(enc_cols(x)))
        got = gf64.to_u64(dev.ntt_cols_pallas_split(enc_cols(x), interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_inverse_matches(self):
        rng = np.random.default_rng(81)
        x = rng.integers(0, gl.P, size=(64, 128), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_cols(enc_cols(x), inverse=True))
        got = gf64.to_u64(
            dev.ntt_cols_pallas_split(enc_cols(x), inverse=True, interpret=True)
        )
        np.testing.assert_array_equal(got, want)

    def test_four_step_split(self):
        rng = np.random.default_rng(82)
        x = rng.integers(0, gl.P, size=(1 << 10,), dtype=np.uint64)
        want = gf64.to_u64(dev.ntt_four_step(gf64.from_u64(x)))
        got = gf64.to_u64(
            dev.ntt_four_step_pallas_split(gf64.from_u64(x), interpret=True)
        )
        np.testing.assert_array_equal(got, want)
