"""Device Goldilocks (fields.gf64) vs the pure-Python golden model.

Batched property testing: one vectorized (jitted) device call over thousands
of inputs — the full edge-case cross product plus random values — compared
elementwise against the golden model (SURVEY.md §4.3 item 2). Runs on the CPU
backend; the identical jitted code runs on TPU.
"""

import jax
import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gold

P = gold.P
EDGE = np.array(
    [
        0, 1, 2, P - 1, P - 2,
        (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
        (1 << 63), (1 << 63) - 1,
        0xFFFFFFFF00000000, 0x00000000FFFFFFFF, 0x0123456789ABCDEF % P,
        0xFFFFFFFE00000001, 0x8000000000000000 % P,
    ],
    dtype=np.uint64,
)


def _pairs(n_random=2000, seed=0):
    """All edge x edge pairs + random pairs."""
    ea, eb = np.meshgrid(EDGE, EDGE)
    rng = np.random.default_rng(seed)
    ra = rng.integers(0, P, size=n_random, dtype=np.uint64)
    rb = rng.integers(0, P, size=n_random, dtype=np.uint64)
    a = np.concatenate([ea.ravel(), ra])
    b = np.concatenate([eb.ravel(), rb])
    return a, b


A_NP, B_NP = _pairs()
A, B = gf64.from_u64(A_NP), gf64.from_u64(B_NP)


def check(device_fn, golden_fn, a_np=A_NP, b_np=B_NP, a=A, b=B):
    got = gf64.to_u64(jax.jit(device_fn)(a, b))
    want = np.array(
        [golden_fn(int(x), int(y)) for x, y in zip(a_np, b_np)], dtype=np.uint64
    )
    np.testing.assert_array_equal(got, want)


class TestArith:
    def test_add(self):
        check(gf64.gl_add, gold.add)

    def test_sub(self):
        check(gf64.gl_sub, gold.sub)

    def test_mul(self):
        check(gf64.gl_mul, gold.mul)

    def test_neg(self):
        check(lambda a, b: gf64.gl_neg(a), lambda x, y: gold.neg(x))

    def test_square(self):
        check(lambda a, b: gf64.gl_square(a), lambda x, y: gold.mul(x, x))

    @pytest.mark.parametrize("k", [0, 1, 5, 16, 31])
    def test_mul_pow2(self, k):
        check(lambda a, b: gf64.gl_mul_pow2(a, k), lambda x, y: gold.mul(x, 1 << k))

    def test_inv(self):
        nz = A_NP[A_NP != 0][:64]  # inversion unrolls ~130 muls; keep batch small
        got = gf64.to_u64(jax.jit(gf64.gl_inv)(gf64.from_u64(nz)))
        want = np.array([gold.inv(int(x)) for x in nz], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)
        assert int(gf64.to_u64(gf64.gl_inv(gf64.from_u64(np.array([0], np.uint64))))[0]) == 0

    @pytest.mark.parametrize("e", [0, 1, 7, (P - 1) // 2, P - 2, (1 << 70) + 12345])
    def test_pow(self, e):
        vals = A_NP[:32]
        got = gf64.to_u64(jax.jit(lambda a: gf64.gl_pow(a, e))(gf64.from_u64(vals)))
        want = np.array([gold.exp(int(x), e) for x in vals], dtype=np.uint64)
        np.testing.assert_array_equal(got, want)

    def test_canonical_outputs(self):
        """All ops must return values < p even at the wrap boundary."""
        for fn in (gf64.gl_add, gf64.gl_sub, gf64.gl_mul):
            out = gf64.to_u64(jax.jit(fn)(A, B))
            assert (out < np.uint64(P)).all()


class TestExtension:
    def test_ext_mul(self):
        n = len(A_NP) // 2
        a = (gf64.from_u64(A_NP[:n]), gf64.from_u64(A_NP[n : 2 * n]))
        b = (gf64.from_u64(B_NP[:n]), gf64.from_u64(B_NP[n : 2 * n]))
        c0, c1 = jax.jit(gf64.ext_mul)(a, b)
        got0, got1 = gf64.to_u64(c0), gf64.to_u64(c1)
        for i in range(0, n, 97):
            want = gold.ext_mul(
                (int(A_NP[i]), int(A_NP[n + i])), (int(B_NP[i]), int(B_NP[n + i]))
            )
            assert (int(got0[i]), int(got1[i])) == want

    def test_ext_square_nonresidue(self):
        one = gf64.from_u64(np.array([1], np.uint64))
        zero = gf64.from_u64(np.array([0], np.uint64))
        c0, c1 = gf64.ext_square((zero, one))  # X^2 == 7
        assert int(gf64.to_u64(c0)[0]) == 7 and int(gf64.to_u64(c1)[0]) == 0
