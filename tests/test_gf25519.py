"""Device GF(2^255-19) vs python bigint math (batched edge + random values)."""

import jax
import numpy as np
import pytest

from blobstreamx_tpu.fields import gf25519 as f

Q = f.Q

EDGE = [
    0, 1, 2, 19, Q - 1, Q - 2, Q, Q + 1,          # around p (semi-reduced allowed)
    (1 << 255) - 1, 1 << 255, (1 << 256) - 1,      # around 2^255 / max
    (1 << 256) - 38, (1 << 256) - 39,              # 2p boundary
    0x1234567890ABCDEF_FEDCBA0987654321,
]
RNG = np.random.default_rng(0)
RAND = [int.from_bytes(RNG.bytes(32), "little") for _ in range(200)]
VALUES = EDGE + RAND


def pairs():
    a = VALUES * 2
    b = VALUES + VALUES[::-1]
    m = min(len(a), len(b))
    return a[:m], b[:m]


A_INT, B_INT = pairs()
A, B = f.from_int(A_INT), f.from_int(B_INT)


def check(dev_fn, gold_fn):
    got = f.to_int(jax.jit(dev_fn)(A, B))
    for g, x, y in zip(got, A_INT, B_INT):
        want = gold_fn(x, y)
        assert g % Q == want % Q, (x, y)
        assert g < (1 << 256)  # semi-reduced invariant


class TestField:
    def test_roundtrip_encoding(self):
        assert f.to_int(A) == A_INT

    def test_add(self):
        check(f.add, lambda x, y: (x + y) % Q)

    def test_sub(self):
        check(f.sub, lambda x, y: (x - y) % Q)

    def test_mul(self):
        check(f.mul, lambda x, y: (x * y) % Q)

    @pytest.mark.parametrize("k", [1, 2, 38, 121665])
    def test_mul_small(self, k):
        if k < (1 << 15):
            got = f.to_int(jax.jit(lambda a: f.mul_small(a, k))(A))
            for g, x in zip(got, A_INT):
                assert g % Q == (x * k) % Q

    def test_canonicalize(self):
        got = f.to_int(jax.jit(f.canonicalize)(A))
        for g, x in zip(got, A_INT):
            assert g == x % Q

    def test_eq(self):
        # a == a + p must hold canonically
        small = [5, 123, Q - 1]
        x = f.from_int(small)
        y = f.from_int([v + Q for v in small])
        assert bool(jax.jit(f.eq)(x, y).all())
        z = f.from_int([v + 1 for v in small])
        assert not bool(jax.jit(f.eq)(x, z).any())

    def test_inv(self):
        vals = [v for v in VALUES[:24] if v % Q != 0]
        x = f.from_int(vals)
        got = f.to_int(jax.jit(f.inv)(x))
        for g, v in zip(got, vals):
            assert g % Q == pow(v, Q - 2, Q)

    def test_pow_sqrt_candidate(self):
        # the (p+3)/8 exponent used in decompression
        vals = [4, 9, 25]
        got = f.to_int(jax.jit(lambda a: f.pow_static(a, (Q + 3) // 8))(f.from_int(vals)))
        for g, v in zip(got, vals):
            assert (g * g) % Q in (v % Q, (-v) % Q)
