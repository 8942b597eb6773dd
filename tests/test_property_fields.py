"""Property-based kernel tests (SURVEY.md §4.3 item 2: "property-based with
hypothesis on random inputs + adversarial edge cases (values >= p, carries,
identity points)").

Strategies bias toward the adversarial boundary: values near 0, near p, near
2^32 limb boundaries — where carry/borrow/canonicalization bugs live. Shapes
are fixed (LANES) so each jitted op compiles once for the whole suite.
"""

import numpy as np
import pytest

pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st

import jax

from blobstreamx_tpu.fields import gf25519, gf64
from blobstreamx_tpu.golden import goldilocks as gold

P = gold.P
Q = gf25519.Q
LANES = 8

EDGE64 = [0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
          P >> 1, (P >> 1) + 1, 0xFFFFFFFF00000000, P - (1 << 32)]
gl_elem = st.one_of(st.sampled_from(EDGE64), st.integers(0, P - 1))
gl_vec = st.lists(gl_elem, min_size=LANES, max_size=LANES)

EDGE255 = [0, 1, 2, Q - 1, Q - 2, (1 << 255) - 1, 1 << 128, (1 << 16) - 1,
           Q >> 1, 19, Q - 19]
f25519_elem = st.one_of(st.sampled_from(EDGE255), st.integers(0, Q - 1))
f25519_vec = st.lists(f25519_elem, min_size=LANES, max_size=LANES)

_gl_add = jax.jit(gf64.gl_add)
_gl_sub = jax.jit(gf64.gl_sub)
_gl_mul = jax.jit(gf64.gl_mul)
_gl_neg = jax.jit(gf64.gl_neg)
_gl_inv = jax.jit(gf64.gl_inv)
_f_add = jax.jit(gf25519.add)
_f_sub = jax.jit(gf25519.sub)
_f_mul = jax.jit(gf25519.mul)
_f_can = jax.jit(gf25519.canonicalize)


def _gl(vals):
    return gf64.from_u64(np.array(vals, dtype=np.uint64))


def _gl_ints(x):
    return [int(v) for v in gf64.to_u64(x)]


class TestGoldilocksProperties:
    @settings(max_examples=30, deadline=None)
    @given(gl_vec, gl_vec)
    def test_add_sub_mul_match_golden(self, a, b):
        ga, gb = _gl(a), _gl(b)
        assert _gl_ints(_gl_add(ga, gb)) == [gold.add(x, y) for x, y in zip(a, b)]
        assert _gl_ints(_gl_sub(ga, gb)) == [gold.sub(x, y) for x, y in zip(a, b)]
        assert _gl_ints(_gl_mul(ga, gb)) == [gold.mul(x, y) for x, y in zip(a, b)]

    @settings(max_examples=20, deadline=None)
    @given(gl_vec)
    def test_neg_additive_inverse(self, a):
        ga = _gl(a)
        s = _gl_ints(_gl_add(ga, _gl_neg(ga)))
        assert s == [0] * LANES

    @settings(max_examples=10, deadline=None)
    @given(gl_vec)
    def test_inv_multiplicative_inverse(self, a):
        ga = _gl(a)
        prod = _gl_ints(_gl_mul(ga, _gl_inv(ga)))
        want = [1 if x % P else 0 for x in a]  # inv maps 0 -> 0
        assert prod == want

    @settings(max_examples=20, deadline=None)
    @given(gl_vec, gl_vec, gl_vec)
    def test_mul_distributes(self, a, b, c):
        ga, gb, gc = _gl(a), _gl(b), _gl(c)
        lhs = _gl_ints(_gl_mul(ga, _gl_add(gb, gc)))
        rhs = _gl_ints(_gl_add(_gl_mul(ga, gb), _gl_mul(ga, gc)))
        assert lhs == rhs


class TestGf25519Properties:
    @settings(max_examples=30, deadline=None)
    @given(f25519_vec, f25519_vec)
    def test_ring_ops_match_bigints(self, a, b):
        fa, fb = gf25519.from_int(a), gf25519.from_int(b)
        assert gf25519.to_int(_f_can(_f_add(fa, fb))) == [
            (x + y) % Q for x, y in zip(a, b)
        ]
        assert gf25519.to_int(_f_can(_f_sub(fa, fb))) == [
            (x - y) % Q for x, y in zip(a, b)
        ]
        assert gf25519.to_int(_f_can(_f_mul(fa, fb))) == [
            (x * y) % Q for x, y in zip(a, b)
        ]

    @settings(max_examples=15, deadline=None)
    @given(f25519_vec)
    def test_canonicalize_idempotent_and_reduced(self, a):
        fa = gf25519.from_int(a)
        c1 = _f_can(fa)
        assert gf25519.to_int(c1) == [x % Q for x in a]
        assert gf25519.to_int(_f_can(c1)) == gf25519.to_int(c1)

    @settings(max_examples=15, deadline=None)
    @given(f25519_vec, f25519_vec, f25519_vec)
    def test_mul_associates(self, a, b, c):
        fa, fb, fc = (gf25519.from_int(v) for v in (a, b, c))
        lhs = gf25519.to_int(_f_can(_f_mul(_f_mul(fa, fb), fc)))
        rhs = gf25519.to_int(_f_can(_f_mul(fa, _f_mul(fb, fc))))
        assert lhs == rhs
