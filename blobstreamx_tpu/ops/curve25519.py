"""Batched edwards25519 point arithmetic on TPU (component C6).

Points are extended homogeneous coordinates (X, Y, Z, T), each a (16, N)
gf25519 limb array. The addition law is the *complete* unified twisted-
Edwards formula (a = -1 is a square mod p, d is a non-square, so one formula
handles generic adds, doublings, and the identity with no branches — exactly
what SIMD lanes need; SURVEY.md §7.2 item 2: "constant shape despite
data-dependent bucket occupancy").

Golden oracle: blobstreamx_tpu.golden.ed25519.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.fields import gf25519 as f
from blobstreamx_tpu.golden import ed25519 as gold

Q = gold.Q
D = gold.D
TWO_D = (2 * D) % Q
SQRT_M1 = pow(2, (Q - 1) // 4, Q)  # sqrt(-1)

# A point batch is a tuple (X, Y, Z, T) of (16, N) uint32 arrays.
Point = tuple


def identity(n: int) -> Point:
    return (f.zeros(n), f.full(n, 1), f.full(n, 1), f.zeros(n))


def base_point(n: int) -> Point:
    return (
        f.full(n, gold.BASE_X),
        f.full(n, gold.BASE_Y),
        f.full(n, 1),
        f.full(n, gold.BASE_X * gold.BASE_Y % Q),
    )


def add(p: Point, q: Point) -> Point:
    """Complete unified addition (add-2008-hwcd-3 with k = 2d)."""
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = f.mul(f.sub(y1, x1), f.sub(y2, x2))
    b = f.mul(f.add(y1, x1), f.add(y2, x2))
    k2d = f.full(x1.shape[1], TWO_D)
    c = f.mul(f.mul(t1, k2d), t2)
    d = f.mul(f.add(z1, z1), z2)
    e = f.sub(b, a)
    ff = f.sub(d, c)
    g = f.add(d, c)
    h = f.add(b, a)
    return (f.mul(e, ff), f.mul(g, h), f.mul(ff, g), f.mul(e, h))


def double(p: Point) -> Point:
    return add(p, p)


# ----------------------------------------------------------------------------
# Pallas fused complete addition
# ----------------------------------------------------------------------------
#
# Through XLA, one complete add lowers to ~9 field muls whose (16,16,N)
# partial-product tensors and carry intermediates all round-trip HBM between
# fusions — the MSM's bucket phases are HBM-traffic-bound, not compute-bound
# (profiled ~4 ms per point op at N=65k on v5e). The Pallas kernel runs the
# SAME jnp formulas (gf25519 ops compose inside a kernel body; unrolled
# carries, no inner scans) with every intermediate in VMEM: traffic drops to
# the 12 coord arrays in + 4 out. Lane axis tiled by 512; sublane = 16 limbs.


def _add_kernel(x1, y1, z1, t1, x2, y2, z2, t2, fourp, k2d, ox, oy, oz, ot):
    # Pallas kernels may not close over device constants, so the two (16,)
    # constant columns (4p - 2^256 for subtraction, 2d for the addition law)
    # arrive as inputs; the field formulas below are otherwise identical to
    # gf25519 / the plain add (scalar literals like 38 are fine).
    fourp_c = fourp[:]  # (16, 1), broadcasts over lanes

    def ksub(a, b):
        cols = a + fourp_c + (f.MASK16 - b)
        cols = f._add_at0(cols, jnp.ones_like(cols[0]))
        words, over = f._propagate_scan(cols)
        return f._fold_overflow(words, over)

    p = (x1[:], y1[:], z1[:], t1[:])
    q = (x2[:], y2[:], z2[:], t2[:])
    k2d_b = jnp.broadcast_to(k2d[:], p[0].shape)
    a = f.mul(ksub(p[1], p[0]), ksub(q[1], q[0]))
    b = f.mul(f.add(p[1], p[0]), f.add(q[1], q[0]))
    c = f.mul(f.mul(p[3], k2d_b), q[3])
    d = f.mul(f.add(p[2], p[2]), q[2])
    e = ksub(b, a)
    ff = ksub(d, c)
    g = f.add(d, c)
    h = f.add(b, a)
    ox[:] = f.mul(e, ff)
    oy[:] = f.mul(g, h)
    oz[:] = f.mul(ff, g)
    ot[:] = f.mul(e, h)


@lru_cache(maxsize=None)
def _add_consts():
    # NUMPY on purpose: jnp.asarray inside an active jit trace returns a
    # tracer, and caching that leaks it into later traces; numpy constants
    # are lifted per-call instead.
    k2d_col = np.array([(TWO_D >> (16 * i)) & 0xFFFF for i in range(16)], np.uint32)
    return f._FOURP_LO.reshape(16, 1).copy(), k2d_col.reshape(16, 1)


@lru_cache(maxsize=None)
def _add_pallas_call(n: int, tile: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // tile,)
    spec = pl.BlockSpec((16, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((16, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _add_kernel,
        grid=grid,
        in_specs=[spec] * 8 + [cspec, cspec],
        out_specs=[spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((16, n), jnp.uint32)] * 4,
    )


def add_fused(p: Point, q: Point, tile: int = 512) -> Point:
    """Complete addition via one fused Pallas kernel when the lane count
    tiles cleanly on TPU; falls back to the plain jnp formula otherwise
    (identical values either way)."""
    n = p[0].shape[1]
    if jax.default_backend() != "tpu" or n % tile != 0:
        return add(p, q)
    fourp, k2d = _add_consts()
    return tuple(_add_pallas_call(n, tile)(*p, *q, fourp, k2d))


def neg(p: Point) -> Point:
    n = p[0].shape[1]
    return (f.sub(f.zeros(n), p[0]), p[1], p[2], f.sub(f.zeros(n), p[3]))


def select(mask, p: Point, q: Point) -> Point:
    return tuple(f.select(mask, a, b) for a, b in zip(p, q))


def equal(p: Point, q: Point):
    """Projective equality mask (N,): X1Z2 == X2Z1 and Y1Z2 == Y2Z1."""
    ex = f.eq(f.mul(p[0], q[2]), f.mul(q[0], p[2]))
    ey = f.eq(f.mul(p[1], q[2]), f.mul(q[1], p[2]))
    return ex & ey


def is_identity(p: Point):
    n = p[0].shape[1]
    return equal(p, identity(n))


def on_curve(p: Point):
    """-x^2 + y^2 == z^2 + d*t^2  and  x*y == z*t (extended-coords invariants)."""
    x, y, z, t = p
    lhs = f.sub(f.mul(y, y), f.mul(x, x))
    rhs = f.add(f.mul(z, z), f.mul(f.full(x.shape[1], D), f.mul(t, t)))
    e1 = f.eq(lhs, rhs)
    e2 = f.eq(f.mul(x, y), f.mul(z, t))
    return e1 & e2


# ----------------------------------------------------------------------------
# decompression (RFC 8032 §5.1.3), fully batched on device
# ----------------------------------------------------------------------------


def decompress(encoded: np.ndarray):
    """encoded: (32, N) uint8 little-endian point encodings (host numpy).

    Returns (Point, valid_mask). Invalid lanes decode to the identity with
    valid=False. The device part runs as ONE jitted program — the sqrt
    exponentiation chain is ~250 ops, and dispatching them one by one costs
    seconds per call on a tunneled backend (measured: 26 s warm for N=32
    unjitted vs milliseconds jitted).
    """
    y_limbs, sign = unpack_y_limbs_host(encoded)
    return _decompress_device(y_limbs, sign)


def _decompress_core(y, sign):
    n = y.shape[1]
    one = f.full(n, 1)
    y2 = f.mul(y, y)
    u = f.sub(y2, one)  # y^2 - 1
    v = f.add(f.mul(f.full(n, D), y2), one)  # d y^2 + 1
    # x = u v^3 (u v^7)^((q-5)/8): ONE ~254-mul chain replaces the previous
    # inv(v) + pow((q+3)/8) pair (~1000 muls of nested While latency); the
    # candidate-root checks go multiplicative (v x^2 ?= u) so no inversion
    # is ever needed.
    v3 = f.mul(f.mul(v, v), v)
    v7 = f.mul(f.mul(v3, v3), v)
    x = f.mul(f.mul(u, v3), f.pow22523(f.mul(u, v7)))
    vx2 = f.mul(v, f.mul(x, x))
    needs_sqrtm1 = ~f.eq(vx2, u)
    x_alt = f.mul(x, f.full(n, SQRT_M1))
    x = f.select(needs_sqrtm1, x_alt, x)
    valid = f.eq(f.mul(v, f.mul(x, x)), u)
    # y must be < p for a canonical encoding
    valid = valid & jnp.all(y == f.canonicalize(y), axis=0)

    x_can = f.canonicalize(x)
    x_is_zero = f.is_zero(x_can)
    # sign==1 with x==0 is invalid
    valid = valid & ~(x_is_zero & (sign == 1))
    flip = (x_can[0] & 1) != sign
    x_final = f.select(flip, f.sub(f.zeros(n), x_can), x_can)

    pt = (x_final, y, one, f.mul(x_final, y))
    idn = identity(n)
    return select(valid, pt, idn), valid


_decompress_device = jax.jit(_decompress_core)


def unpack_y_limbs_host(encoded: np.ndarray):
    """(32, N) uint8 encodings -> ((16, N) y limbs, (N,) sign bits), host."""
    n = encoded.shape[1]
    sign = (encoded[31] >> 7).astype(np.uint32)
    enc = encoded.copy()
    enc[31] &= 0x7F
    y_limbs = np.zeros((16, n), dtype=np.uint32)
    for i in range(16):
        y_limbs[i] = enc[2 * i].astype(np.uint32) | (enc[2 * i + 1].astype(np.uint32) << 8)
    return y_limbs, sign


def encode_points_host(raw: list[bytes]) -> np.ndarray:
    """list of 32-byte encodings -> (32, N) uint8."""
    return np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(-1, 32).T.copy()


def to_affine_ints(p: Point) -> list[tuple[int, int]]:
    """Host-side: canonical (x, y) pairs for comparison with the golden model."""
    zinv = f.inv(p[2])
    x = f.to_int(f.canonicalize(f.mul(p[0], zinv)))
    y = f.to_int(f.canonicalize(f.mul(p[1], zinv)))
    return list(zip(x, y))
