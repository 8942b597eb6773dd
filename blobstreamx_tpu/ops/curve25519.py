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
    n = encoded.shape[1]
    sign = (encoded[31] >> 7).astype(np.uint32)
    # y limbs: 16-bit little-endian pairs, top bit cleared
    enc = encoded.copy()
    enc[31] &= 0x7F
    y_limbs = np.zeros((16, n), dtype=np.uint32)
    for i in range(16):
        y_limbs[i] = enc[2 * i].astype(np.uint32) | (enc[2 * i + 1].astype(np.uint32) << 8)
    return _decompress_device(jnp.asarray(y_limbs), jnp.asarray(sign))


@jax.jit
def _decompress_device(y, sign):
    n = y.shape[1]
    one = f.full(n, 1)
    y2 = f.mul(y, y)
    u = f.sub(y2, one)  # y^2 - 1
    v = f.add(f.mul(f.full(n, D), y2), one)  # d y^2 + 1
    x2 = f.mul(u, f.inv(v))
    x = f.pow_static(x2, (Q + 3) // 8)
    x_sq = f.mul(x, x)
    needs_sqrtm1 = ~f.eq(x_sq, x2)
    x_alt = f.mul(x, f.full(n, SQRT_M1))
    x = f.select(needs_sqrtm1, x_alt, x)
    valid = f.eq(f.mul(x, x), x2)
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


def encode_points_host(raw: list[bytes]) -> np.ndarray:
    """list of 32-byte encodings -> (32, N) uint8."""
    return np.frombuffer(b"".join(raw), dtype=np.uint8).reshape(-1, 32).T.copy()


def to_affine_ints(p: Point) -> list[tuple[int, int]]:
    """Host-side: canonical (x, y) pairs for comparison with the golden model."""
    zinv = f.inv(p[2])
    x = f.to_int(f.canonicalize(f.mul(p[0], zinv)))
    y = f.to_int(f.canonicalize(f.mul(p[1], zinv)))
    return list(zip(x, y))
