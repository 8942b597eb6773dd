"""GF(2^255 - 19) arithmetic on TPU for Ed25519 batch verification
(component C6, SURVEY.md §2.2; config 3 at /root/repo/BASELINE.json:9).

Representation: a field element batch is a single uint32 array of shape
``(16, N)`` — sixteen 16-bit limbs (little-endian) per lane, value < 2^256.
Values are *semi-reduced* (< 2^256, possibly >= p) through arithmetic;
``canonicalize`` produces the unique representative < p for encoding and
equality.

Multiplication: one (16,16,N) tensor product of exact 16x16->32 partials,
anti-diagonal accumulation into 16-bit columns (max column sum < 2^21), and a
fold of the 512-bit product with 2^256 ≡ 38 (mod p).

Trace-size discipline: carry propagation runs under lax.scan over the limb
axis, so one field mul traces to ~10^2 HLO ops instead of ~10^3 — the
Pippenger MSM inlines hundreds of muls, and XLA compile time scales with
trace size (a naive unrolled version took minutes to compile).

Golden oracle: python bigints (tests) + blobstreamx_tpu.golden.ed25519.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Q = (1 << 255) - 19
MASK16 = np.uint32(0xFFFF)
NLIMB = 16

_Q_LIMBS = np.array([(Q >> (16 * i)) & 0xFFFF for i in range(NLIMB)], dtype=np.uint32)


# ----------------------------------------------------------------------------
# encode / decode (host)
# ----------------------------------------------------------------------------


def from_int(values) -> jnp.ndarray:
    if isinstance(values, int):
        values = [values]
    n = len(values)
    out = np.zeros((NLIMB, n), dtype=np.uint32)
    for j, v in enumerate(values):
        for i in range(NLIMB):
            out[i, j] = (v >> (16 * i)) & 0xFFFF
    return jnp.asarray(out)


def to_int(x) -> list[int]:
    arr = np.asarray(x)
    out = []
    for j in range(arr.shape[1]):
        v = 0
        for i in range(NLIMB):
            v |= int(arr[i, j]) << (16 * i)
        out.append(v)
    return out


def zeros(n: int) -> jnp.ndarray:
    return jnp.zeros((NLIMB, n), jnp.uint32)


def full(n: int, value: int) -> jnp.ndarray:
    value %= 1 << 256
    col = np.array([(value >> (16 * i)) & 0xFFFF for i in range(NLIMB)], dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(col)[:, None], (NLIMB, n))


# ----------------------------------------------------------------------------
# scan-based carry machinery (small traces)
# ----------------------------------------------------------------------------


# Carry-chain lowering: UNROLLED by default. The lax.scan form keeps traces
# tiny but lowers to a While loop; a field mul needs 4 carry chains, and the
# hot consumers nest them inside OUTER scans (pow_static's 255-step square-
# and-multiply, the MSM's bucket scans) — nested While loops cost ~10-100x
# their body on TPU (profiled: the single-lane window combine ran ~290 point
# ops in 342 ms). Unrolling the static 16-33 steps roughly doubles the mul
# trace (~350 HLO) and removes every inner While. Set BSX_GF25519_SCAN=1 to
# restore the scan form (compile-time escape hatch for huge traces).
import os as _os

_UNROLL = _os.environ.get("BSX_GF25519_SCAN", "") != "1"


def _propagate_scan(cols):
    """cols: (K, N) u32 columns (< 2^32) -> (words (K, N) < 2^16, carry (N,))."""
    if _UNROLL:
        carry = jnp.zeros_like(cols[0])
        outs = []
        for i in range(cols.shape[0]):
            tot = cols[i] + carry
            outs.append(tot & MASK16)
            carry = tot >> 16
        return jnp.stack(outs), carry

    def step(carry, col):
        tot = col + carry
        return tot >> 16, tot & MASK16

    carry, words = jax.lax.scan(step, jnp.zeros_like(cols[0]), cols)
    return words, carry


def _add_at0(cols, v):
    """cols with v added into row 0 — expressed as concat, not .at[].add
    (scatter-add has no Pallas TPU lowering; these run inside kernels)."""
    return jnp.concatenate([cols[0:1] + v[None], cols[1:]], axis=0)


def _fold_overflow(words, over):
    """(words (16,N) < 2^16) + over*2^256 mod p, semi-reduced < 2^256.

    over may be up to ~2^27; 38*over < 2^33 lands in columns 0 and 1. The
    carries of the fold itself are re-folded twice: after the first re-fold
    the value is < 2^256 + 38, and when that carries again the残 value is
    < 38, so the final add cannot carry — all limbs end strictly < 2^16."""
    add = over * jnp.uint32(38)
    cols = jnp.concatenate(
        [words[0:1] + (add & MASK16)[None], words[1:2] + (add >> 16)[None], words[2:]],
        axis=0,
    )
    words2, c1 = _propagate_scan(cols)
    words3, c2 = _propagate_scan(_add_at0(words2, c1 * jnp.uint32(38)))
    return _add_at0(words3, c2 * jnp.uint32(38))


# ----------------------------------------------------------------------------
# field ops
# ----------------------------------------------------------------------------


def add(a, b):
    words, over = _propagate_scan(a + b)
    return _fold_overflow(words, over)


_FOURP_LO = np.array(
    [((((1 << 257) - 76) - (1 << 256)) >> (16 * i)) & 0xFFFF for i in range(NLIMB)],
    dtype=np.uint32,
)


def sub(a, b):
    """a - b via a + (4p - 2^256) + (2^256 - b), all columns nonnegative."""
    cols = a + jnp.asarray(_FOURP_LO)[:, None] + (MASK16 - b)
    cols = _add_at0(cols, jnp.ones_like(cols[0]))
    words, over = _propagate_scan(cols)
    return _fold_overflow(words, over)


def neg(a):
    return sub(jnp.zeros_like(a), a)


def mul(a, b):
    # exact partial products: (16, 16, N); p[i, j] = a[i] * b[j]
    p = a[:, None, :] * b[None, :, :]
    plo = p & MASK16
    phi = p >> 16
    n = a.shape[1]
    # anti-diagonal accumulation via zero-padded adds (not .at[slice].add —
    # scatter-add has no Pallas TPU lowering and pads fuse identically)
    cols = jnp.zeros((2 * NLIMB + 1, n), jnp.uint32)
    for i in range(NLIMB):
        cols = cols + jnp.pad(plo[i], ((i, NLIMB + 1 - i), (0, 0)))
        cols = cols + jnp.pad(phi[i], ((i + 1, NLIMB - i), (0, 0)))
    words, _carry = _propagate_scan(cols)  # carry provably 0 (< 2^512)
    # fold hi (words[16..32]) * 38 into lo; words[32] == 0 but kept for shape
    hi = words[NLIMB : 2 * NLIMB]
    ph = hi * jnp.uint32(38)
    cols2 = words[:NLIMB]
    cols2 = cols2 + (ph & MASK16)
    cols2 = cols2 + jnp.pad((ph >> 16)[0 : NLIMB - 1], ((1, 0), (0, 0)))
    over_hi = ph[NLIMB - 1] >> 16  # weight 2^256
    words2, carry = _propagate_scan(cols2)
    return _fold_overflow(words2, carry + over_hi)


def mul_small(a, k: int):
    assert 0 < k < (1 << 15)
    words, over = _propagate_scan(a * jnp.uint32(k))
    return _fold_overflow(words, over)


def canonicalize(x):
    """Unique representative < p (subtract p up to two times, branchless)."""
    q = jnp.asarray(_Q_LIMBS)[:, None]
    out = x
    for _ in range(2):
        if _UNROLL:
            borrow = jnp.zeros_like(out[0])
            diffs = []
            for i in range(NLIMB):
                d = out[i] - q[i] - borrow
                diffs.append(d & MASK16)
                borrow = (d >> 31) & 1
            diff = jnp.stack(diffs)
        else:

            def step(borrow, cols):
                xi, qi = cols
                d = xi - qi - borrow
                return (d >> 31) & 1, d & MASK16

            borrow, diff = jax.lax.scan(
                step, jnp.zeros_like(out[0]), (out, jnp.broadcast_to(q, out.shape))
            )
        ge = borrow == 0
        out = jnp.where(ge[None, :], diff, out)
    return out


def eq(a, b):
    return jnp.all(canonicalize(a) == canonicalize(b), axis=0)


def is_zero(a):
    return jnp.all(canonicalize(a) == 0, axis=0)


def select(mask, a, b):
    return jnp.where(mask[None, :], a, b)


def pow_static(a, e: int):
    bits = jnp.array([(e >> i) & 1 for i in range(max(e.bit_length(), 1))], jnp.bool_)

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit, mul(result, base), result)
        return (result, mul(base, base)), None

    init = (full(a.shape[1], 1), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


def _sqn_kernel(k: int):
    def kernel(in_ref, out_ref):
        out_ref[:] = jax.lax.fori_loop(0, k, lambda _, x: mul(x, x), in_ref[:])

    return kernel


from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=None)
def _sqn_call(n: int, k: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((NLIMB, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sqn_kernel(k),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMB, n), jnp.uint32),
    )


def sqn(a, k: int):
    """a^(2^k): k squarings in ONE kernel. On TPU with a tileable lane count
    the whole run executes as a single Pallas program (every intermediate in
    VMEM — the ~250-squaring decompress chains were HBM/launch bound through
    XLA); otherwise a fori_loop with the same 1-mul body."""
    n = a.shape[1]
    if jax.default_backend() == "tpu" and n % 128 == 0 and n <= 4096 and k > 1:
        return _sqn_call(n, k)(a)
    return jax.lax.fori_loop(0, k, lambda _, x: mul(x, x), a)


def _chain_250(z):
    """z^(2^250 - 1) by the classic curve25519 addition chain, plus the
    intermediates (z9, z11, z_50 = z^(2^50-1)) later steps reuse."""
    z2 = mul(z, z)
    z9 = mul(sqn(z2, 2), z)  # z^9
    z11 = mul(z9, z2)  # z^11
    z_5 = mul(mul(z11, z11), z9)  # z^(2^5 - 1)
    z_10 = mul(sqn(z_5, 5), z_5)  # z^(2^10 - 1)
    z_20 = mul(sqn(z_10, 10), z_10)
    z_40 = mul(sqn(z_20, 20), z_20)
    z_50 = mul(sqn(z_40, 10), z_10)
    z_100 = mul(sqn(z_50, 50), z_50)
    z_200 = mul(sqn(z_100, 100), z_100)
    z_250 = mul(sqn(z_200, 50), z_50)
    return z_250, z9, z11, z_50


def _pow22523_kernel(z_ref, out_ref):
    # the whole ~254-mul chain as ONE program: every intermediate in VMEM,
    # one launch (the sqn-per-segment version paid ~12 kernel launches of
    # tunnel/dispatch latency per decompress). fori_loop bodies trace once,
    # so the kernel stays ~15k ops.
    z = z_ref[:]

    def S(x, k):
        return jax.lax.fori_loop(0, k, lambda _, v: mul(v, v), x)

    z2 = mul(z, z)
    z9 = mul(S(z2, 2), z)
    z11 = mul(z9, z2)
    z_5 = mul(mul(z11, z11), z9)
    z_10 = mul(S(z_5, 5), z_5)
    z_20 = mul(S(z_10, 10), z_10)
    z_40 = mul(S(z_20, 20), z_20)
    z_50 = mul(S(z_40, 10), z_10)
    z_100 = mul(S(z_50, 50), z_50)
    z_200 = mul(S(z_100, 100), z_100)
    z_250 = mul(S(z_200, 50), z_50)
    out_ref[:] = mul(S(z_250, 2), z)


@_lru_cache(maxsize=None)
def _pow22523_call(n: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec((NLIMB, n), lambda: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pow22523_kernel,
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NLIMB, n), jnp.uint32),
    )


def pow22523(z):
    """z^(2^252 - 3) = z^((q-5)/8) — the square-root chain (~254 muls,
    half of pow_static's ~505 for the same exponent); one fused kernel on
    TPU for tileable lane counts."""
    n = z.shape[1]
    if jax.default_backend() == "tpu" and n % 128 == 0 and n <= 4096:
        return _pow22523_call(n)(z)
    z_250, _z9, _z11, _z50 = _chain_250(z)
    return mul(sqn(z_250, 2), z)


def inv(a):
    """a^(q-2) = a^(2^255 - 21) by the addition chain (~254 muls)."""
    z_250, _z9, z11, _z50 = _chain_250(a)
    return mul(sqn(z_250, 5), z11)
