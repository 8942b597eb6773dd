"""Goldilocks field arithmetic on TPU: u32-pair limb representation.

TPU vector units are 32-bit (no native u64), so a field element x < 2^64 is a
pair of uint32 arrays ``(lo, hi)`` with x = hi*2^32 + lo. All functions here
are *pure jnp* on uint32 — shape-polymorphic, usable identically

  - inside Pallas kernel bodies (on values loaded from VMEM refs), and
  - in plain jitted XLA code (where the elementwise chains fuse on the VPU),

which is how the NTT/Poseidon/FRI kernels share one audited implementation
(SURVEY.md §7.2 item 1: this module's correctness gates everything above it).

Reduction exploits p = 2^64 - 2^32 + 1:
    2^64 ≡ EPS := 2^32 - 1 (mod p),     2^96 ≡ -1 (mod p).

Canonicality invariant: every exported op takes and returns canonical values
in [0, p). Bit-exactness (/root/repo/BASELINE.json:5) forbids lazy
non-canonical forms leaking into digests, so we pay the one compare-subtract
per op; multiplications dominate cost regardless.

Golden oracle: blobstreamx_tpu.golden.goldilocks (pure Python, no shared code).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

P = (1 << 64) - (1 << 32) + 1
P_LO = np.uint32(1)
P_HI = np.uint32(0xFFFFFFFF)
EPS = np.uint32(0xFFFFFFFF)  # 2^32 - 1 ≡ 2^64 (mod p)
MASK16 = np.uint32(0xFFFF)

# A Goldilocks array is a tuple (lo, hi) of equal-shape uint32 arrays.
Gl = tuple


def _u32(x):
    return jnp.asarray(x, jnp.uint32)


# ----------------------------------------------------------------------------
# encode / decode (host side, for tests and fixture loading)
# ----------------------------------------------------------------------------


def from_u64(values) -> Gl:
    """numpy array (or list of ints) of canonical values -> (lo, hi) u32 pair."""
    v = np.asarray(values, dtype=np.uint64)
    return _u32(v & np.uint64(0xFFFFFFFF)), _u32(v >> np.uint64(32))


def to_u64(x: Gl) -> np.ndarray:
    # NB: np.asarray(jax_array, dtype=...) takes a pathologically slow
    # per-element path; copy to host first, then cast.
    lo = np.asarray(x[0]).astype(np.uint64)
    hi = np.asarray(x[1]).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def zeros(shape) -> Gl:
    return jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32)


def full(shape, value: int) -> Gl:
    value %= P
    return (
        jnp.full(shape, np.uint32(value & 0xFFFFFFFF), jnp.uint32),
        jnp.full(shape, np.uint32(value >> 32), jnp.uint32),
    )


# ----------------------------------------------------------------------------
# 64-bit helpers on u32 pairs
# ----------------------------------------------------------------------------


def _add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out (0/1 u32)."""
    lo = alo + blo
    c0 = (lo < alo).astype(jnp.uint32)
    t = ahi + bhi
    c1 = (t < ahi).astype(jnp.uint32)
    hi = t + c0
    c2 = (hi < c0).astype(jnp.uint32)  # hi wrapped when adding the carry
    return lo, hi, c1 | c2


def _sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out (0/1 u32)."""
    lo = alo - blo
    b0 = (alo < blo).astype(jnp.uint32)
    t = ahi - bhi
    b1 = (ahi < bhi).astype(jnp.uint32)
    hi = t - b0
    b2 = (t < b0).astype(jnp.uint32)
    return lo, hi, b1 | b2


def _add64_small(lo, hi, small):
    """(x + small) mod 2^64, small < 2^32, with carry-out."""
    nlo = lo + small
    c = (nlo < lo).astype(jnp.uint32)
    nhi = hi + c
    c2 = (nhi < c).astype(jnp.uint32)
    return nlo, nhi, c2


def _canonicalize(lo, hi):
    """Subtract p once if value >= p. Input < 2^64."""
    ge = (hi == P_HI) & (lo >= P_LO)
    lo = jnp.where(ge, lo - P_LO, lo)
    hi = jnp.where(ge, hi - P_HI, hi)
    return lo, hi


def _reduce_carry(lo, hi, carry):
    """Fold a 2^64 carry bit: x + carry*2^64 ≡ x + carry*EPS (mod p)."""
    lo2, hi2, c2 = _add64_small(lo, hi, carry * EPS)
    # second fold: c2 implies the wrapped 64-bit value is < EPS (so hi2 == 0),
    # but lo2 + EPS may still wrap the u32 lane — propagate that carry.
    add = c2 * EPS
    lo3 = lo2 + add
    c3 = (lo3 < add).astype(jnp.uint32)
    hi3 = hi2 + c3
    return lo3, hi3


# ----------------------------------------------------------------------------
# field ops
# ----------------------------------------------------------------------------


def gl_add(a: Gl, b: Gl) -> Gl:
    lo, hi, c = _add64(a[0], a[1], b[0], b[1])
    lo, hi = _reduce_carry(lo, hi, c)
    return _canonicalize(lo, hi)


def gl_sub(a: Gl, b: Gl) -> Gl:
    lo, hi, borrow = _sub64(a[0], a[1], b[0], b[1])
    # x - borrow*2^64 ≡ x - borrow*EPS; a,b canonical so at most one correction,
    # and (value after wrap) > 2^64 - 2^32 >= EPS, so no second borrow.
    blo = borrow * EPS
    nlo = lo - blo
    b0 = (lo < blo).astype(jnp.uint32)
    nhi = hi - b0
    return _canonicalize(nlo, nhi)


def gl_neg(a: Gl) -> Gl:
    is_zero = (a[0] == 0) & (a[1] == 0)
    lo = jnp.where(is_zero, jnp.uint32(0), P_LO - a[0])
    borrow = ((P_LO < a[0]) & ~is_zero).astype(jnp.uint32)
    hi = jnp.where(is_zero, jnp.uint32(0), P_HI - a[1] - borrow)
    return lo, hi


def _mul_wide(a: Gl, b: Gl):
    """64x64 -> 128-bit product as four u32 words (n0..n3, little-endian)."""
    a0, a1 = a[0] & MASK16, a[0] >> 16
    a2, a3 = a[1] & MASK16, a[1] >> 16
    b0, b1 = b[0] & MASK16, b[0] >> 16
    b2, b3 = b[1] & MASK16, b[1] >> 16
    al = (a0, a1, a2, a3)
    bl = (b0, b1, b2, b3)

    # 16-bit column accumulation: col[k] collects low halves of products with
    # i+j == k and high halves with i+j == k-1. Max 7 terms of < 2^16 plus a
    # propagated carry < 2^16: comfortably < 2^32.
    prods = [[al[i] * bl[j] for j in range(4)] for i in range(4)]
    cols = []
    for k in range(8):
        acc = jnp.zeros_like(a[0])
        for i in range(4):
            j = k - i
            if 0 <= j < 4:
                acc = acc + (prods[i][j] & MASK16)
            j = k - 1 - i
            if 0 <= j < 4:
                acc = acc + (prods[i][j] >> 16)
        cols.append(acc)

    words = []
    carry = jnp.zeros_like(a[0])
    for k in range(8):
        tot = cols[k] + carry
        words.append(tot & MASK16)
        carry = tot >> 16
    # carry out of column 7 is impossible: the product fits in 128 bits.
    n0 = words[0] | (words[1] << 16)
    n1 = words[2] | (words[3] << 16)
    n2 = words[4] | (words[5] << 16)
    n3 = words[6] | (words[7] << 16)
    return n0, n1, n2, n3


def _reduce128(n0, n1, n2, n3) -> Gl:
    """Reduce n0 + n1*2^32 + n2*2^64 + n3*2^96 mod p.

    x ≡ lo64 + n2*EPS - n3 (mod p) since 2^64 ≡ EPS and 2^96 ≡ -1.
    """
    # step 1: s = lo64 - n3 (n3 < 2^32, so at most one EPS correction,
    # which cannot borrow again: after a wrap the value exceeds 2^64 - 2^32).
    lo = n0 - n3
    b0 = (n0 < n3).astype(jnp.uint32)
    hi = n1 - b0
    borrow = (n1 < b0).astype(jnp.uint32)
    blo = borrow * EPS
    b1 = (lo < blo).astype(jnp.uint32)
    lo = lo - blo
    hi = hi - b1

    # step 2: add n2 * EPS = (n2 << 32) - n2  as a 64-bit quantity.
    tlo = jnp.uint32(0) - n2  # low word of n2*EPS
    # borrow from the subtraction (n2<<32) - n2 affects the high word:
    thi = n2 - (n2 != 0).astype(jnp.uint32)
    lo, hi, c = _add64(lo, hi, tlo, thi)
    lo, hi = _reduce_carry(lo, hi, c)
    return _canonicalize(lo, hi)


def gl_mul(a: Gl, b: Gl) -> Gl:
    return _reduce128(*_mul_wide(a, b))


def gl_square(a: Gl) -> Gl:
    return gl_mul(a, a)


def gl_mul_pow2(a: Gl, k: int) -> Gl:
    """a * 2^k mod p for static 0 <= k < 32 (fast path for Poseidon MDS)."""
    assert 0 <= k < 32
    if k == 0:
        return _canonicalize(a[0], a[1])
    # (hi,lo) << k produces a (64+k)-bit value; the top k bits t satisfy
    # t*2^64 ≡ t*EPS.
    t = a[1] >> (32 - k)
    hi = (a[1] << k) | (a[0] >> (32 - k))
    lo = a[0] << k
    # add t*EPS = (t<<32) - t
    tlo = jnp.uint32(0) - t
    thi = t - (t != 0).astype(jnp.uint32)
    lo, hi, c = _add64(lo, hi, tlo, thi)
    lo, hi = _reduce_carry(lo, hi, c)
    return _canonicalize(lo, hi)


def gl_pow(a: Gl, e: int) -> Gl:
    """a^e for a static Python-int exponent.

    Square-and-multiply as a lax.scan over the exponent bits: the compiled
    body is one conditional mul + one square, so compile time stays O(1) in
    the exponent size (a fully unrolled p-2 chain takes ~15 s to compile).
    For tiny exponents (< 16) the chain is unrolled instead — that is the
    Poseidon x^7 hot path.
    """
    import jax

    assert e >= 0
    if e < 16:
        result = full(jnp.shape(a[0]), 1)
        base = a
        while e:
            if e & 1:
                result = gl_mul(result, base)
            if e > 1:
                base = gl_square(base)
            e >>= 1
        return result

    bits = jnp.array([(e >> i) & 1 for i in range(e.bit_length())], dtype=jnp.bool_)

    def body(carry, bit):
        result, base = carry
        result = gl_select(bit, gl_mul(result, base), result)
        return (result, gl_square(base)), None

    init = (full(jnp.shape(a[0]), 1), a)
    (result, _), _ = jax.lax.scan(body, init, bits)
    return result


def gl_inv(a: Gl) -> Gl:
    """Fermat inversion a^(p-2); maps 0 -> 0 (caller's responsibility).

    Unrolled addition chain (64 squarings + 8 multiplies), NOT gl_pow's
    scan: a lax.scan carry inside an SPMD-partitioned program defeats
    sharding propagation — the partitioner chose conflicting shardings for
    the (result, base) carry and fell back to involuntary full
    rematerialization (the round-4 MULTICHIP warnings, VERDICT r4 #5). The
    straight-line chain gives the propagator one unbroken elementwise
    graph, and drops the scan's 64 conditional multiplies to 8 real ones.

    p - 2 = 0xFFFFFFFE_FFFFFFFF = (2^31 - 1)·2^33 + (2^32 - 1).

    The repeated-squaring runs sit in lax.scan blocks (single-Gl carry,
    square-only body): a fully unrolled 64-deep chain runs in time
    EXPONENTIAL in depth on XLA:CPU — the loop-fusion emitter re-evaluates
    shared operands per use (measured: 0.8 ms at depth 16, 202 ms at 32,
    unbounded at 64; optimization_barrier does not stop it). A scan body
    compiles once and executes k times — linear on every backend — and a
    single-tensor carry avoids gl_pow's (result, base) tuple carry, whose
    packed representation the SPMD partitioner could not shard (the
    round-4 involuntary-full-rematerialization MULTICHIP warnings).
    """
    import jax

    def sq_k(x: Gl, k: int) -> Gl:
        if k <= 2:
            for _ in range(k):
                x = gl_square(x)
            return x

        def body(c, _):
            return gl_square(c), None

        y, _ = jax.lax.scan(body, x, None, length=k)
        return y

    t2 = gl_mul(gl_square(a), a)            # a^(2^2 - 1)
    t3 = gl_mul(gl_square(t2), a)           # a^(2^3 - 1)
    t6 = gl_mul(sq_k(t3, 3), t3)            # a^(2^6 - 1)
    t12 = gl_mul(sq_k(t6, 6), t6)           # a^(2^12 - 1)
    t24 = gl_mul(sq_k(t12, 12), t12)        # a^(2^24 - 1)
    t30 = gl_mul(sq_k(t24, 6), t6)          # a^(2^30 - 1)
    t31 = gl_mul(gl_square(t30), a)         # a^(2^31 - 1)
    t32 = gl_mul(gl_square(t31), a)         # a^(2^32 - 1)
    return gl_mul(sq_k(t31, 33), t32)       # a^((2^31-1)·2^33 + 2^32 - 1)


def gl_select(mask, a: Gl, b: Gl) -> Gl:
    return jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1])


def gl_eq(a: Gl, b: Gl):
    return (a[0] == b[0]) & (a[1] == b[1])


# ----------------------------------------------------------------------------
# GF(p^2) = GF(p)[X]/(X^2 - 7): elements are pairs (c0, c1) of Gl arrays.
# Used for FRI soundness amplification (challenges in the extension field).
# ----------------------------------------------------------------------------

EXT_W = 7


def ext_add(a, b):
    return gl_add(a[0], b[0]), gl_add(a[1], b[1])


def ext_sub(a, b):
    return gl_sub(a[0], b[0]), gl_sub(a[1], b[1])


def ext_mul(a, b):
    w = full(jnp.shape(a[0][0]), EXT_W)
    c0 = gl_add(gl_mul(a[0], b[0]), gl_mul(w, gl_mul(a[1], b[1])))
    c1 = gl_add(gl_mul(a[0], b[1]), gl_mul(a[1], b[0]))
    return c0, c1


def ext_square(a):
    return ext_mul(a, a)


def ext_zeros(shape):
    return zeros(shape), zeros(shape)


def ext_full(shape, v: tuple[int, int]):
    return full(shape, v[0]), full(shape, v[1])


def ext_scale(base: Gl, k: tuple[int, int]):
    """Multiply a base-field array by a static ext constant: (k0*b, k1*b)."""
    shape = jnp.shape(base[0])
    return gl_mul(base, full(shape, k[0])), gl_mul(base, full(shape, k[1]))


def ext_scale_ext(a, k: tuple[int, int]):
    """Multiply an ext array by a static ext constant."""
    return ext_mul(a, ext_full(jnp.shape(a[0][0]), k))


def ext_from_base(base: Gl):
    return base, zeros(jnp.shape(base[0]))


def ext_neg(a):
    return gl_neg(a[0]), gl_neg(a[1])


def ext_inv(a):
    """Batched ext inverse: conj(a) / norm(a), norm = c0^2 - W*c1^2 (one
    base-field Fermat inversion per lane, fully vectorized)."""
    w = full(jnp.shape(a[0][0]), EXT_W)
    norm = gl_sub(gl_square(a[0]), gl_mul(w, gl_square(a[1])))
    ninv = gl_inv(norm)
    return gl_mul(a[0], ninv), gl_mul(gl_neg(a[1]), ninv)


def ext_select(mask, a, b):
    return gl_select(mask, a[0], b[0]), gl_select(mask, a[1], b[1])
