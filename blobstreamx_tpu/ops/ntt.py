"""Radix-2 Goldilocks NTT / LDE on TPU (component C2, SURVEY.md §2.2;
primary metric "butterflies/s/chip", /root/repo/BASELINE.json:2).

Layout & algorithm
------------------
Polynomials live column-wise: a batch is a Gl pair of shape ``(n, C)`` —
coefficient index on axis 0, column on the lane axis. A DIT butterfly stage is
then a pure reshape + broadcast elementwise pass over the whole array:

    (n, C) -> (n/2h, 2, h, C);  hi *= w_s^k;  out = [lo+hi, lo-hi]

No gathers, no transposes, no strided lane access — every stage is VPU-dense
and XLA fuses the twiddle multiply into the butterfly. The only gather is the
initial bit-reversal row permutation (one pass).

For a single giant polynomial (config 4: 2^22), the four-step factorization
n = n1*n2 reshapes to an (n1, n2) matrix so both local transforms run along
axis 0 (sublanes) with the batch on lanes:

    A: column NTTs (length n1)      B: twiddle w^(k1*i2)
    C: transpose, column NTTs (length n2); row-major result is natural order.

The multi-chip six-step variant (all_to_all transpose over ICI) lives in
blobstreamx_tpu.parallel.ntt.

Golden oracle: blobstreamx_tpu.golden.ntt (natural order in/out, same
root-of-unity convention).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl, gl_add, gl_mul, gl_sub
from blobstreamx_tpu.golden import goldilocks as gold

P = gold.P


# ----------------------------------------------------------------------------
# host-side twiddle tables (cached per size)
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def power_table(log_n: int, inverse: bool = False) -> np.ndarray:
    """np.uint64 table [w^0, w^1, ..., w^(n/2 - 1)] for w = root_of_unity(log_n)."""
    n = 1 << log_n
    w = gold.root_of_unity(log_n)
    if inverse:
        w = gold.inv(w)
    out = np.empty(max(n // 2, 1), dtype=np.uint64)
    cur = 1
    for i in range(out.shape[0]):
        out[i] = cur
        cur = (cur * w) % P
    return out


@lru_cache(maxsize=None)
def shift_table(log_n: int, shift: int, inverse: bool = False) -> np.ndarray:
    """np.uint64 table [s^0 .. s^(n-1)] (s^-i for inverse)."""
    n = 1 << log_n
    s = gold.inv(shift) if inverse else shift % P
    out = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        out[i] = cur
        cur = (cur * s) % P
    return out


@lru_cache(maxsize=None)
def bitrev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


# ----------------------------------------------------------------------------
# core transform
# ----------------------------------------------------------------------------


def _apply_stages(x: Gl, log_n: int, inverse: bool) -> Gl:
    """All DIT butterfly stages on bit-reversed input, (n, C) layout."""
    n = 1 << log_n
    full = power_table(log_n, inverse)  # w^k, k < n/2
    lo, hi = x
    c = lo.shape[1]
    for s in range(log_n):
        half = 1 << s
        stride = 1 << (log_n - 1 - s)
        tw = gf64.from_u64(full[::stride][:half])  # (half,)
        tw = (tw[0][None, :, None], tw[1][None, :, None])  # (1, half, 1)
        shaped = lambda a: a.reshape(n // (2 * half), 2, half, c)
        l4, h4 = shaped(lo), shaped(hi)
        x0 = (l4[:, 0], h4[:, 0])
        x1 = (l4[:, 1], h4[:, 1])
        t = gl_mul(x1, tw)
        e = gl_add(x0, t)
        o = gl_sub(x0, t)
        lo = jnp.stack([e[0], o[0]], axis=1).reshape(n, c)
        hi = jnp.stack([e[1], o[1]], axis=1).reshape(n, c)
    return lo, hi


def ntt_cols(x: Gl, inverse: bool = False) -> Gl:
    """Forward/inverse NTT along axis 0 of an (n, C) batch, natural in/out."""
    n = x[0].shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    rev = jnp.asarray(bitrev_indices(log_n))
    x = (jnp.take(x[0], rev, axis=0), jnp.take(x[1], rev, axis=0))
    out = _apply_stages(x, log_n, inverse)
    if inverse:
        n_inv = gf64.from_u64(np.array([gold.inv(n % P)], dtype=np.uint64))
        out = gl_mul(out, (n_inv[0][None, :], n_inv[1][None, :]))
    return out


def coset_scale(x: Gl, shift: int, inverse: bool = False) -> Gl:
    """Multiply row i by shift^i (shift^-i when inverse)."""
    n = x[0].shape[0]
    log_n = n.bit_length() - 1
    tab = gf64.from_u64(shift_table(log_n, shift, inverse))
    return gl_mul(x, (tab[0][:, None], tab[1][:, None]))


def coset_ntt_cols(x: Gl, shift: int = gold.COSET_SHIFT) -> Gl:
    return ntt_cols(coset_scale(x, shift))


def coset_intt_cols(x: Gl, shift: int = gold.COSET_SHIFT) -> Gl:
    return coset_scale(ntt_cols(x, inverse=True), shift, inverse=True)


def lde_cols(coeffs: Gl, rate_bits: int, shift: int = gold.COSET_SHIFT) -> Gl:
    """Low-degree extension: zero-pad rows x 2^rate_bits, coset-evaluate."""
    n, c = coeffs[0].shape
    pad = n * ((1 << rate_bits) - 1)
    z = jnp.zeros((pad, c), jnp.uint32)
    padded = (
        jnp.concatenate([coeffs[0], z], axis=0),
        jnp.concatenate([coeffs[1], z], axis=0),
    )
    return coset_ntt_cols(padded, shift)


# ----------------------------------------------------------------------------
# four-step single-polynomial NTT (big n; basis of the multi-chip six-step)
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _four_step_twiddles(log_n: int, inverse: bool) -> np.ndarray:
    """W[k1, i2] = w^(±k1*i2) as an (n1, n2) uint64 matrix (host, cached)."""
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2
    n = 1 << log_n
    w = gold.root_of_unity(log_n)
    if inverse:
        w = gold.inv(w)
    # full power table of length n via repeated numpy doubling on python ints
    # (n up to 2^22: a few seconds once, cached)
    tab = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        tab[i] = cur
        cur = (cur * w) % P
    k1 = np.arange(n1, dtype=np.uint64)[:, None]
    i2 = np.arange(n2, dtype=np.uint64)[None, :]
    idx = (k1 * i2) & np.uint64(n - 1)  # mod n (power of two)
    return tab[idx]


def ntt_four_step(x: Gl, inverse: bool = False) -> Gl:
    """NTT of a single length-n polynomial, n = n1*n2, natural in/out.

    x: Gl of shape (n,). Internally reshaped (n1, n2); both local transforms
    run along axis 0 with lanes fully occupied.
    """
    n = x[0].shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_n1 = log_n // 2
    log_n2 = log_n - log_n1
    n1, n2 = 1 << log_n1, 1 << log_n2

    mat = (x[0].reshape(n1, n2), x[1].reshape(n1, n2))
    # A: column NTTs of length n1 (i1 axis)
    mat = ntt_cols(mat, inverse)
    if inverse:
        # ntt_cols already scaled by n1^-1; remaining n2^-1 applied at the end
        pass
    # B: twiddle by w^(k1*i2)
    tw = gf64.from_u64(_four_step_twiddles(log_n, inverse))
    mat = gl_mul(mat, tw)
    # C: transpose, column NTTs of length n2
    mat = (mat[0].T, mat[1].T)
    mat = ntt_cols(mat, inverse)
    # row-major flatten of the (n2, n1) result is natural order (k = k1 + n1*k2
    # at position [k2, k1])
    out = (mat[0].reshape(n), mat[1].reshape(n))
    return out


def butterfly_count(log_n: int) -> int:
    """Total radix-2 butterflies in one length-2^log_n transform."""
    return (1 << (log_n - 1)) * log_n
