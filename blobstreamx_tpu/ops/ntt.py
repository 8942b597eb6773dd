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


# ----------------------------------------------------------------------------
# roll-formulated stages + fused Pallas kernel (all stages on one VMEM tile)
# ----------------------------------------------------------------------------
#
# The reshape/stack stage above materializes the array between stages (~2 HBM
# round trips per stage). The roll formulation below uses only full-width 2D
# elementwise ops + a circular shift, so a Pallas kernel can run EVERY stage
# on a VMEM-resident column tile: one HBM read + one write for the whole
# transform. Per stage, for pair distance h = 2^s (DIT, bit-reversed input):
#
#   t  = x * TW[s]        TW = twiddle at odd slots, 1 at even slots
#   y  = where(even_slot,  x + roll(t, -h),  roll(x, +h) - t)
#
#   even slot i0:  x[i0] + w*x[i0+h]     odd slot i1:  x[i1-h] - w*x[i1]


@lru_cache(maxsize=None)
def _stage_tw_table(log_n: int, inverse: bool) -> np.ndarray:
    """(log_n, n) uint64: TW[s][i] = w^((i mod 2^s) * n/2^{s+1}) when bit s of
    i is set, else 1 (the even slot's no-op multiplier)."""
    n = 1 << log_n
    full = power_table(log_n, inverse)  # w^k, k < n/2
    out = np.ones((log_n, n), dtype=np.uint64)
    idx = np.arange(n)
    for s in range(log_n):
        h = 1 << s
        stride = n >> (s + 1)
        odd = (idx >> s) & 1 == 1
        out[s, odd] = full[(idx[odd] % h) * stride]
    return out


@lru_cache(maxsize=None)
def _stage_even_mask(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n)
    return np.stack([((idx >> s) & 1) == 0 for s in range(log_n)])


def _roll_stages(x: Gl, log_n: int, tw: Gl, masks, roll_fn) -> Gl:
    """All butterfly stages in the roll formulation; x is (n, C) bit-reversed.
    tw: (log_n, n) Gl twiddle table; masks: (log_n, n) uint32 even-slot mask.
    roll_fn(arr, shift) rolls along axis 0 (jnp.roll outside Pallas,
    pltpu.roll inside)."""
    tw_lo, tw_hi = tw
    lo, hi = x
    for s in range(log_n):
        h = 1 << s
        t = gl_mul((lo, hi), (tw_lo[s][:, None], tw_hi[s][:, None]))
        td = (roll_fn(t[0], -h), roll_fn(t[1], -h))
        xs = (roll_fn(lo, h), roll_fn(hi, h))
        e = gl_add((lo, hi), td)
        o = gl_sub(xs, t)
        # minor-dim insertion on the u32 mask BEFORE the compare: Mosaic only
        # supports that reshape for 32-bit types, not i1
        m = masks[s][:, None] != 0
        lo = jnp.where(m, e[0], o[0])
        hi = jnp.where(m, e[1], o[1])
    return lo, hi


def _split_stages(x: Gl, log_n: int, tw_half: Gl) -> Gl:
    """All DIT butterfly stages via major-axis reshapes (the _apply_stages
    formulation, usable inside Pallas: every reshape/stack only splits or
    merges leading axes, which Mosaic supports on 32-bit data). Multiplies
    only the odd half each stage — half the gl_mul work of _roll_stages.

    tw_half: (log_n, n/2) twiddles, row s = full[::stride][:half] tiled to
    n/2 (only the first `half` entries of row s are read)."""
    lo, hi = x
    n = lo.shape[0]
    c = lo.shape[1]
    tw_lo, tw_hi = tw_half
    for s in range(log_n):
        half = 1 << s
        shaped = lambda a: a.reshape(n // (2 * half), 2, half, c)
        l4, h4 = shaped(lo), shaped(hi)
        x0 = (l4[:, 0], h4[:, 0])
        x1 = (l4[:, 1], h4[:, 1])
        tw = (tw_lo[s, :half][None, :, None], tw_hi[s, :half][None, :, None])
        t = gl_mul(x1, tw)
        e = gl_add(x0, t)
        o = gl_sub(x0, t)
        lo = jnp.stack([e[0], o[0]], axis=1).reshape(n, c)
        hi = jnp.stack([e[1], o[1]], axis=1).reshape(n, c)
    return lo, hi


@lru_cache(maxsize=None)
def _stage_tw_half_table(log_n: int, inverse: bool) -> np.ndarray:
    """(log_n, n/2) uint64: row s = the stage-s twiddles full[::stride][:half],
    zero-padded (padding never read)."""
    n = 1 << log_n
    full = power_table(log_n, inverse)
    out = np.zeros((log_n, max(n // 2, 1)), dtype=np.uint64)
    for s in range(log_n):
        half = 1 << s
        stride = 1 << (log_n - 1 - s)
        out[s, :half] = full[::stride][:half]
    return out


def _pallas_ntt_kernel_split(log_n: int, n_inv: int | None):
    """Kernel body factory for the split-butterfly formulation."""

    def kernel(xlo_ref, xhi_ref, twlo_ref, twhi_ref, olo_ref, ohi_ref):
        lo, hi = _split_stages(
            (xlo_ref[:], xhi_ref[:]), log_n, (twlo_ref[:], twhi_ref[:])
        )
        if n_inv is not None:
            sc = gf64.full((), n_inv)
            lo, hi = gl_mul((lo, hi), (sc[0][None, None], sc[1][None, None]))
        olo_ref[:] = lo
        ohi_ref[:] = hi

    return kernel


def ntt_cols_pallas_split(
    x: Gl, inverse: bool = False, c_tile: int = 128, interpret: bool = False
) -> Gl:
    """ntt_cols with all stages fused in one Pallas kernel using the
    split-butterfly formulation (half the multiplies of ntt_cols_pallas).
    Bit-exact with ntt_cols."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x[0].shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    c_tile = min(c_tile, c)
    assert c % c_tile == 0, (c, c_tile)
    rev = jnp.asarray(bitrev_indices(log_n))
    xlo = jnp.take(x[0], rev, axis=0)
    xhi = jnp.take(x[1], rev, axis=0)
    n_inv = gold.inv(n % P) if inverse else None
    tw_lo, tw_hi = gf64.from_u64(_stage_tw_half_table(log_n, inverse))
    kernel = _pallas_ntt_kernel_split(log_n, n_inv)
    spec = pl.BlockSpec((n, c_tile), lambda j: (0, j), memory_space=pltpu.VMEM)
    tab = pl.BlockSpec(
        (log_n, max(n // 2, 1)), lambda j: (0, 0), memory_space=pltpu.VMEM
    )
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(c // c_tile,),
        in_specs=[spec, spec, tab, tab],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.uint32),
            jax.ShapeDtypeStruct((n, c), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xlo, xhi, tw_lo, tw_hi)
    return out_lo, out_hi


def ntt_four_step_pallas_split(x: Gl, inverse: bool = False, interpret: bool = False) -> Gl:
    """Four-step single-poly NTT over the split-butterfly Pallas kernel."""
    n = x[0].shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = 1 << (log_n - log_n1)

    mat = (x[0].reshape(n1, n2), x[1].reshape(n1, n2))
    mat = ntt_cols_pallas_split(mat, inverse, interpret=interpret)
    tw = gf64.from_u64(_four_step_twiddles(log_n, inverse))
    mat = gl_mul(mat, tw)
    mat = (mat[0].T, mat[1].T)
    mat = ntt_cols_pallas_split(mat, inverse, interpret=interpret)
    return mat[0].reshape(n), mat[1].reshape(n)


def _pallas_ntt_kernel(log_n: int, n_inv: int | None):
    """Kernel body factory: all stages on one (n, C_TILE) VMEM block."""
    from jax.experimental.pallas import tpu as pltpu

    def kernel(xlo_ref, xhi_ref, twlo_ref, twhi_ref, mask_ref, olo_ref, ohi_ref):
        def roll_fn(a, shift):
            # pltpu.roll follows jnp.roll semantics; shift must be non-negative
            return pltpu.roll(a, shift % a.shape[0], axis=0)

        lo, hi = _roll_stages(
            (xlo_ref[:], xhi_ref[:]),
            log_n,
            (twlo_ref[:], twhi_ref[:]),
            mask_ref[:],
            roll_fn,
        )
        if n_inv is not None:
            sc = gf64.full((), n_inv)
            lo, hi = gl_mul((lo, hi), (sc[0][None, None], sc[1][None, None]))
        olo_ref[:] = lo
        ohi_ref[:] = hi

    return kernel


def ntt_cols_pallas(
    x: Gl, inverse: bool = False, c_tile: int = 128, interpret: bool = False
) -> Gl:
    """ntt_cols with every butterfly stage fused into one Pallas kernel: the
    whole transform touches HBM twice (plus the bit-reversal gather) instead
    of twice per stage. Bit-exact with ntt_cols."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = x[0].shape
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    c_tile = min(c_tile, c)
    assert c % c_tile == 0, (c, c_tile)
    rev = jnp.asarray(bitrev_indices(log_n))
    xlo = jnp.take(x[0], rev, axis=0)
    xhi = jnp.take(x[1], rev, axis=0)
    n_inv = gold.inv(n % P) if inverse else None
    tw_lo, tw_hi = gf64.from_u64(_stage_tw_table(log_n, inverse))
    mask = jnp.asarray(_stage_even_mask(log_n).astype(np.uint32))
    kernel = _pallas_ntt_kernel(log_n, n_inv)
    spec = pl.BlockSpec((n, c_tile), lambda j: (0, j), memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((log_n, n), lambda j: (0, 0), memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=(c // c_tile,),
        in_specs=[spec, spec, tab, tab, tab],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.uint32),
            jax.ShapeDtypeStruct((n, c), jnp.uint32),
        ],
        interpret=interpret,
        # the unrolled stage chain keeps ~14 (n, c_tile) u32 temporaries live;
        # the default 16 MB scoped-vmem cap is too tight at c_tile=128
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(xlo, xhi, tw_lo, tw_hi, mask)
    return out_lo, out_hi


def ntt_four_step_pallas(x: Gl, inverse: bool = False, interpret: bool = False) -> Gl:
    """Four-step single-poly NTT with both column-transform passes fused into
    Pallas kernels (bit-exact with ntt_four_step)."""
    n = x[0].shape[0]
    log_n = n.bit_length() - 1
    assert 1 << log_n == n
    log_n1 = log_n // 2
    n1 = 1 << log_n1
    n2 = 1 << (log_n - log_n1)

    mat = (x[0].reshape(n1, n2), x[1].reshape(n1, n2))
    mat = ntt_cols_pallas(mat, inverse, interpret=interpret)
    tw = gf64.from_u64(_four_step_twiddles(log_n, inverse))
    mat = gl_mul(mat, tw)
    mat = (mat[0].T, mat[1].T)
    mat = ntt_cols_pallas(mat, inverse, interpret=interpret)
    return mat[0].reshape(n), mat[1].reshape(n)


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
