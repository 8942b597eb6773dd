"""Batched Poseidon permutation + sponge hashing on TPU (component C3,
SURVEY.md §2.2; config 2 at /root/repo/BASELINE.json:8).

Layout: a batch of width-12 states is a Gl pair of uint32 arrays of shape
``(12, N)`` — state-element index on the sublane axis, batch on the lane axis,
so every round is pure VPU SIMD across N.

MDS strategy (the circulant matrix's entries are all powers of two):
``out[r] = Σ_i state[(i+r) mod 12] << K[i]  (+ 8*state[0] for r=0)``.
Rather than 144 modular multiplies, we accumulate shifted 16-bit limbs in
u32 columns of 16-bit significance, carry-propagate once, and do a single
128->64 reduction per output row. Terms are GROUPED BY SHIFT AMOUNT (8
distinct shifts across the 13 terms): each group's rotated limbs are summed
BEFORE the shift, and the shifted value lands in its column un-split —
column totals stay below 2^16 * (sum MDS_CIRC + 8) < 2^29, so nothing
overflows u32 and the carry pass distributes the excess. This roughly
halves the MDS's non-mul VPU op stream vs shifting/splitting per term.

Rounds run under ``lax.scan`` so compile time is O(1) in round count; the
Pallas kernel version keeps the state in VMEM across all 30 rounds (one HBM
round-trip per batch instead of one per fused-op chain).

Golden oracle: blobstreamx_tpu.golden.poseidon (bit-exact, tested).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl, gl_add, gl_mul, gl_square
from blobstreamx_tpu.golden import poseidon as gold

WIDTH = gold.WIDTH
RATE = gold.RATE
DIGEST = gold.DIGEST
N_ROUNDS = gold.N_ROUNDS
HALF_FULL = gold.FULL_ROUNDS // 2
PARTIAL = gold.PARTIAL_ROUNDS

# log2 of the circulant MDS entries; diag entry is 8 = 2^3 on row 0 only.
MDS_LOG = tuple(int(c).bit_length() - 1 for c in gold.MDS_CIRC)
DIAG_LOG = 3
MASK16 = np.uint32(0xFFFF)


@lru_cache(maxsize=None)
def _round_constants_np():
    rc = np.array(gold.round_constants(), dtype=np.uint64).reshape(N_ROUNDS, WIDTH)
    return (rc & np.uint64(0xFFFFFFFF)).astype(np.uint32), (rc >> np.uint64(32)).astype(
        np.uint32
    )


def _sbox(x: Gl) -> Gl:
    """x^7 = (x^3)^2 * x with x^3 = x^2 * x  (2 squares + 2 muls)."""
    x2 = gl_square(x)
    x3 = gl_mul(x2, x)
    return gl_mul(gl_square(x3), x)


def _mds(state: Gl) -> Gl:
    """Circulant-plus-diag MDS over a (12, N) block via shift-grouped column
    accumulation (bit-identical to the per-term scheme: both accumulate the
    same exact integer Σ cols[c]·2^16c with no u32 overflow)."""
    lo, hi = state
    n_cols = 6  # value < 2^85, significance-16 columns in u32
    cols: list = [None] * (n_cols + 1)

    def roll_up(x, i):
        # static row rotation (x[(r+i) mod 12] at row r) via slice+concat —
        # works identically under XLA and Mosaic
        return x if i == 0 else jnp.concatenate([x[i:], x[:i]], axis=0)

    # out[r] needs state[(i+r) mod 12] * 2^K[i]: rotating rows up by i aligns
    # source row (i+r) with output row r for every r at once. Terms sharing a
    # shift amount sum their rotated limbs first (<=4 members: sums < 2^18).
    groups: dict[int, list] = {}
    for i in range(WIDTH):
        groups.setdefault(MDS_LOG[i], []).append((roll_up(lo, i), roll_up(hi, i)))
    # diagonal: + state[0] * 8, only for output row 0
    row_mask = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, 0) == 0
    groups.setdefault(DIAG_LOG, []).append(
        (jnp.where(row_mask, lo, jnp.uint32(0)), jnp.where(row_mask, hi, jnp.uint32(0)))
    )

    for k, members in sorted(groups.items()):
        q, r = divmod(k, 16)
        sums: list = [None] * 4
        for mlo, mhi in members:
            for li, limb in enumerate((mlo & MASK16, mlo >> 16, mhi & MASK16, mhi >> 16)):
                sums[li] = limb if sums[li] is None else sums[li] + limb
        for li in range(4):
            term = (sums[li] << r) if r else sums[li]
            c = li + q
            cols[c] = term if cols[c] is None else cols[c] + term

    # carry-propagate the significance-16 columns into 16-bit words (value
    # < 2^85 means words 4+ vanish after reduction below uses n3 = 0).
    words = []
    carry = jnp.zeros_like(lo)
    for c in range(n_cols + 1):
        tot = carry if cols[c] is None else cols[c] + carry
        words.append(tot & MASK16)
        carry = tot >> 16
    n0 = words[0] | (words[1] << 16)
    n1 = words[2] | (words[3] << 16)
    n2 = words[4] | (words[5] << 16)
    # bits >= 2^96: word[6] only holds bits 96..112 if value >= 2^96 — it is
    # always zero here (value < 2^85), so n3 = 0.
    n3 = jnp.zeros_like(lo)
    return gf64._reduce128(n0, n1, n2, n3)


def _full_round(state: Gl, rc: Gl) -> Gl:
    state = gl_add(state, rc)
    state = _sbox(state)
    return _mds(state)


def _partial_round(state: Gl, rc: Gl) -> Gl:
    state = gl_add(state, rc)
    lo, hi = state
    s0 = (lo[0:1, :], hi[0:1, :])
    s0 = _sbox(s0)
    lo = jnp.concatenate([s0[0], lo[1:, :]], axis=0)
    hi = jnp.concatenate([s0[1], hi[1:, :]], axis=0)
    return _mds((lo, hi))


def permute(state: Gl) -> Gl:
    """Poseidon permutation of a (12, N) batch, scan over rounds (jnp path)."""
    rc_lo, rc_hi = _round_constants_np()
    rc_lo = jnp.asarray(rc_lo)[:, :, None]  # (30, 12, 1) broadcasting over N
    rc_hi = jnp.asarray(rc_hi)[:, :, None]

    def scan_phase(state, rounds, body):
        def step(st, rc):
            return body(st, rc), None

        st, _ = jax.lax.scan(step, state, rounds)
        return st

    state = scan_phase(state, (rc_lo[:HALF_FULL], rc_hi[:HALF_FULL]), _full_round)
    state = scan_phase(
        state,
        (rc_lo[HALF_FULL : HALF_FULL + PARTIAL], rc_hi[HALF_FULL : HALF_FULL + PARTIAL]),
        _partial_round,
    )
    state = scan_phase(state, (rc_lo[HALF_FULL + PARTIAL :], rc_hi[HALF_FULL + PARTIAL :]), _full_round)
    return state


# ----------------------------------------------------------------------------
# Pallas kernel: whole permutation in VMEM per batch block.
# ----------------------------------------------------------------------------


def _permute_kernel(lo_ref, hi_ref, rclo_ref, rchi_ref, out_lo_ref, out_hi_ref):
    # Round loop is a fori_loop (body traced once: fast interpret mode and fast
    # Mosaic compile). Constants live in SMEM — scalar memory allows the
    # dynamic round index that VMEM lane slicing forbids; the (12, 1) constant
    # column is rebuilt from 12 scalar reads.
    state = (lo_ref[:, :], hi_ref[:, :])

    def rc_at(r):
        lo = jnp.stack([rclo_ref[r, i] for i in range(WIDTH)]).reshape(WIDTH, 1)
        hi = jnp.stack([rchi_ref[r, i] for i in range(WIDTH)]).reshape(WIDTH, 1)
        return lo, hi

    def full_body(r, st):
        return _full_round(st, rc_at(r))

    def partial_body(r, st):
        return _partial_round(st, rc_at(r))

    state = jax.lax.fori_loop(0, HALF_FULL, full_body, state)
    state = jax.lax.fori_loop(HALF_FULL, HALF_FULL + PARTIAL, partial_body, state)
    state = jax.lax.fori_loop(HALF_FULL + PARTIAL, N_ROUNDS, full_body, state)
    out_lo_ref[:, :] = state[0]
    out_hi_ref[:, :] = state[1]


def permute_pallas(state: Gl, block_n: int = 512) -> Gl:
    """Pallas version of ``permute``; bit-identical output."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    lo, hi = state
    n = lo.shape[1]
    assert lo.shape[0] == WIDTH
    block_n = min(block_n, n)
    assert n % block_n == 0, (n, block_n)

    grid = (n // block_n,)
    state_spec = pl.BlockSpec((WIDTH, block_n), lambda i: (0, i), memory_space=pltpu.VMEM)

    rc_lo, rc_hi = _round_constants_np()
    rc_spec = pl.BlockSpec((N_ROUNDS, WIDTH), lambda i: (0, 0), memory_space=pltpu.SMEM)

    out_lo, out_hi = pl.pallas_call(
        _permute_kernel,
        grid=grid,
        in_specs=[state_spec, state_spec, rc_spec, rc_spec],
        out_specs=[state_spec, state_spec],
        out_shape=[
            jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
            jax.ShapeDtypeStruct(hi.shape, jnp.uint32),
        ],
    )(lo, hi, jnp.asarray(rc_lo), jnp.asarray(rc_hi))
    return out_lo, out_hi


# ----------------------------------------------------------------------------
# Sponge hashing over batches
# ----------------------------------------------------------------------------


def hash_columns(inputs: Gl, permute_fn=permute) -> Gl:
    """Hash N vectors of L field elements each: inputs (L, N) -> digests (4, N).

    Sponge with rate 8/capacity 4, no padding (fixed-length input), matching
    golden hash_n_to_m_no_pad column-wise. Full-rate absorb chunks run under
    ONE lax.scan so compile time is O(1) in L (a 1300-element leaf would
    otherwise unroll 163 permutations into the graph); the op order — and so
    the digest — is identical to the unrolled loop.
    """
    lo, hi = inputs
    L, n = lo.shape
    state = gf64.zeros((WIDTH, n))
    full = (L // RATE) * RATE
    if full >= 2 * RATE:
        chunks_lo = lo[:full].reshape(L // RATE, RATE, n)
        chunks_hi = hi[:full].reshape(L // RATE, RATE, n)

        def absorb(st, chunk):
            slo = jnp.concatenate([chunk[0], st[0][RATE:]], axis=0)
            shi = jnp.concatenate([chunk[1], st[1][RATE:]], axis=0)
            return permute_fn((slo, shi)), None

        state, _ = jax.lax.scan(absorb, state, (chunks_lo, chunks_hi))
        start0 = full
    else:
        start0 = 0
    for start in range(start0, L, RATE):
        chunk = min(RATE, L - start)
        slo = jnp.concatenate([lo[start : start + chunk], state[0][chunk:]], axis=0)
        shi = jnp.concatenate([hi[start : start + chunk], state[1][chunk:]], axis=0)
        state = permute_fn((slo, shi))
    return state[0][:DIGEST], state[1][:DIGEST]


def compress_pairs(left: Gl, right: Gl, permute_fn=permute) -> Gl:
    """Two-to-one compression of N digest pairs: (4,N),(4,N) -> (4,N)."""
    lo = jnp.concatenate(
        [left[0], right[0], jnp.zeros((WIDTH - 2 * DIGEST,) + left[0].shape[1:], jnp.uint32)],
        axis=0,
    )
    hi = jnp.concatenate(
        [left[1], right[1], jnp.zeros((WIDTH - 2 * DIGEST,) + left[1].shape[1:], jnp.uint32)],
        axis=0,
    )
    state = permute_fn((lo, hi))
    return state[0][:DIGEST], state[1][:DIGEST]
