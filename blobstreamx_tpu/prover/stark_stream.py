"""Bounded-memory streaming STARK prover (the round-4 queued fix for the
single-chip HBM ceiling; BASELINE.md config-5 full-tier row, SURVEY.md §2.2
C4/C6 [R] — the Curta-parity aux STARKs at production shape).

prove_streaming() produces a proof BIT-IDENTICAL to stark.prove() (same
transcript, same field ops, same bytes — tests/test_stream.py asserts it)
while never materializing the (n_ext, C) low-degree extension that drives
stark.prove's peak memory. For the Ed25519 scalar-mul AIR at 32 validators
(1069+475 committed columns) the standard path needs ~44 GB of HBM in the
commit phase; this path runs it in ~3 GB.

Memory strategy (all device-resident, nothing large crosses the ~10 MB/s
device->host tunnel):

  commit     the trace streams through the Poseidon sponge in COLUMN CHUNKS:
             per chunk, INTT -> coset LDE -> absorb 8 columns per permutation
             into a carried (12, n_ext) sponge state. Peak = one (n_ext, c)
             chunk, not (n_ext, C). Absorption order equals
             ops.merkle.tree_layers -> digests identical.
  quotient   CLASS DECOMPOSITION: extended-domain points with index
             i = u*blowup + r (fixed r) form the coset shift*w_ext^r*<w_n>,
             so the LDE restricted to class r is ONE size-n coset NTT of the
             trace coefficients. Constraint evaluation is pointwise except
             the next-row frame, and i + blowup lands in the SAME class at
             u+1 — a roll by one. Each class evaluates at (n, C), an 8x (at
             rate 3) smaller working set, and the per-class quotient columns
             interleave back into the exact full-domain array.
  openings   evaluated per coefficient chunk at zeta/g*zeta (tiny outputs).
  DEEP       gamma-weighted column sums accumulate per chunk over a
             recomputed LDE chunk; the (n_ext,) ext accumulator is the only
             full-domain array.
  queries    opened rows gather on DEVICE from a recomputed LDE chunk, and
             Merkle paths gather on device from the digest layers — the
             standard path's whole-LDE host fetch (GBs at ~10 MB/s measured)
             disappears.

Host->device transfer is packed: all-boolean traces (the SHA-256 AIR's 1300
bit columns) ship as 32 bits per u32 word (64x), u32-range traces (the Ed
AIR limbs) as one u32 per value (2x).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import gl_add, gl_mul, gl_sub
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.ops import merkle as merkle_ops, ntt as ntt_ops, poseidon as pos
from .air import Air, DeviceAlgebra, KINDS
from .config import StarkConfig
from .fri_ext import fri_prove_ext
from .stark import (
    QueryOpenings,
    RowOpening,
    StarkProof,
    _as_tree,
    _combine_alpha_device,
    _domain_table,
    _eval_columns_at,
    _ext_powers_pow2,
    _ext_powers_seq,
    _ext_gather,
    _ext_to_device,
    _ext_vec_to_host,
    _LazyCols,
    _observe_cap,
    _observe_ext,
    _quotient_commit_fn,
    _zh_inv_table,
)

P = gold.P
RATE = pos.RATE
WIDTH = pos.WIDTH
DIGEST = pos.DIGEST


# ----------------------------------------------------------------------------
# column sources: host trace -> packed device storage -> coefficient chunks
# ----------------------------------------------------------------------------


def _chunk_bounds(C: int, chunk: int) -> list[tuple[int, int]]:
    """Column chunk [a, b) bounds; every bound except the last is a multiple
    of RATE so sponge absorption never straddles a chunk."""
    assert chunk % RATE == 0
    out = []
    a = 0
    while a < C:
        b = min(C, a + chunk)
        out.append((a, b))
        a = b
    return out or [(0, 0)]


@lru_cache(maxsize=None)
def _unpack_bits_fn(n: int, a: int, b: int):
    """(n, W) packed u32 -> (n, b-a) Gl of 0/1 values (bit j of the trace is
    bit j%32 of packed word j//32)."""

    @jax.jit
    def unpack(packed):
        js = np.arange(a, b)
        words = packed[:, js // 32]
        bits = (words >> jnp.asarray((js % 32).astype(np.uint32))[None, :]) & jnp.uint32(1)
        return bits, jnp.zeros_like(bits)

    return unpack


@lru_cache(maxsize=None)
def _intt_fn(n: int, c: int):
    @jax.jit
    def intt(x):
        return ntt_ops.ntt_cols(x, inverse=True)

    return intt


class _Source:
    """Device-resident committed-column source with packed storage and
    chunked coefficient access (INTT per chunk, optionally cached)."""

    def __init__(self, host: np.ndarray, chunk: int, cache_coeffs: bool):
        n, C = host.shape
        self.n, self.C = n, C
        self.bounds = _chunk_bounds(C, chunk)
        self._coeffs: list | None = [None] * len(self.bounds) if cache_coeffs else None
        if C == 0:
            self.mode = "u32"
            self._store = jnp.zeros((n, 0), jnp.uint32)
            return
        mx = int(host.max()) if host.size else 0
        if mx <= 1:
            self.mode = "bits"
            W = (C + 31) // 32
            packed = np.zeros((n, W), np.uint32)
            bits = np.packbits(host.astype(np.uint8), axis=1, bitorder="little")
            pad = np.zeros((n, 4 * W - bits.shape[1]), np.uint8)
            packed = (
                np.concatenate([bits, pad], axis=1).view("<u4").reshape(n, W)
            )
            self._store = jnp.asarray(packed)
        elif mx < (1 << 32):
            self.mode = "u32"
            self._store = jnp.asarray(host.astype(np.uint32))
        else:
            self.mode = "u64"
            self._store = gf64.from_u64(host % P)

    def chunk_gl(self, i: int):
        a, b = self.bounds[i]
        if self.mode == "bits":
            return _unpack_bits_fn(self.n, a, b)(self._store)
        if self.mode == "u32":
            sl = self._store[:, a:b]
            return sl, jnp.zeros_like(sl)
        return self._store[0][:, a:b], self._store[1][:, a:b]

    def coeff_chunk(self, i: int):
        if self._coeffs is not None and self._coeffs[i] is not None:
            return self._coeffs[i]
        a, b = self.bounds[i]
        out = _intt_fn(self.n, b - a)(self.chunk_gl(i))
        if self._coeffs is not None:
            self._coeffs[i] = out
        return out


# ----------------------------------------------------------------------------
# streamed Merkle commit
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _absorb_fn(n: int, c: int, filled: int, rate_bits: int, shift: int):
    """One commit step: coefficient chunk -> coset LDE -> absorb its columns
    into the sponge state. `filled` = state rows already holding unabsorbed
    columns (always 0 here since chunk bounds are RATE-aligned; kept for the
    tail program where c % RATE != 0 leaves a partial final absorb)."""
    assert filled == 0

    @jax.jit
    def absorb(coeffs, st_lo, st_hi):
        lde = ntt_ops.lde_cols(coeffs, rate_bits, shift)
        cols = (lde[0].T, lde[1].T)  # (c, n_ext)
        full = (c // RATE) * RATE
        if full >= 2 * RATE:
            chunks_lo = cols[0][:full].reshape(full // RATE, RATE, -1)
            chunks_hi = cols[1][:full].reshape(full // RATE, RATE, -1)

            def step(st, chunk):
                slo = jnp.concatenate([chunk[0], st[0][RATE:]], axis=0)
                shi = jnp.concatenate([chunk[1], st[1][RATE:]], axis=0)
                return pos.permute((slo, shi)), None

            (st_lo, st_hi), _ = jax.lax.scan(step, (st_lo, st_hi), (chunks_lo, chunks_hi))
            start0 = full
        else:
            start0 = 0
        for start in range(start0, c, RATE):
            k = min(RATE, c - start)
            slo = jnp.concatenate([cols[0][start : start + k], st_lo[k:]], axis=0)
            shi = jnp.concatenate([cols[1][start : start + k], st_hi[k:]], axis=0)
            st_lo, st_hi = pos.permute((slo, shi))
        return st_lo, st_hi

    return absorb


@lru_cache(maxsize=None)
def _tree_reduce_fn(n_ext: int, ch: int):
    """Leaf digests (4, n_ext) -> all upper layers (pairwise Poseidon
    compression, identical to ops.merkle.tree_layers above the leaf layer)."""

    @jax.jit
    def reduce(d_lo, d_hi):
        layer = (d_lo, d_hi)
        layers = [layer]
        while layer[0].shape[1] > (1 << ch):
            lo, hi = layer
            layer = pos.compress_pairs(
                (lo[:, 0::2], hi[:, 0::2]), (lo[:, 1::2], hi[:, 1::2]), pos.permute
            )
            layers.append(layer)
        return tuple(layers)

    return reduce


def _stream_commit(src: _Source, config: StarkConfig, shift: int, ch: int):
    """Streamed trace commit. Returns tree layers (device tuple, leaf digests
    first) — same layers as ops.merkle.tree_layers over the full LDE."""
    n_ext = src.n << config.rate_bits
    st = (jnp.zeros((WIDTH, n_ext), jnp.uint32), jnp.zeros((WIDTH, n_ext), jnp.uint32))
    for i, (a, b) in enumerate(src.bounds):
        if b == a:
            continue
        fn = _absorb_fn(src.n, b - a, 0, config.rate_bits, shift)
        st = fn(src.coeff_chunk(i), st[0], st[1])
    digests = (st[0][:DIGEST], st[1][:DIGEST])
    return _tree_reduce_fn(n_ext, ch)(*digests)


# ----------------------------------------------------------------------------
# class-decomposed quotient
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _sigma_table(log_n: int, shift_r: int) -> np.ndarray:
    """[sigma^0 .. sigma^(n-1)] uint64 for the class coset shift sigma."""
    n = 1 << log_n
    out = np.empty(n, dtype=np.uint64)
    cur = 1
    for i in range(n):
        out[i] = cur
        cur = (cur * shift_r) % P
    return out


@lru_cache(maxsize=None)
def _class_chunk_fn(n: int, c: int):
    """(coeff chunk (n, c), sigma power table (n,)) -> class evaluations
    (n, c): scale rows by sigma^k, forward NTT."""

    @jax.jit
    def cls(coeffs, sg):
        scaled = gl_mul(coeffs, (sg[0][:, None], sg[1][:, None]))
        return ntt_ops.ntt_cols(scaled)

    return cls


def _class_arrays(src: _Source, r: int, log_n_ext: int, shift: int):
    """Class-r evaluations of every column: (n, C) Gl."""
    n = src.n
    sigma = (shift * pow(gold.root_of_unity(log_n_ext), r, P)) % P
    sg = gf64.from_u64(_sigma_table(n.bit_length() - 1, sigma))
    parts = [
        _class_chunk_fn(n, b - a)(src.coeff_chunk(i), sg)
        for i, (a, b) in enumerate(src.bounds)
        if b > a
    ]
    if not parts:
        z = jnp.zeros((n, 0), jnp.uint32)
        return z, z
    if len(parts) == 1:
        return parts[0]
    return (
        jnp.concatenate([p[0] for p in parts], axis=1),
        jnp.concatenate([p[1] for p in parts], axis=1),
    )


_STREAM_PHASE_CACHE: dict = {}


def _stream_phases(air_key, air: Air, n: int, n_pub: int, n_chal: int, config: StarkConfig):
    memo = (air_key, n, n_pub, n_chal, config)
    hit = _STREAM_PHASE_CACHE.get(memo)
    if hit is not None:
        return hit
    hit = _build_stream_phases(air, n, n_pub, n_chal, config)
    _STREAM_PHASE_CACHE[memo] = hit
    return hit


def _build_stream_phases(air: Air, n: int, n_pub: int, n_chal: int, config: StarkConfig):
    """Per-class quotient programs: constraint-group evaluation at (n,)-shaped
    class arrays (next-row frame = roll by ONE within the class), plus the
    divisor-division/stack program with per-class tables as arguments.

    Alpha-power assignment uses the same global offsets as stark._build_phases
    (same probe), so per-class values equal the full-domain program's values
    restricted to the class — the reassembled quotient is bit-identical."""
    n_cols = air.n_cols
    n_s2 = air.n_stage2
    n_fixed = air.n_fixed
    log_n = n.bit_length() - 1
    g = gold.root_of_unity(log_n)
    g_last = pow(g, n - 1, P)
    n_groups = getattr(air, "n_constraint_groups", 1)

    def _framed(cls, s2_cls, pub_gl, fixed_cls, chal_gl):
        def frame(m, k):
            return _LazyCols(m, k), _LazyCols(m, k, roll=1)

        local, nxt = frame(cls, n_cols)
        stage2, stage2_next = frame(s2_cls, n_s2)
        fixed, fixed_next = frame(fixed_cls, n_fixed)
        publics = [(pub_gl[0][j : j + 1], pub_gl[1][j : j + 1]) for j in range(n_pub)]
        chals = [(chal_gl[0][j : j + 1], chal_gl[1][j : j + 1]) for j in range(n_chal)]
        return local, nxt, publics, dict(
            fixed=fixed,
            fixed_next=fixed_next,
            challenges=chals,
            stage2=stage2,
            stage2_next=stage2_next,
        )

    def _meta_of(gi):
        kinds: list[str] = []
        widths: list[int] = []

        def probe(cls, s2_cls, pub_gl, fixed_cls, chal_gl):
            local, nxt, publics, fr = _framed(cls, s2_cls, pub_gl, fixed_cls, chal_gl)
            alg = DeviceAlgebra((n,))
            cons = air.eval_constraint_group(gi, local, nxt, publics, alg, **fr)
            for v, k in cons:
                assert k in KINDS
                kinds.append(k)
                widths.append(alg.width(v))
            return [v for v, _ in cons]

        m_s = jax.ShapeDtypeStruct((n, n_cols), jnp.uint32)
        s2_s = jax.ShapeDtypeStruct((n, n_s2), jnp.uint32)
        fx_s = jax.ShapeDtypeStruct((n, n_fixed), jnp.uint32)
        pub_s = jax.ShapeDtypeStruct((n_pub,), jnp.uint32)
        ch_s = jax.ShapeDtypeStruct((n_chal,), jnp.uint32)
        jax.eval_shape(probe, (m_s, m_s), (s2_s, s2_s), (pub_s, pub_s), (fx_s, fx_s), (ch_s, ch_s))
        return widths, kinds

    group_meta = [_meta_of(gi) for gi in range(n_groups)]
    pow_total = sum(sum(w) for w, _ in group_meta)
    kinds_used = [k for k in KINDS if any(k in kinds for _, kinds in group_meta)]
    offsets = []
    off = 0
    for widths, _ in group_meta:
        offsets.append(off)
        off += sum(widths)

    def _make_group_fn(gi, offset):
        @jax.jit
        def group_fn(cls, s2_cls, pub_gl, alpha, fixed_cls, chal_gl):
            local, nxt, publics, fr = _framed(cls, s2_cls, pub_gl, fixed_cls, chal_gl)
            alg = DeviceAlgebra((n,))
            cons = air.eval_constraint_group(gi, local, nxt, publics, alg, **fr)
            acc = _combine_alpha_device(cons, alpha, alg, offset=offset, pow_total=pow_total)
            zero = gf64.ext_zeros((n,))
            return tuple(acc.get(k, zero) for k in kinds_used)

        return group_fn

    group_fns = [_make_group_fn(gi, offsets[gi]) for gi in range(n_groups)]

    @jax.jit
    def divide_cls(parts, x_cls, zh_inv_c):
        """Sum group accumulators, divide by per-class divisor values, stack
        the quotient's two ext components as base columns (n, 2)."""
        acc = {}
        for i, kind in enumerate(kinds_used):
            v = parts[0][i]
            for p in parts[1:]:
                v = gf64.ext_add(v, p[i])
            acc[kind] = v
        x_minus_last = gl_sub(x_cls, gf64.full((n,), g_last))
        inv_by_kind = {}
        if "all" in acc:
            inv_by_kind["all"] = zh_inv_c
        if "transition" in acc:
            inv_by_kind["transition"] = gl_mul(zh_inv_c, x_minus_last)
        if "first" in acc:
            inv_by_kind["first"] = gf64.gl_inv(gl_sub(x_cls, gf64.full((n,), 1)))
        if "last" in acc:
            inv_by_kind["last"] = gf64.gl_inv(x_minus_last)
        q = None
        for kind, v in acc.items():
            inv_d = inv_by_kind[kind]
            term = (gl_mul(v[0], inv_d), gl_mul(v[1], inv_d))
            q = gf64.ext_add(q, term) if q is not None else term
        return (
            jnp.stack([q[0][0], q[1][0]], axis=1),
            jnp.stack([q[0][1], q[1][1]], axis=1),
        )

    return group_fns, divide_cls


# ----------------------------------------------------------------------------
# streamed openings / DEEP / query rows
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _open_chunk_fn(n: int, c: int):
    @jax.jit
    def open_chunk(coeffs, pz0l, pz0h, pz1l, pz1h):
        return _eval_columns_at(coeffs, ((pz0l, pz0h), (pz1l, pz1h)))

    return open_chunk


@lru_cache(maxsize=None)
def _deep_acc_fn(n: int, c: int, rate_bits: int, shift: int, with_b: bool):
    """Accumulate gamma-weighted column sums of a recomputed LDE chunk into
    the DEEP numerator accumulators."""

    @jax.jit
    def acc(coeffs, gpa, gpb, accA, accB):
        lde = ntt_ops.lde_cols(coeffs, rate_bits, shift)
        a0 = _fold_cols(gl_mul(lde, (gpa[0][0][None, :], gpa[0][1][None, :])))
        a1 = _fold_cols(gl_mul(lde, (gpa[1][0][None, :], gpa[1][1][None, :])))
        accA = gf64.ext_add(accA, (a0, a1))
        if with_b:
            b0 = _fold_cols(gl_mul(lde, (gpb[0][0][None, :], gpb[0][1][None, :])))
            b1 = _fold_cols(gl_mul(lde, (gpb[1][0][None, :], gpb[1][1][None, :])))
            accB = gf64.ext_add(accB, (b0, b1))
        return accA, accB

    return acc


def _fold_cols(x):
    """(n, k) -> (n,) log-depth pairwise column sum (k need not be 2^j)."""
    lo, hi = x
    while lo.shape[1] > 1:
        k = lo.shape[1]
        half = k // 2
        s = gl_add((lo[:, :half], hi[:, :half]), (lo[:, half : 2 * half], hi[:, half : 2 * half]))
        if k % 2:
            lo = jnp.concatenate([s[0], lo[:, -1:]], axis=1)
            hi = jnp.concatenate([s[1], hi[:, -1:]], axis=1)
        else:
            lo, hi = s
    return lo[:, 0], hi[:, 0]


@lru_cache(maxsize=None)
def _deep_finalize_fn(n_ext: int, log_n_ext: int, shift: int):
    @jax.jit
    def fin(accA, accB, ca, cb, zeta, g_zeta):
        x_tab = gf64.from_u64(_domain_table(log_n_ext, shift))
        x_ext = gf64.ext_from_base(x_tab)
        inv_xz = gf64.ext_inv(gf64.ext_sub(x_ext, zeta))
        inv_xgz = gf64.ext_inv(gf64.ext_sub(x_ext, g_zeta))
        num_a = gf64.ext_sub(accA, ca)
        num_b = gf64.ext_sub(accB, cb)
        return gf64.ext_add(gf64.ext_mul(num_a, inv_xz), gf64.ext_mul(num_b, inv_xgz))

    return fin


@lru_cache(maxsize=None)
def _rows_chunk_fn(n: int, c: int, n_pos: int, rate_bits: int, shift: int):
    @jax.jit
    def rows(coeffs, pos_idx):
        lde = ntt_ops.lde_cols(coeffs, rate_bits, shift)
        return lde[0][pos_idx], lde[1][pos_idx]

    return rows


def _stream_rows(src: _Source, positions: np.ndarray, rate_bits: int, shift: int) -> np.ndarray:
    """Opened rows (|pos|, C) uint64: per-chunk device gathers, concatenated
    ON DEVICE so only one small array crosses the slow tunnel."""
    pos_d = jnp.asarray(positions.astype(np.int32))
    parts = []
    for i, (a, b) in enumerate(src.bounds):
        if b == a:
            continue
        parts.append(
            _rows_chunk_fn(src.n, b - a, len(positions), rate_bits, shift)(
                src.coeff_chunk(i), pos_d
            )
        )
    if not parts:
        return np.zeros((len(positions), 0), np.uint64)
    lo = jnp.concatenate([p[0] for p in parts], axis=1)
    hi = jnp.concatenate([p[1] for p in parts], axis=1)
    return gf64.to_u64((np.asarray(lo), np.asarray(hi)))


@lru_cache(maxsize=None)
def _path_gather_fn(shape_key, n_layers: int, n_pos: int):
    @jax.jit
    def gather(layers, pos_idx):
        out = []
        idx = pos_idx
        for lo, hi in layers:
            out.append((lo[:, idx ^ 1], hi[:, idx ^ 1]))
            idx = idx // 2
        return tuple(out)

    return gather


def _device_paths(layers, positions: np.ndarray):
    """Merkle sibling paths for `positions`, gathered on device: returns
    per-position [[4 ints]*n_levels] (leaf->cap), matching PoseidonTree.path.
    All levels' gathers concatenate into ONE (4, L*|pos|) fetch."""
    body = tuple(layers[:-1])
    pos_d = jnp.asarray(positions.astype(np.int32))
    shape_key = tuple(l[0].shape for l in body)
    sibs = _path_gather_fn(shape_key, len(body), len(positions))(body, pos_d)
    lo = jnp.concatenate([s[0] for s in sibs], axis=1)
    hi = jnp.concatenate([s[1] for s in sibs], axis=1)
    flat = gf64.to_u64((np.asarray(lo), np.asarray(hi)))  # (4, L*|pos|)
    npos = len(positions)
    return [
        [
            [int(x) for x in flat[:, lvl * npos + pi]]
            for lvl in range(len(body))
        ]
        for pi in range(npos)
    ]


# ----------------------------------------------------------------------------
# prover
# ----------------------------------------------------------------------------


def _auto_chunk(n_ext: int, budget_bytes: int = 1 << 29) -> int:
    c = budget_bytes // (n_ext * 8)
    return int(max(RATE, min(128, (c // RATE) * RATE)))


def estimate_standard_bytes(n: int, n_cols_total: int, config: StarkConfig) -> int:
    """Rough peak-HBM estimate of stark.prove's resident set (trace+stage2
    LDEs and the commit transpose) — the auto-streaming trigger."""
    n_ext = n << config.rate_bits
    return 3 * n_ext * n_cols_total * 8


# Streaming cutover point. The v5e's 15.75 GB HBM holds roughly a 4 GB
# estimate once constraint-eval temporaries and the host-transfer staging are
# added; above it the standard path OOMs or thrashes, below it the standard
# path's single-program phases are faster. Override for tests/experiments.
AUTO_STREAM_BYTES = int(__import__("os").environ.get("BSX_STREAM_BYTES", 4 << 30))


def prove_auto(
    air: Air,
    trace: np.ndarray,
    publics: list[int],
    config: StarkConfig,
    shift: int = gold.COSET_SHIFT,
    aux=None,
    mesh=None,
) -> StarkProof:
    """stark.prove with automatic streaming cutover: big single-chip proves
    take the bounded-memory path (bit-identical proof), everything else the
    standard one. A mesh always routes to the standard (sharded) path."""
    from . import stark as _stark

    est = estimate_standard_bytes(trace.shape[0], air.n_cols + air.n_stage2, config)
    if mesh is None and est > AUTO_STREAM_BYTES:
        return prove_streaming(air, trace, publics, config, shift, aux)
    return _stark.prove(air, trace, publics, config, shift=shift, aux=aux, mesh=mesh)


def prove_streaming(
    air: Air,
    trace: np.ndarray,
    publics: list[int],
    config: StarkConfig,
    shift: int = gold.COSET_SHIFT,
    aux=None,
    col_chunk: int | None = None,
    coeff_cache_bytes: int = 6 << 30,
) -> StarkProof:
    """Drop-in replacement for stark.prove (single-chip) with bounded peak
    memory. The returned proof is bit-identical to stark.prove's for the same
    inputs; stark.verify accepts it unchanged."""
    n, n_cols = trace.shape
    assert n & (n - 1) == 0
    assert n_cols == air.n_cols
    assert air.max_degree <= config.blowup(), "rate too low for constraint degree"
    log_n = n.bit_length() - 1
    blowup = config.blowup()
    n_ext = n * blowup
    log_n_ext = log_n + config.rate_bits
    g = gold.root_of_unity(log_n)
    ch = min(config.cap_height, (n_ext - 1).bit_length())
    chunk = col_chunk or _auto_chunk(n_ext)
    cache_ok = n * (n_cols + air.n_stage2) * 8 <= coeff_cache_bytes

    challenger = Challenger()
    challenger.observe_many([v % P for v in publics])

    # --- phase 1: streamed trace commit -----------------------------------
    trace_src = _Source(trace, chunk, cache_ok)
    t_layers = _stream_commit(trace_src, config, shift, ch)
    trace_tree = _as_tree(t_layers, ch)
    trace_cap = merkle_ops.cap_to_ints(trace_tree)
    _observe_cap(challenger, trace_cap)

    air.observe_aux(challenger, aux)
    chals = air.sample_challenges(challenger, aux)
    assert len(chals) == air.n_challenges
    chal_gl = gf64.from_u64(np.array([v % P for v in chals], np.uint64))

    n_s2 = air.n_stage2
    if n_s2:
        s2 = air.build_stage2(trace, chals, aux)
        assert s2.shape == (n, n_s2)
        s2_src = _Source(np.asarray(s2, np.uint64) % P, chunk, cache_ok)
        s2_layers = _stream_commit(s2_src, config, shift, ch)
        s2_tree = _as_tree(s2_layers, ch)
        s2_cap = merkle_ops.cap_to_ints(s2_tree)
        _observe_cap(challenger, s2_cap)
    else:
        s2_src = _Source(np.zeros((n, 0), np.uint64), chunk, False)
        s2_tree, s2_cap = None, []

    # --- phase 3: class-decomposed quotient --------------------------------
    alpha = challenger.sample_ext()
    alpha_d = _ext_to_device(alpha)
    pub_gl = gf64.from_u64(np.array([v % P for v in publics], np.uint64))

    fixed_tab = air.fixed_columns(n)
    if fixed_tab is None or fixed_tab.shape[1] == 0:
        fixed_src = _Source(np.zeros((n, 0), np.uint64), chunk, False)
    else:
        fixed_src = _Source(np.asarray(fixed_tab, np.uint64) % P, chunk, True)

    group_fns, divide_cls = _stream_phases(
        air.phase_key(), air, n, len(publics), air.n_challenges, config
    )
    x_full = _domain_table(log_n_ext, shift)
    zh_full = _zh_inv_table(log_n, config.rate_bits, shift)
    q_classes = []
    for r in range(blowup):
        cls = _class_arrays(trace_src, r, log_n_ext, shift)
        s2_cls = _class_arrays(s2_src, r, log_n_ext, shift)
        fx_cls = _class_arrays(fixed_src, r, log_n_ext, shift)
        args = (cls, s2_cls, pub_gl, alpha_d, fx_cls, chal_gl)
        parts = [fn(*args) for fn in group_fns]
        x_cls = gf64.from_u64(np.ascontiguousarray(x_full[r::blowup]))
        zh_cls = gf64.from_u64(np.ascontiguousarray(zh_full[r::blowup]))
        q_classes.append(divide_cls(parts, x_cls, zh_cls))
        del cls, s2_cls, fx_cls, parts
    q_cols = (
        jnp.stack([qc[0] for qc in q_classes], axis=1).reshape(n_ext, 2),
        jnp.stack([qc[1] for qc in q_classes], axis=1).reshape(n_ext, 2),
    )
    del q_classes
    q_chunk_coeffs, q_lde, q_layers = _quotient_commit_fn(n, config, shift, ch)(q_cols)
    del q_cols
    q_tree = _as_tree(q_layers, ch)
    q_cap = merkle_ops.cap_to_ints(q_tree)
    _observe_cap(challenger, q_cap)

    # --- phase 4: openings at zeta / g*zeta --------------------------------
    zeta = challenger.sample_ext()
    g_zeta = gold.ext_mul(zeta, (g, 0))
    pz = _ext_powers_pow2(_ext_to_device(zeta), n)
    pgz = _ext_powers_pow2(_ext_to_device(g_zeta), n)

    def open_source(src: _Source):
        vz, vgz = [], []
        for i, (a, b) in enumerate(src.bounds):
            if b == a:
                continue
            fn = _open_chunk_fn(src.n, b - a)
            co = src.coeff_chunk(i)
            vz.append(fn(co, pz[0][0], pz[0][1], pz[1][0], pz[1][1]))
            vgz.append(fn(co, pgz[0][0], pgz[0][1], pgz[1][0], pgz[1][1]))

        def cat(vs):
            if not vs:
                return []
            # concatenate the per-chunk ext vectors on device: one fetch
            joined = tuple(
                (
                    jnp.concatenate([v[comp][0] for v in vs]),
                    jnp.concatenate([v[comp][1] for v in vs]),
                )
                for comp in range(2)
            )
            return _ext_vec_to_host(joined)

        return cat(vz), cat(vgz)

    trace_zeta, trace_gzeta = open_source(trace_src)
    stage2_zeta, stage2_gzeta = open_source(s2_src)
    qz_d = _open_chunk_fn(n, 2 * blowup)(
        q_chunk_coeffs, pz[0][0], pz[0][1], pz[1][0], pz[1][1]
    )
    quotient_zeta = _ext_vec_to_host(qz_d)
    for v in trace_zeta + trace_gzeta + stage2_zeta + stage2_gzeta + quotient_zeta:
        _observe_ext(challenger, v)

    # --- phase 5: DEEP composition (streamed accumulation) -----------------
    gamma = challenger.sample_ext()
    n_wit = n_cols + n_s2
    m_pows = 2 * n_wit + 2 * blowup
    g_pows = [(1, 0)]
    for _ in range(m_pows - 1):
        g_pows.append(gold.ext_mul(g_pows[-1], gamma))
    wit_zeta = trace_zeta + stage2_zeta
    wit_gzeta = trace_gzeta + stage2_gzeta
    ca = (0, 0)
    cb = (0, 0)
    for j in range(n_wit):
        ca = gold.ext_add(ca, gold.ext_mul(g_pows[j], wit_zeta[j]))
        cb = gold.ext_add(cb, gold.ext_mul(g_pows[n_wit + j], wit_gzeta[j]))
    for k2 in range(2 * blowup):
        ca = gold.ext_add(ca, gold.ext_mul(g_pows[2 * n_wit + k2], quotient_zeta[k2]))

    gp_dev = _ext_powers_seq(_ext_to_device(gamma), m_pows)
    accA = gf64.ext_zeros((n_ext,))
    accB = gf64.ext_zeros((n_ext,))

    def deep_source(src: _Source, base: int, accA, accB):
        for i, (a, b) in enumerate(src.bounds):
            if b == a:
                continue
            gpa = _ext_gather(gp_dev, np.arange(base + a, base + b))
            gpb = _ext_gather(gp_dev, np.arange(n_wit + base + a, n_wit + base + b))
            fn = _deep_acc_fn(src.n, b - a, config.rate_bits, shift, True)
            accA, accB = fn(src.coeff_chunk(i), gpa, gpb, accA, accB)
        return accA, accB

    accA, accB = deep_source(trace_src, 0, accA, accB)
    accA, accB = deep_source(s2_src, n_cols, accA, accB)
    gpq = _ext_gather(gp_dev, np.arange(2 * n_wit, 2 * n_wit + 2 * blowup))
    accA, _ = _deep_acc_fn(n, 2 * blowup, config.rate_bits, shift, False)(
        q_chunk_coeffs, gpq, gpq, accA, accB
    )
    deep_cw = _deep_finalize_fn(n_ext, log_n_ext, shift)(
        accA,
        accB,
        _ext_to_device(ca),
        _ext_to_device(cb),
        _ext_to_device(zeta),
        _ext_to_device(g_zeta),
    )
    del accA, accB

    # --- phase 6: FRI + query openings -------------------------------------
    fri_proof, indices = fri_prove_ext(deep_cw, config.fri(), challenger, shift)

    half = n_ext // 2
    pos_list: list[int] = []
    for idx in indices:
        i = idx % half
        pos_list += [i, i + half]
    positions = np.array(pos_list, np.int64)
    t_rows = _stream_rows(trace_src, positions, config.rate_bits, shift)
    s2_rows = _stream_rows(s2_src, positions, config.rate_bits, shift) if n_s2 else None
    pos_d = jnp.asarray(positions.astype(np.int32))
    q_rows = gf64.to_u64(
        (np.asarray(q_lde[0][pos_d]), np.asarray(q_lde[1][pos_d]))
    )
    t_paths = _device_paths(t_layers, positions)
    q_paths = _device_paths(q_layers, positions)
    s2_paths = _device_paths(s2_layers, positions) if n_s2 else None

    openings = []
    for qi in range(len(indices)):
        a, b = 2 * qi, 2 * qi + 1

        def row_of(rows, paths, side):
            k2 = a if side == 0 else b
            return RowOpening(row=[int(v) for v in rows[k2]], path=paths[k2])

        openings.append(
            QueryOpenings(
                trace=(row_of(t_rows, t_paths, 0), row_of(t_rows, t_paths, 1)),
                quotient=(row_of(q_rows, q_paths, 0), row_of(q_rows, q_paths, 1)),
                stage2=(row_of(s2_rows, s2_paths, 0), row_of(s2_rows, s2_paths, 1))
                if n_s2
                else None,
            )
        )

    return StarkProof(
        trace_cap=trace_cap,
        quotient_cap=q_cap,
        trace_zeta=trace_zeta,
        trace_gzeta=trace_gzeta,
        quotient_zeta=quotient_zeta,
        fri=fri_proof,
        openings=openings,
        stage2_cap=s2_cap,
        stage2_zeta=stage2_zeta,
        stage2_gzeta=stage2_gzeta,
    )
