"""DEEP-ALI STARK prover/verifier over Goldilocks (components C8/C10,
SURVEY.md §2.2; the phase structure mirrors the behavioral hot path of
SURVEY.md §3.4 without porting any upstream code).

prove(air, trace, publics, config) phases — ★ = one jitted device program:
  1. trace INTT + LDE x 2^rate onto 7*<w_ext> + Poseidon commit  ★ (C2,C3,C5)
  2. Fiat-Shamir alpha (host golden challenger)
  3. constraint evaluation on the extended domain, alpha-        ★ (C8)
     combined per divisor kind, pointwise division by the
     divisor tables, INTT, split into 2^rate degree-n chunks,
     LDE + commit
  4. zeta; openings of every committed column at zeta (and       ★
     g*zeta for the trace) via ext power-table evaluation
  5. gamma; DEEP composition polynomial over GF(p^2)             ★
  6. FRI on the DEEP codeword (prover.fri_ext)                   ★ (C7)
  7. per-query trace/quotient row openings + Merkle paths (host gathers)

All Fiat-Shamir challenges enter the jitted programs as TRACED device
scalars, so a program compiles once per (air, shape, config) and is reused
across proofs (the persistent compile cache covers process restarts).

verify() is a host-side (pure python int) verifier: it re-derives the whole
transcript, checks the ALI identity at zeta using the SAME Air.eval_constraints
code over the host ext algebra, checks every Merkle opening, recomputes the
DEEP combination at every queried point, and runs the ext-FRI fold checks.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl, gl_add, gl_mul, gl_sub
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.golden import ntt as golden_ntt
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.golden.merkle import poseidon_verify_path
from blobstreamx_tpu.ops import merkle as merkle_ops, ntt as ntt_ops, poseidon as pos
from .air import Air, DeviceAlgebra, HostExtAlgebra, KINDS
from .config import StarkConfig
from .fri_ext import FriExtProof, fri_prove_ext, fri_verify_ext

P = gold.P
U = (0, 1)  # the ext basis element sqrt(7)


# ----------------------------------------------------------------------------
# proof structure
# ----------------------------------------------------------------------------


@dataclass
class RowOpening:
    row: list[int]  # committed leaf vector (u64 ints)
    path: list[list[int]]


@dataclass
class QueryOpenings:
    """Openings at layer-0 FRI positions (i, i + n_ext/2)."""

    trace: tuple[RowOpening, RowOpening]
    quotient: tuple[RowOpening, RowOpening]
    stage2: tuple[RowOpening, RowOpening] | None = None


@dataclass
class StarkProof:
    trace_cap: list[list[int]]
    quotient_cap: list[list[int]]
    trace_zeta: list[tuple[int, int]]  # per trace column, ext
    trace_gzeta: list[tuple[int, int]]
    quotient_zeta: list[tuple[int, int]]  # per quotient base column (2 per chunk)
    fri: FriExtProof
    openings: list[QueryOpenings]  # parallel to fri.query_rounds
    # second (challenge-dependent) trace commitment, empty when air.n_stage2 == 0
    stage2_cap: list[list[int]] = None
    stage2_zeta: list[tuple[int, int]] = None
    stage2_gzeta: list[tuple[int, int]] = None

    def __post_init__(self):
        if self.stage2_cap is None:
            self.stage2_cap = []
        if self.stage2_zeta is None:
            self.stage2_zeta = []
        if self.stage2_gzeta is None:
            self.stage2_gzeta = []


# ----------------------------------------------------------------------------
# host tables (cached per shape)
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _domain_table(log_n_ext: int, shift: int) -> np.ndarray:
    """x_i = shift * w^i over the extended domain, uint64."""
    w = gold.root_of_unity(log_n_ext)
    n = 1 << log_n_ext
    out = np.empty(n, dtype=np.uint64)
    cur = shift % P
    for i in range(n):
        out[i] = cur
        cur = (cur * w) % P
    return out


def _batch_inv(vals: list[int]) -> list[int]:
    """Montgomery batch inversion: one modular inverse + 3(n-1) muls."""
    n = len(vals)
    prefix = [1] * (n + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = (prefix[i] * v) % P
    inv_all = gold.inv(prefix[n])
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = (prefix[i] * inv_all) % P
        inv_all = (inv_all * vals[i]) % P
    return out


@lru_cache(maxsize=None)
def _point_inv_table(log_n_ext: int, shift: int, point: int) -> np.ndarray:
    """1/(x_i - point) over the extended domain (host, batch-inverted).
    Used for the 'first' (point=1) and 'last' (point=g^{n-1}) divisors —
    keeping these static tables off the device removes two unrolled
    exponentiation-based inversions from the quotient graph."""
    xs = _domain_table(log_n_ext, shift)
    vals = [int(x - point) % P for x in xs.tolist()]
    return np.array(_batch_inv(vals), dtype=np.uint64)


@lru_cache(maxsize=None)
def _zh_inv_table(log_n: int, rate_bits: int, shift: int) -> np.ndarray:
    """1/Z_H(x_i) over the extended domain. Z_H(x) = x^n - 1 is periodic with
    period 2^rate on the coset (x^n = shift^n * (w_ext^n)^i), so only
    2^rate inversions happen on host."""
    n = 1 << log_n
    n_ext = n << rate_bits
    w2 = pow(gold.root_of_unity(log_n + rate_bits), n, P)
    sn = pow(shift % P, n, P)
    vals = []
    cur = sn
    for _ in range(1 << rate_bits):
        vals.append(gold.inv((cur - 1) % P))
        cur = (cur * w2) % P
    return np.tile(np.array(vals, dtype=np.uint64), n_ext >> rate_bits)


# ----------------------------------------------------------------------------
# traced ext-scalar helpers
# ----------------------------------------------------------------------------


def _ext_to_device(v: tuple[int, int]):
    return gf64.from_u64(np.array([v[0] % P], np.uint64)), gf64.from_u64(
        np.array([v[1] % P], np.uint64)
    )


def _ext_vec_to_host(e) -> list[tuple[int, int]]:
    c0 = gf64.to_u64((np.asarray(e[0][0]), np.asarray(e[0][1])))
    c1 = gf64.to_u64((np.asarray(e[1][0]), np.asarray(e[1][1])))
    return [(int(a), int(b)) for a, b in zip(c0, c1)]


def _ext_powers_pow2(z, n: int):
    """[z^0 .. z^(n-1)] for power-of-two n by log2(n) doubling steps; z is a
    traced ext scalar of shape (1,)."""
    p = gf64.ext_full((1,), (1, 0))
    sq = z
    log_n = n.bit_length() - 1
    for _ in range(log_n):
        shifted = gf64.ext_mul(p, sq)
        p = tuple(
            (jnp.concatenate([a[0], b[0]]), jnp.concatenate([a[1], b[1]]))
            for a, b in zip(p, shifted)
        )
        sq = gf64.ext_square(sq)
    return p


def _ext_powers_seq(z, m: int):
    """[z^0 .. z^(m-1)] via lax.scan (any m); returns ext of shape (m,)."""

    def body(carry, _):
        return gf64.ext_mul(carry, z), carry

    one = gf64.ext_full((1,), (1, 0))
    _, ps = jax.lax.scan(body, one, None, length=m)
    # ps components have shape (m, 1)
    return tuple((c[0][:, 0], c[1][:, 0]) for c in ps)


def _ext_gather(e, idx):
    return tuple((c[0][idx], c[1][idx]) for c in e)


def _fold_cols_sum(x: Gl) -> Gl:
    """Sum over axis 1 of an (n, C) Gl array by log-depth pairwise adds
    (C need not be a power of two; graph size O(log C), not O(C))."""
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


def _sum_axis0(x: Gl) -> Gl:
    """Log-depth pairwise sum over axis 0 of an (n, C) Gl array, n a power
    of two."""
    lo, hi = x
    assert lo.shape[0] & (lo.shape[0] - 1) == 0
    while lo.shape[0] > 1:
        half = lo.shape[0] // 2
        lo, hi = gl_add((lo[:half], hi[:half]), (lo[half:], hi[half:]))
    return lo, hi


def _eval_columns_at(coeffs: Gl, powers):
    """Evaluate every column of an (n, C) base-coefficient matrix at the ext
    point whose power table is `powers`. Returns a device ext vector (C,)."""
    prod0 = gl_mul(coeffs, (powers[0][0][:, None], powers[0][1][:, None]))
    prod1 = gl_mul(coeffs, (powers[1][0][:, None], powers[1][1][:, None]))
    s0 = _sum_axis0(prod0)
    s1 = _sum_axis0(prod1)
    return (s0[0][0], s0[1][0]), (s1[0][0], s1[1][0])


class _LazyCols:
    """Sequence view over an (n, k) Gl matrix yielding per-column (n,)
    elements on demand. Frames hand this to Air.eval_constraints instead of a
    pre-sliced list: a 2000-column AIR traced eagerly pays ~4k slice ops per
    constraint-group program before DCE; lazily only the referenced columns
    are ever sliced (tracing time is what it costs — XLA DCEs either way)."""

    __slots__ = ("lo", "hi", "k", "roll", "_cache")

    def __init__(self, lde, k: int, roll: int = 0):
        """roll > 0: the next-row frame — each accessed column is rotated by
        -roll ON ACCESS instead of rolling the whole (n_ext, k) matrix up
        front. XLA fuses the rotation into the consumer, so no shifted copy
        of a multi-GB LDE is ever materialized (the old full-matrix roll was
        both the quotient phase's peak-memory driver and, in the chunked
        path, recomputed per group program)."""
        self.lo, self.hi = lde
        self.k = k
        self.roll = roll
        self._cache: dict = {}

    def __len__(self) -> int:
        return self.k

    def __getitem__(self, j):
        if isinstance(j, slice):
            return [self[i] for i in range(*j.indices(self.k))]
        if j < 0:
            j += self.k
        assert 0 <= j < self.k, (j, self.k)
        hit = self._cache.get(j)
        if hit is None:
            if self.roll:
                hit = (
                    jnp.roll(self.lo[:, j], -self.roll),
                    jnp.roll(self.hi[:, j], -self.roll),
                )
            else:
                hit = (self.lo[:, j], self.hi[:, j])
            self._cache[j] = hit
        return hit

    def __iter__(self):
        return (self[j] for j in range(self.k))

    def block(self, a: int, b: int):
        """Columns [a, b) as an (n, b-a) Gl matrix — one slice op (see
        air.frame_block); next-row frames rotate the block on access."""
        assert 0 <= a <= b <= self.k, (a, b, self.k)
        lo, hi = self.lo[:, a:b], self.hi[:, a:b]
        if self.roll:
            lo = jnp.roll(lo, -self.roll, axis=0)
            hi = jnp.roll(hi, -self.roll, axis=0)
        return lo, hi


_tree_layers = merkle_ops.tree_layers


def _as_tree(layers, cap_height: int) -> merkle_ops.PoseidonTree:
    return merkle_ops.PoseidonTree(layers=list(layers), cap_height=cap_height)


# ----------------------------------------------------------------------------
# compiled phase programs (cached per (air, shapes, config))
# ----------------------------------------------------------------------------


_FIXED_LDE_CACHE: dict = {}


def _fixed_lde_cached(air_key, air: Air, n: int, rate_bits: int, shift: int):
    """Device LDE of the AIR's preprocessed columns (never committed; the
    verifier evaluates the same known polynomials at zeta on host). Memoized
    by the VALUE key (air.cache_key()) — the air instance itself must not
    enter the key, or every fresh instance would rebuild (and the phase
    cache below would recompile; instances hash by identity)."""
    hit = _FIXED_LDE_CACHE.get((air_key, n, rate_bits, shift))
    if hit is not None:
        return hit
    table = air.fixed_columns(n)
    if table is None or table.shape[1] == 0:
        n_ext = n << rate_bits
        import jax.numpy as _jnp

        z = _jnp.zeros((n_ext, 0), _jnp.uint32)
        out = (z, z)
    else:
        fixed_gl = gf64.from_u64(np.asarray(table, np.uint64) % P)

        @jax.jit
        def build(x):
            coeffs = ntt_ops.ntt_cols(x, inverse=True)
            return ntt_ops.lde_cols(coeffs, rate_bits, shift)

        out = build(fixed_gl)
    _FIXED_LDE_CACHE[(air_key, n, rate_bits, shift)] = out
    return out


def _combine_alpha_device(
    constraints, alpha, alg: "DeviceAlgebra", offset: int = 0, pow_total: int | None = None
):
    """Width-aware alpha combination: constraint j's columns get consecutive
    alpha powers; returns {kind: ext accumulator} (device).

    offset/pow_total support chunked quotient compilation: a constraint GROUP
    passes its global starting offset and the global width total, so power
    assignment is identical to the single-program evaluation."""
    total = offset + sum(alg.width(v) for v, _ in constraints)
    if pow_total is not None:
        assert pow_total >= total
        total = pow_total
    w_pow2 = 1 << max(1, (total - 1).bit_length()) if total > 1 else 1
    pow_vec = _ext_powers_pow2(alpha, max(w_pow2, 2))  # ext, shape (>=total,)
    acc = {}
    for value, kind in constraints:
        w = alg.width(value)
        if w == 1:
            if value[0].ndim == 2:
                # squeeze an (n, 1) single-column matrix to (n,): mixing a
                # 2-D width-1 term with a 1-D one in the SAME kind's
                # accumulator broadcasts (n,1)+(n,) -> (n,n) — a silent
                # quadratic intermediate that cost the streamed Ed AIR a
                # 32 GB allocation at 2^16 rows (round-5 OOM; values were
                # still correct because later column reductions collapsed
                # the redundant axis)
                value = (value[0][:, 0], value[1][:, 0])
            a_o = _ext_gather(pow_vec, np.array([offset]))
            term = (gl_mul(value, a_o[0]), gl_mul(value, a_o[1]))
        else:
            rows = _ext_gather(pow_vec, np.arange(offset, offset + w))
            t0 = alg.sum_cols(gl_mul(value, (rows[0][0][None, :], rows[0][1][None, :])))
            t1 = alg.sum_cols(gl_mul(value, (rows[1][0][None, :], rows[1][1][None, :])))
            term = (t0, t1)
        acc[kind] = gf64.ext_add(acc[kind], term) if kind in acc else term
        offset += w
    return acc


@lru_cache(maxsize=None)
def _quotient_commit_fn(n: int, config: StarkConfig, shift: int, ch: int):
    """AIR-generic quotient commit: INTT over the extended domain, split into
    2^rate degree-n chunks, LDE, Poseidon tree. Cached per shape so every AIR
    with the same (n, config) reuses one compiled program."""
    blowup = config.blowup()

    @jax.jit
    def commit(q_cols):
        q_coeffs = ntt_ops.coset_intt_cols(q_cols, shift)  # (n_ext, 2)
        # chunk k, component c -> column 2k + c
        ch_lo = q_coeffs[0].reshape(blowup, n, 2).transpose(1, 0, 2).reshape(n, 2 * blowup)
        ch_hi = q_coeffs[1].reshape(blowup, n, 2).transpose(1, 0, 2).reshape(n, 2 * blowup)
        q_chunk_coeffs = (ch_lo, ch_hi)
        q_lde = ntt_ops.lde_cols(q_chunk_coeffs, config.rate_bits, shift)
        layers = _tree_layers((q_lde[0].T, q_lde[1].T), ch)
        return q_chunk_coeffs, q_lde, layers

    return commit


def _row_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    from blobstreamx_tpu.parallel.mesh import AXIS

    return NamedSharding(mesh, PartitionSpec(AXIS, None))


def _col_sharding(mesh):
    from jax.sharding import NamedSharding, PartitionSpec

    from blobstreamx_tpu.parallel.mesh import AXIS

    return NamedSharding(mesh, PartitionSpec(None, AXIS))


_PHASE_CACHE: dict = {}


def _phases(air_key, air: Air, n: int, n_pub: int, n_chal: int, config: StarkConfig, shift: int, mesh=None):
    """Compiled phase programs, memoized by (air.phase_key(), shapes,
    config, mesh) — NOT by the air instance (identity hash would force a
    retrace + recompile for every fresh Air(), and compile time dominates
    small proves). Two instances sharing a phase_key must define identical
    constraint graphs (Air.phase_key contract)."""
    memo_key = (air_key, n, n_pub, n_chal, config, shift, mesh)
    hit = _PHASE_CACHE.get(memo_key)
    if hit is not None:
        return hit
    hit = _build_phases(air, n, n_pub, n_chal, config, shift, mesh)
    _PHASE_CACHE[memo_key] = hit
    return hit


def _build_phases(air: Air, n: int, n_pub: int, n_chal: int, config: StarkConfig, shift: int, mesh=None):
    n_cols = air.n_cols
    blowup = config.blowup()
    n_ext = n * blowup
    log_n = n.bit_length() - 1
    log_n_ext = log_n + config.rate_bits
    g = gold.root_of_unity(log_n)
    g_last = pow(g, n - 1, P)
    ch = min(config.cap_height, (n_ext - 1).bit_length())

    def _make_commit(k_cols: int):
        def body(trace_gl):
            coeffs = ntt_ops.ntt_cols(trace_gl, inverse=True)
            lde = ntt_ops.lde_cols(coeffs, config.rate_bits, shift)
            if mesh is not None:
                # Explicit mesh schedule (SURVEY.md §2.3 DP + Ulysses): the
                # NTT / LDE above ran with COLUMNS sharded — per-column
                # transforms are chip-local, zero communication (strictly
                # better than any factorized exchange for column-batched
                # matrices; the six-step all_to_all NTT is for the single-
                # polynomial axis — the FRI codeword path). Hashing wants
                # LEAVES (rows of the extended matrix) local, so the phase
                # boundary is exactly ONE all-to-all re-shard, pinned here
                # instead of left to GSPMD's guesses.
                lde = jax.lax.with_sharding_constraint(lde, _row_sharding(mesh))
            layers = _tree_layers((lde[0].T, lde[1].T), ch)
            return coeffs, lde, layers

        if mesh is None:
            return jax.jit(body)
        cols_local = k_cols > 0 and k_cols % mesh.size == 0
        return jax.jit(
            body,
            in_shardings=(_col_sharding(mesh) if cols_local else _row_sharding(mesh),),
        )

    trace_commit = _make_commit(n_cols)
    s2_commit = _make_commit(air.n_stage2) if air.n_stage2 else trace_commit

    n_fixed = air.n_fixed
    n_s2 = air.n_stage2

    def _framed(trace_lde, s2_lde, pub_gl, fixed_lde, chal_gl):
        """Next-row frames roll lazily per accessed column (_LazyCols.roll):
        no full-matrix shifted LDE is materialized in ANY quotient program —
        the peak-memory fix that lets the 1069-column Ed AIR prove at 2^16
        rows on a 16 GB chip, and the chunked path stops re-rolling per
        group (ADVICE r2)."""

        def frame(lde, k):
            return _LazyCols(lde, k), _LazyCols(lde, k, roll=blowup)

        local, nxt = frame(trace_lde, n_cols)
        stage2, stage2_next = frame(s2_lde, n_s2)
        fixed, fixed_next = frame(fixed_lde, n_fixed)
        publics = [(pub_gl[0][j : j + 1], pub_gl[1][j : j + 1]) for j in range(n_pub)]
        chals = [(chal_gl[0][j : j + 1], chal_gl[1][j : j + 1]) for j in range(n_chal)]
        return local, nxt, publics, dict(
            fixed=fixed,
            fixed_next=fixed_next,
            challenges=chals,
            stage2=stage2,
            stage2_next=stage2_next,
        )

    def _divide_and_stack(acc):
        """{kind: ext accumulator} -> (n_ext, 2)-pair quotient columns."""
        x_tab = gf64.from_u64(_domain_table(log_n_ext, shift))
        zh_inv = gf64.from_u64(_zh_inv_table(log_n, config.rate_bits, shift))
        x_minus_last = gl_sub(x_tab, gf64.full((n_ext,), g_last))
        inv_by_kind = {}
        if "all" in acc:
            inv_by_kind["all"] = zh_inv
        if "transition" in acc:
            inv_by_kind["transition"] = gl_mul(zh_inv, x_minus_last)
        if "first" in acc:
            inv_by_kind["first"] = gf64.from_u64(_point_inv_table(log_n_ext, shift, 1))
        if "last" in acc:
            inv_by_kind["last"] = gf64.from_u64(_point_inv_table(log_n_ext, shift, g_last))

        q = None
        for kind, v in acc.items():
            inv_d = inv_by_kind[kind]
            term = (gl_mul(v[0], inv_d), gl_mul(v[1], inv_d))
            q = gf64.ext_add(q, term) if q is not None else term
        return (
            jnp.stack([q[0][0], q[1][0]], axis=1),
            jnp.stack([q[0][1], q[1][1]], axis=1),
        )

    # The quotient is split into jitted programs: the AIR-specific constraint
    # evaluation + divisor division, and the AIR-GENERIC commit (INTT,
    # chunking, LDE, tree). Smaller compiles beat one big one (XLA compile
    # time is superlinear in graph size) and the commit half is shared by
    # every AIR with the same (n, config). AIRs with n_constraint_groups > 1
    # additionally split constraint evaluation itself (see Air docstring).
    @jax.jit
    def quotient_eval(trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl):
        local, nxt, publics, fr = _framed(trace_lde, s2_lde, pub_gl, fixed_lde, chal_gl)
        alg = DeviceAlgebra((n_ext,))
        constraints = air.eval_constraints(local, nxt, publics, alg, **fr)
        for _, kind in constraints:
            assert kind in KINDS
        acc = _combine_alpha_device(constraints, alpha, alg)
        return _divide_and_stack(acc)

    q_commit = _quotient_commit_fn(n, config, shift, ch)
    n_groups = getattr(air, "n_constraint_groups", 1)

    if n_groups == 1:

        def quotient(trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl):
            q_cols = quotient_eval(trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl)
            return q_commit(q_cols)

    else:
        # ---- chunked quotient: one compiled program per constraint group ----
        # Pass 1 (abstract, no compile): learn each group's constraint widths
        # and kinds so global alpha offsets and the kind set are static.
        def _meta_of(g):
            kinds: list[str] = []
            widths: list[int] = []

            def probe(trace_lde, s2_lde, pub_gl, fixed_lde, chal_gl):
                local, nxt, publics, fr = _framed(
                    trace_lde, s2_lde, pub_gl, fixed_lde, chal_gl
                )
                alg = DeviceAlgebra((n_ext,))
                cons = air.eval_constraint_group(g, local, nxt, publics, alg, **fr)
                for v, k in cons:
                    assert k in KINDS
                    kinds.append(k)
                    widths.append(alg.width(v))
                return [v for v, _ in cons]

            lde_s = jax.ShapeDtypeStruct((n_ext, n_cols), jnp.uint32)
            s2_s = jax.ShapeDtypeStruct((n_ext, n_s2), jnp.uint32)
            fx_s = jax.ShapeDtypeStruct((n_ext, n_fixed), jnp.uint32)
            pub_s = jax.ShapeDtypeStruct((n_pub,), jnp.uint32)
            ch_s = jax.ShapeDtypeStruct((n_chal,), jnp.uint32)
            jax.eval_shape(
                probe, (lde_s, lde_s), (s2_s, s2_s), (pub_s, pub_s), (fx_s, fx_s), (ch_s, ch_s)
            )
            return widths, kinds

        group_meta = [_meta_of(g) for g in range(n_groups)]
        pow_total = sum(sum(w) for w, _ in group_meta)
        kinds_used = [
            k for k in KINDS if any(k in kinds for _, kinds in group_meta)
        ]
        offsets = []
        off = 0
        for widths, _ in group_meta:
            offsets.append(off)
            off += sum(widths)

        def _make_group_fn(g, offset):
            @jax.jit
            def group_fn(trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl):
                local, nxt, publics, fr = _framed(
                    trace_lde, s2_lde, pub_gl, fixed_lde, chal_gl
                )
                alg = DeviceAlgebra((n_ext,))
                cons = air.eval_constraint_group(g, local, nxt, publics, alg, **fr)
                acc = _combine_alpha_device(
                    cons, alpha, alg, offset=offset, pow_total=pow_total
                )
                zero = gf64.ext_zeros((n_ext,))
                return tuple(acc.get(k, zero) for k in kinds_used)

            return group_fn

        group_fns = [_make_group_fn(g, offsets[g]) for g in range(n_groups)]

        @jax.jit
        def q_from_parts(parts):
            # field addition is exact and associative: summing per-group
            # accumulators reproduces the single-program accumulator bit-exactly
            acc = {}
            for i, kind in enumerate(kinds_used):
                v = parts[0][i]
                for p in parts[1:]:
                    v = gf64.ext_add(v, p[i])
                acc[kind] = v
            return _divide_and_stack(acc)

        def quotient(trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl):
            args = (trace_lde, s2_lde, pub_gl, alpha, fixed_lde, chal_gl)
            parts = [fn(*args) for fn in group_fns]
            return q_commit(q_from_parts(parts))

    @jax.jit
    def openings(trace_coeffs, s2_coeffs, q_chunk_coeffs, zeta, g_zeta):
        pz = _ext_powers_pow2(zeta, n)
        pgz = _ext_powers_pow2(g_zeta, n)
        return (
            _eval_columns_at(trace_coeffs, pz),
            _eval_columns_at(trace_coeffs, pgz),
            _eval_columns_at(s2_coeffs, pz),
            _eval_columns_at(s2_coeffs, pgz),
            _eval_columns_at(q_chunk_coeffs, pz),
        )

    n_wit = n_cols + n_s2  # witness columns opened at both zeta and g*zeta
    m_pows = 2 * n_wit + 2 * blowup

    @jax.jit
    def deep(trace_lde, s2_lde, q_lde, zeta, g_zeta, gamma, tz, tgz, s2z, s2gz, qz):
        g_pows = _ext_powers_seq(gamma, m_pows)  # ext (m,)
        idx_a = np.concatenate([np.arange(n_wit), 2 * n_wit + np.arange(2 * blowup)])
        idx_b = n_wit + np.arange(n_wit)
        gp_a = _ext_gather(g_pows, idx_a)  # (W + 2B,)
        gp_b = _ext_gather(g_pows, idx_b)  # (W,)

        wit_lde = (
            jnp.concatenate([trace_lde[0], s2_lde[0]], axis=1),
            jnp.concatenate([trace_lde[1], s2_lde[1]], axis=1),
        )
        cols_a = (
            jnp.concatenate([wit_lde[0], q_lde[0]], axis=1),
            jnp.concatenate([wit_lde[1], q_lde[1]], axis=1),
        )
        open_a = tuple(
            (jnp.concatenate([a[0], s[0], b[0]]), jnp.concatenate([a[1], s[1], b[1]]))
            for a, s, b in zip(tz, s2z, qz)
        )
        open_b = tuple(
            (jnp.concatenate([a[0], s[0]]), jnp.concatenate([a[1], s[1]]))
            for a, s in zip(tgz, s2gz)
        )
        # A(x) = sum_t gp_a[t] * col_t(x); c_a = sum_t gp_a[t] * opened_t
        a0 = _fold_cols_sum(gl_mul(cols_a, (gp_a[0][0][None, :], gp_a[0][1][None, :])))
        a1 = _fold_cols_sum(gl_mul(cols_a, (gp_a[1][0][None, :], gp_a[1][1][None, :])))
        ca = gf64.ext_mul(gp_a, open_a)
        ca = tuple(_sum_axis0_vec(c) for c in ca)
        b0 = _fold_cols_sum(gl_mul(wit_lde, (gp_b[0][0][None, :], gp_b[0][1][None, :])))
        b1 = _fold_cols_sum(gl_mul(wit_lde, (gp_b[1][0][None, :], gp_b[1][1][None, :])))
        cb = gf64.ext_mul(gp_b, open_b)
        cb = tuple(_sum_axis0_vec(c) for c in cb)

        x_tab = gf64.from_u64(_domain_table(log_n_ext, shift))
        x_ext = gf64.ext_from_base(x_tab)
        inv_xz = gf64.ext_inv(gf64.ext_sub(x_ext, _bcast(zeta)))
        inv_xgz = gf64.ext_inv(gf64.ext_sub(x_ext, _bcast(g_zeta)))
        num_a = gf64.ext_sub((a0, a1), _bcast2(ca))
        num_b = gf64.ext_sub((b0, b1), _bcast2(cb))
        return gf64.ext_add(gf64.ext_mul(num_a, inv_xz), gf64.ext_mul(num_b, inv_xgz))

    return trace_commit, s2_commit, quotient, openings, deep


def _bcast(z):
    """Broadcast an ext scalar (1,) against (n,) arrays (jnp handles it)."""
    return z


def _bcast2(z):
    return z


def _sum_axis0_vec(x: Gl) -> Gl:
    """Sum a (C,) Gl vector to a (1,) scalar by log-depth pairwise adds."""
    lo, hi = x
    while lo.shape[0] > 1:
        k = lo.shape[0]
        half = k // 2
        s = gl_add((lo[:half], hi[:half]), (lo[half : 2 * half], hi[half : 2 * half]))
        if k % 2:
            lo = jnp.concatenate([s[0], lo[-1:]])
            hi = jnp.concatenate([s[1], hi[-1:]])
        else:
            lo, hi = s
    return lo, hi


def _observe_cap(challenger: Challenger, cap_ints) -> None:
    for digest in cap_ints:
        challenger.observe_many(digest)


def _observe_ext(challenger: Challenger, v: tuple[int, int]) -> None:
    challenger.observe(v[0])
    challenger.observe(v[1])


# ----------------------------------------------------------------------------
# prover
# ----------------------------------------------------------------------------


def prove(
    air: Air,
    trace: np.ndarray,
    publics: list[int],
    config: StarkConfig,
    shift: int = gold.COSET_SHIFT,
    aux=None,
    mesh=None,
) -> StarkProof:
    """trace: (n_rows, n_cols) uint64 execution trace (rows over the subgroup
    H of order n_rows, natural order). aux: post-commit claims for AIRs with
    sample_challenges (observed into the transcript before sampling).

    mesh: optional jax.sharding.Mesh — the multi-chip path (SURVEY.md §2.2
    C11's TPU equivalent: data-parallel sharding within one pjit program, no
    proof recursion). Explicit per-phase schedule (not GSPMD guesswork):
    trace/stage2 commit runs with COLUMNS sharded (per-column NTT/LDE is
    chip-local, zero comm) and re-shards ONCE to rows for Merkle leaf
    hashing; constraint evaluation, quotient and DEEP composition are
    row-parallel (the next-row frame's roll becomes a boundary ppermute);
    the FRI fold runs in a pair-local layout (fri_ext._layer_fns_mesh) with
    one re-pairing collective per layer. Bit-exact with the single-chip path
    (integer ops; reduction trees are data-independent)."""
    n, n_cols = trace.shape
    assert n & (n - 1) == 0
    assert n_cols == air.n_cols
    assert air.max_degree <= config.blowup(), "rate too low for constraint degree"
    log_n = n.bit_length() - 1
    blowup = config.blowup()
    n_ext = n * blowup
    g = gold.root_of_unity(log_n)
    ch = min(config.cap_height, (n_ext - 1).bit_length())

    challenger = Challenger()
    challenger.observe_many([v % P for v in publics])

    trace_gl = gf64.from_u64(trace)
    fixed_lde = _fixed_lde_cached(air.cache_key(), air, n, config.rate_bits, shift)
    if mesh is not None:
        fixed_lde = jax.device_put(fixed_lde, _row_sharding(mesh))
    f_commit, f_s2_commit, f_quotient, f_openings, f_deep = _phases(
        air.phase_key(), air, n, len(publics), air.n_challenges, config, shift, mesh
    )
    trace_coeffs, trace_lde, t_layers = f_commit(trace_gl)
    trace_tree = _as_tree(t_layers, ch)
    trace_cap = merkle_ops.cap_to_ints(trace_tree)
    _observe_cap(challenger, trace_cap)

    air.observe_aux(challenger, aux)
    chals = air.sample_challenges(challenger, aux)
    assert len(chals) == air.n_challenges
    chal_gl = gf64.from_u64(np.array([v % P for v in chals], np.uint64))

    # stage 2: challenge-dependent columns, committed AFTER sampling
    n_s2 = air.n_stage2
    if n_s2:
        s2 = air.build_stage2(trace, chals, aux)
        assert s2.shape == (n, n_s2)
        s2_gl = gf64.from_u64(np.asarray(s2, np.uint64) % P)
        s2_coeffs, s2_lde, s2_layers = f_s2_commit(s2_gl)
        s2_tree = _as_tree(s2_layers, ch)
        s2_cap = merkle_ops.cap_to_ints(s2_tree)
        _observe_cap(challenger, s2_cap)
    else:
        z = jnp.zeros((n, 0), jnp.uint32)
        ze = jnp.zeros((n_ext, 0), jnp.uint32)
        s2_coeffs, s2_lde, s2_tree, s2_cap = (z, z), (ze, ze), None, []

    alpha = challenger.sample_ext()
    pub_gl = gf64.from_u64(np.array([v % P for v in publics], np.uint64))
    q_chunk_coeffs, q_lde, q_layers = f_quotient(
        trace_lde, s2_lde, pub_gl, _ext_to_device(alpha), fixed_lde, chal_gl
    )
    q_tree = _as_tree(q_layers, ch)
    q_cap = merkle_ops.cap_to_ints(q_tree)
    _observe_cap(challenger, q_cap)

    zeta = challenger.sample_ext()
    g_zeta = gold.ext_mul(zeta, (g, 0))
    tz_d, tgz_d, s2z_d, s2gz_d, qz_d = f_openings(
        trace_coeffs, s2_coeffs, q_chunk_coeffs, _ext_to_device(zeta), _ext_to_device(g_zeta)
    )
    trace_zeta = _ext_vec_to_host(tz_d)
    trace_gzeta = _ext_vec_to_host(tgz_d)
    stage2_zeta = _ext_vec_to_host(s2z_d)
    stage2_gzeta = _ext_vec_to_host(s2gz_d)
    quotient_zeta = _ext_vec_to_host(qz_d)
    for v in trace_zeta + trace_gzeta + stage2_zeta + stage2_gzeta + quotient_zeta:
        _observe_ext(challenger, v)

    gamma = challenger.sample_ext()
    deep_cw = f_deep(
        trace_lde,
        s2_lde,
        q_lde,
        _ext_to_device(zeta),
        _ext_to_device(g_zeta),
        _ext_to_device(gamma),
        tz_d,
        tgz_d,
        s2z_d,
        s2gz_d,
        qz_d,
    )

    fri_proof, indices = fri_prove_ext(deep_cw, config.fri(), challenger, shift, mesh=mesh)

    t_host = gf64.to_u64(trace_lde)
    q_host = gf64.to_u64(q_lde)
    s2_host = gf64.to_u64(s2_lde) if n_s2 else None
    half = n_ext // 2
    openings = []
    for idx in indices:
        i = idx % half
        sources = [(t_host, trace_tree), (q_host, q_tree)]
        if n_s2:
            sources.append((s2_host, s2_tree))
        rows = []
        for host, tree in sources:
            pair = []
            for posn in (i, i + half):
                path, _ = tree.path(posn)
                pair.append(RowOpening(row=[int(v) for v in host[posn]], path=path))
            rows.append((pair[0], pair[1]))
        openings.append(
            QueryOpenings(
                trace=rows[0], quotient=rows[1], stage2=rows[2] if n_s2 else None
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


# ----------------------------------------------------------------------------
# verifier (host, pure python ints)
# ----------------------------------------------------------------------------


_FIXED_COEFFS_CACHE: dict = {}


def _fixed_coeffs_host(air_key, air: Air, n: int):
    """Host (python-int) coefficient vectors of the AIR's preprocessed
    columns — the verifier evaluates these known polynomials at zeta itself,
    independently of the device. Memoized by value key, not instance."""
    hit = _FIXED_COEFFS_CACHE.get((air_key, n))
    if hit is not None:
        return hit
    table = air.fixed_columns(n)
    if table is None or table.shape[1] == 0:
        out = []
    else:
        out = [
            golden_ntt.intt([int(v) % P for v in table[:, j]])
            for j in range(table.shape[1])
        ]
    _FIXED_COEFFS_CACHE[(air_key, n)] = out
    return out


def _eval_fixed_host(coeff_cols, z: tuple[int, int]) -> list[tuple[int, int]]:
    """Evaluate each fixed-column polynomial (base coeffs) at the ext point z."""
    if not coeff_cols:
        return []
    n = len(coeff_cols[0])
    pows = [(1, 0)]
    for _ in range(n - 1):
        pows.append(gold.ext_mul(pows[-1], z))
    out = []
    for coeffs in coeff_cols:
        a0 = a1 = 0
        for c, (z0, z1) in zip(coeffs, pows):
            if c:
                a0 += c * z0
                a1 += c * z1
        out.append((a0 % P, a1 % P))
    return out


def _combine_alpha_host(constraints, alpha, alg: HostExtAlgebra):
    """Width-aware alpha combination on host — same power assignment as
    _combine_alpha_device (constraint order and widths define it)."""
    acc: dict[str, tuple[int, int]] = {}
    offset = 0
    cur = (1, 0)
    pows = []
    total = sum(alg.width(v) for v, _ in constraints)
    for _ in range(total):
        pows.append(cur)
        cur = gold.ext_mul(cur, alpha)
    for value, kind in constraints:
        w = alg.width(value)
        if w == 1:
            if isinstance(value, list):
                # a single-column matrix constraint (e.g. the Ed AIR's
                # logUp table wells when the range table fits ONE column,
                # nt=1 at 2^16 rows) arrives as a 1-element list; unwrap it
                # — ext_mul(list, pow) would "multiply" the LIST by a
                # ~2^64 field element (python list repetition, MemoryError).
                # Device-side twin: _combine_alpha_device's (n,1) squeeze.
                value = value[0]
            term = gold.ext_mul(value, pows[offset])
        else:
            term = (0, 0)
            for j in range(w):
                term = gold.ext_add(term, gold.ext_mul(value[j], pows[offset + j]))
        acc[kind] = gold.ext_add(acc.get(kind, (0, 0)), term)
        offset += w
    return acc


def _host_divisor_inv(kind: str, zeta, n: int, g_last: int):
    zh = gold.ext_sub(gold.ext_exp(zeta, n), (1, 0))
    if kind == "all":
        return gold.ext_inv(zh)
    if kind == "transition":
        return gold.ext_mul(gold.ext_inv(zh), gold.ext_sub(zeta, (g_last, 0)))
    if kind == "first":
        return gold.ext_inv(gold.ext_sub(zeta, (1, 0)))
    if kind == "last":
        return gold.ext_inv(gold.ext_sub(zeta, (g_last, 0)))
    raise ValueError(kind)


def verify(
    air: Air,
    proof: StarkProof,
    publics: list[int],
    config: StarkConfig,
    n: int,
    shift: int = gold.COSET_SHIFT,
    aux=None,
) -> bool:
    n_cols = air.n_cols
    blowup = config.blowup()
    n_ext = n * blowup
    log_n = n.bit_length() - 1
    log_n_ext = log_n + config.rate_bits
    g = gold.root_of_unity(log_n)
    g_last = pow(g, n - 1, P)
    w_ext = gold.root_of_unity(log_n_ext)

    n_s2 = air.n_stage2
    if len(proof.trace_zeta) != n_cols or len(proof.trace_gzeta) != n_cols:
        return False
    if len(proof.quotient_zeta) != 2 * blowup:
        return False
    if len(proof.stage2_zeta) != n_s2 or len(proof.stage2_gzeta) != n_s2:
        return False
    if n_s2 and not proof.stage2_cap:
        return False

    challenger = Challenger()
    challenger.observe_many([v % P for v in publics])
    for digest in proof.trace_cap:
        challenger.observe_many(digest)
    air.observe_aux(challenger, aux)
    chals = air.sample_challenges(challenger, aux)
    if len(chals) != air.n_challenges:
        return False
    if n_s2:
        for digest in proof.stage2_cap:
            challenger.observe_many(digest)
    alpha = challenger.sample_ext()
    for digest in proof.quotient_cap:
        challenger.observe_many(digest)
    zeta = challenger.sample_ext()
    for v in (
        proof.trace_zeta
        + proof.trace_gzeta
        + proof.stage2_zeta
        + proof.stage2_gzeta
        + proof.quotient_zeta
    ):
        _observe_ext(challenger, v)
    gamma = challenger.sample_ext()

    # --- ALI identity at zeta ----------------------------------------------
    alg = HostExtAlgebra()
    g_zeta = gold.ext_mul(zeta, (g, 0))
    pub_elems = [(v % P, 0) for v in publics]
    fixed_coeffs = _fixed_coeffs_host(air.cache_key(), air, n)
    fixed_zeta = _eval_fixed_host(fixed_coeffs, zeta)
    fixed_gzeta = _eval_fixed_host(fixed_coeffs, g_zeta)
    chal_elems = [(v % P, 0) for v in chals]
    constraints = air.eval_constraints(
        list(proof.trace_zeta),
        list(proof.trace_gzeta),
        pub_elems,
        alg,
        fixed=fixed_zeta,
        fixed_next=fixed_gzeta,
        challenges=chal_elems,
        stage2=list(proof.stage2_zeta),
        stage2_next=list(proof.stage2_gzeta),
    )
    acc = _combine_alpha_host(constraints, alpha, alg)
    lhs = (0, 0)
    for kind, v in acc.items():
        lhs = gold.ext_add(lhs, gold.ext_mul(v, _host_divisor_inv(kind, zeta, n, g_last)))
    zeta_n = gold.ext_exp(zeta, n)
    rhs = (0, 0)
    zp = (1, 0)
    for k in range(blowup):
        qk = gold.ext_add(
            proof.quotient_zeta[2 * k],
            gold.ext_mul(U, proof.quotient_zeta[2 * k + 1]),
        )
        rhs = gold.ext_add(rhs, gold.ext_mul(zp, qk))
        zp = gold.ext_mul(zp, zeta_n)
    if lhs != rhs:
        return False

    # --- DEEP recomputation + FRI ------------------------------------------
    n_wit = n_cols + n_s2
    g_pows = []
    cur = (1, 0)
    for _ in range(2 * n_wit + 2 * blowup):
        g_pows.append(cur)
        cur = gold.ext_mul(cur, gamma)
    wit_zeta = proof.trace_zeta + proof.stage2_zeta
    wit_gzeta = proof.trace_gzeta + proof.stage2_gzeta

    half = n_ext // 2
    query_state = {"round": -1}

    def deep_at(posn: int, row_w: list[int], row_q: list[int]):
        x = gold.mul(shift % P, pow(w_ext, posn, P))
        inv_xz = gold.ext_inv(gold.ext_sub((x, 0), zeta))
        inv_xgz = gold.ext_inv(gold.ext_sub((x, 0), g_zeta))
        num_a = (0, 0)
        num_b = (0, 0)
        for j in range(n_wit):
            tv = (row_w[j] % P, 0)
            num_a = gold.ext_add(
                num_a, gold.ext_mul(g_pows[j], gold.ext_sub(tv, wit_zeta[j]))
            )
            num_b = gold.ext_add(
                num_b,
                gold.ext_mul(g_pows[n_wit + j], gold.ext_sub(tv, wit_gzeta[j])),
            )
        for k in range(2 * blowup):
            qv = (row_q[k] % P, 0)
            num_a = gold.ext_add(
                num_a,
                gold.ext_mul(
                    g_pows[2 * n_wit + k], gold.ext_sub(qv, proof.quotient_zeta[k])
                ),
            )
        return gold.ext_add(gold.ext_mul(num_a, inv_xz), gold.ext_mul(num_b, inv_xgz))

    def layer0_check(i: int, pair) -> bool:
        query_state["round"] += 1
        r = query_state["round"]
        if r >= len(proof.openings):
            return False
        q = proof.openings[r]
        if n_s2 and q.stage2 is None:
            return False
        for side, (posn, want) in enumerate(((i, pair[0]), (i + half, pair[1]))):
            row_open_t = q.trace[side]
            row_open_q = q.quotient[side]
            if len(row_open_t.row) != n_cols or len(row_open_q.row) != 2 * blowup:
                return False
            if not poseidon_verify_path(
                proof.trace_cap, [v % P for v in row_open_t.row], posn, row_open_t.path
            ):
                return False
            if not poseidon_verify_path(
                proof.quotient_cap, [v % P for v in row_open_q.row], posn, row_open_q.path
            ):
                return False
            row_w = list(row_open_t.row)
            if n_s2:
                row_open_s2 = q.stage2[side]
                if len(row_open_s2.row) != n_s2:
                    return False
                if not poseidon_verify_path(
                    proof.stage2_cap,
                    [v % P for v in row_open_s2.row],
                    posn,
                    row_open_s2.path,
                ):
                    return False
                row_w += list(row_open_s2.row)
            if deep_at(posn, row_w, row_open_q.row) != want:
                return False
        return True

    return fri_verify_ext(
        proof.fri, n_ext, config.fri(), challenger, shift, layer0_check=layer0_check
    )
