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


@dataclass
class StarkProof:
    trace_cap: list[list[int]]
    quotient_cap: list[list[int]]
    trace_zeta: list[tuple[int, int]]  # per trace column, ext
    trace_gzeta: list[tuple[int, int]]
    quotient_zeta: list[tuple[int, int]]  # per quotient base column (2 per chunk)
    fri: FriExtProof
    openings: list[QueryOpenings]  # parallel to fri.query_rounds


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
    """Sum over axis 1 of an (n, C) Gl array (static C, unrolled adds)."""
    acc = (x[0][:, 0], x[1][:, 0])
    for j in range(1, x[0].shape[1]):
        acc = gl_add(acc, (x[0][:, j], x[1][:, j]))
    return acc


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


_tree_layers = merkle_ops.tree_layers


def _as_tree(layers, cap_height: int) -> merkle_ops.PoseidonTree:
    return merkle_ops.PoseidonTree(layers=list(layers), cap_height=cap_height)


# ----------------------------------------------------------------------------
# compiled phase programs (cached per (air, shapes, config))
# ----------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _phases(air_key, air: Air, n: int, n_pub: int, config: StarkConfig, shift: int):
    n_cols = air.n_cols
    blowup = config.blowup()
    n_ext = n * blowup
    log_n = n.bit_length() - 1
    log_n_ext = log_n + config.rate_bits
    g = gold.root_of_unity(log_n)
    g_last = pow(g, n - 1, P)
    ch = min(config.cap_height, (n_ext - 1).bit_length())

    @jax.jit
    def trace_commit(trace_gl):
        coeffs = ntt_ops.ntt_cols(trace_gl, inverse=True)
        lde = ntt_ops.lde_cols(coeffs, config.rate_bits, shift)
        layers = _tree_layers((lde[0].T, lde[1].T), ch)
        return coeffs, lde, layers

    @jax.jit
    def quotient(trace_lde, pub_gl, alpha):
        local = [(trace_lde[0][:, j], trace_lde[1][:, j]) for j in range(n_cols)]
        nxt_lo = jnp.roll(trace_lde[0], -blowup, axis=0)
        nxt_hi = jnp.roll(trace_lde[1], -blowup, axis=0)
        nxt = [(nxt_lo[:, j], nxt_hi[:, j]) for j in range(n_cols)]
        publics = [(pub_gl[0][j : j + 1], pub_gl[1][j : j + 1]) for j in range(n_pub)]
        alg = DeviceAlgebra((n_ext,))
        constraints = air.eval_constraints(local, nxt, publics, alg)

        acc = {}
        a_pow = gf64.ext_full((1,), (1, 0))
        for value, kind in constraints:
            assert kind in KINDS
            term = (gl_mul(value, a_pow[0]), gl_mul(value, a_pow[1]))
            acc[kind] = gf64.ext_add(acc[kind], term) if kind in acc else term
            a_pow = gf64.ext_mul(a_pow, alpha)

        x_tab = gf64.from_u64(_domain_table(log_n_ext, shift))
        zh_inv = gf64.from_u64(_zh_inv_table(log_n, config.rate_bits, shift))
        x_minus_last = gl_sub(x_tab, gf64.full((n_ext,), g_last))
        inv_by_kind = {}
        if "all" in acc:
            inv_by_kind["all"] = zh_inv
        if "transition" in acc:
            inv_by_kind["transition"] = gl_mul(zh_inv, x_minus_last)
        if "first" in acc:
            inv_by_kind["first"] = gf64.gl_inv(gl_sub(x_tab, gf64.full((n_ext,), 1)))
        if "last" in acc:
            inv_by_kind["last"] = gf64.gl_inv(x_minus_last)

        q = None
        for kind, v in acc.items():
            inv_d = inv_by_kind[kind]
            term = (gl_mul(v[0], inv_d), gl_mul(v[1], inv_d))
            q = gf64.ext_add(q, term) if q is not None else term

        q_cols = (
            jnp.stack([q[0][0], q[1][0]], axis=1),
            jnp.stack([q[0][1], q[1][1]], axis=1),
        )
        q_coeffs = ntt_ops.coset_intt_cols(q_cols, shift)  # (n_ext, 2)
        # chunk k, component c -> column 2k + c
        ch_lo = q_coeffs[0].reshape(blowup, n, 2).transpose(1, 0, 2).reshape(n, 2 * blowup)
        ch_hi = q_coeffs[1].reshape(blowup, n, 2).transpose(1, 0, 2).reshape(n, 2 * blowup)
        q_chunk_coeffs = (ch_lo, ch_hi)
        q_lde = ntt_ops.lde_cols(q_chunk_coeffs, config.rate_bits, shift)
        layers = _tree_layers((q_lde[0].T, q_lde[1].T), ch)
        return q_chunk_coeffs, q_lde, layers

    @jax.jit
    def openings(trace_coeffs, q_chunk_coeffs, zeta, g_zeta):
        pz = _ext_powers_pow2(zeta, n)
        pgz = _ext_powers_pow2(g_zeta, n)
        return (
            _eval_columns_at(trace_coeffs, pz),
            _eval_columns_at(trace_coeffs, pgz),
            _eval_columns_at(q_chunk_coeffs, pz),
        )

    m_pows = 2 * n_cols + 2 * blowup

    @jax.jit
    def deep(trace_lde, q_lde, zeta, g_zeta, gamma, tz, tgz, qz):
        g_pows = _ext_powers_seq(gamma, m_pows)  # ext (m,)
        idx_a = np.concatenate([np.arange(n_cols), 2 * n_cols + np.arange(2 * blowup)])
        idx_b = n_cols + np.arange(n_cols)
        gp_a = _ext_gather(g_pows, idx_a)  # (C + 2B,)
        gp_b = _ext_gather(g_pows, idx_b)  # (C,)

        cols_a = (
            jnp.concatenate([trace_lde[0], q_lde[0]], axis=1),
            jnp.concatenate([trace_lde[1], q_lde[1]], axis=1),
        )
        open_a = tuple(
            (jnp.concatenate([a[0], b[0]]), jnp.concatenate([a[1], b[1]]))
            for a, b in zip(tz, qz)
        )
        # A(x) = sum_t gp_a[t] * col_t(x); c_a = sum_t gp_a[t] * opened_t
        a0 = _fold_cols_sum(gl_mul(cols_a, (gp_a[0][0][None, :], gp_a[0][1][None, :])))
        a1 = _fold_cols_sum(gl_mul(cols_a, (gp_a[1][0][None, :], gp_a[1][1][None, :])))
        ca = gf64.ext_mul(gp_a, open_a)
        ca = tuple(_sum_axis0_vec(c) for c in ca)
        b0 = _fold_cols_sum(gl_mul(trace_lde, (gp_b[0][0][None, :], gp_b[0][1][None, :])))
        b1 = _fold_cols_sum(gl_mul(trace_lde, (gp_b[1][0][None, :], gp_b[1][1][None, :])))
        cb = gf64.ext_mul(gp_b, tgz)
        cb = tuple(_sum_axis0_vec(c) for c in cb)

        x_tab = gf64.from_u64(_domain_table(log_n_ext, shift))
        x_ext = gf64.ext_from_base(x_tab)
        inv_xz = gf64.ext_inv(gf64.ext_sub(x_ext, _bcast(zeta)))
        inv_xgz = gf64.ext_inv(gf64.ext_sub(x_ext, _bcast(g_zeta)))
        num_a = gf64.ext_sub((a0, a1), _bcast2(ca))
        num_b = gf64.ext_sub((b0, b1), _bcast2(cb))
        return gf64.ext_add(gf64.ext_mul(num_a, inv_xz), gf64.ext_mul(num_b, inv_xgz))

    return trace_commit, quotient, openings, deep


def _bcast(z):
    """Broadcast an ext scalar (1,) against (n,) arrays (jnp handles it)."""
    return z


def _bcast2(z):
    return z


def _sum_axis0_vec(x: Gl) -> Gl:
    """Sum a (C,) Gl vector to a (1,) scalar (C static, unrolled)."""
    acc = (x[0][0:1], x[1][0:1])
    for j in range(1, x[0].shape[0]):
        acc = gl_add(acc, (x[0][j : j + 1], x[1][j : j + 1]))
    return acc


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
) -> StarkProof:
    """trace: (n_rows, n_cols) uint64 execution trace (rows over the subgroup
    H of order n_rows, natural order)."""
    n, n_cols = trace.shape
    assert n & (n - 1) == 0
    assert n_cols == air.n_cols
    assert air.max_degree <= config.blowup(), "rate too low for constraint degree"
    log_n = n.bit_length() - 1
    blowup = config.blowup()
    n_ext = n * blowup
    g = gold.root_of_unity(log_n)
    ch = min(config.cap_height, (n_ext - 1).bit_length())

    f_commit, f_quotient, f_openings, f_deep = _phases(
        air.cache_key(), air, n, len(publics), config, shift
    )

    challenger = Challenger()
    challenger.observe_many([v % P for v in publics])

    trace_gl = gf64.from_u64(trace)
    trace_coeffs, trace_lde, t_layers = f_commit(trace_gl)
    trace_tree = _as_tree(t_layers, ch)
    trace_cap = merkle_ops.cap_to_ints(trace_tree)
    _observe_cap(challenger, trace_cap)

    alpha = challenger.sample_ext()
    pub_gl = gf64.from_u64(np.array([v % P for v in publics], np.uint64))
    q_chunk_coeffs, q_lde, q_layers = f_quotient(trace_lde, pub_gl, _ext_to_device(alpha))
    q_tree = _as_tree(q_layers, ch)
    q_cap = merkle_ops.cap_to_ints(q_tree)
    _observe_cap(challenger, q_cap)

    zeta = challenger.sample_ext()
    g_zeta = gold.ext_mul(zeta, (g, 0))
    tz_d, tgz_d, qz_d = f_openings(
        trace_coeffs, q_chunk_coeffs, _ext_to_device(zeta), _ext_to_device(g_zeta)
    )
    trace_zeta = _ext_vec_to_host(tz_d)
    trace_gzeta = _ext_vec_to_host(tgz_d)
    quotient_zeta = _ext_vec_to_host(qz_d)
    for v in trace_zeta + trace_gzeta + quotient_zeta:
        _observe_ext(challenger, v)

    gamma = challenger.sample_ext()
    deep_cw = f_deep(
        trace_lde,
        q_lde,
        _ext_to_device(zeta),
        _ext_to_device(g_zeta),
        _ext_to_device(gamma),
        tz_d,
        tgz_d,
        qz_d,
    )

    fri_proof, indices = fri_prove_ext(deep_cw, config.fri(), challenger, shift)

    t_host = gf64.to_u64(trace_lde)
    q_host = gf64.to_u64(q_lde)
    half = n_ext // 2
    openings = []
    for idx in indices:
        i = idx % half
        rows = []
        for host, tree in ((t_host, trace_tree), (q_host, q_tree)):
            pair = []
            for posn in (i, i + half):
                path, _ = tree.path(posn)
                pair.append(RowOpening(row=[int(v) for v in host[posn]], path=path))
            rows.append((pair[0], pair[1]))
        openings.append(QueryOpenings(trace=rows[0], quotient=rows[1]))

    return StarkProof(
        trace_cap=trace_cap,
        quotient_cap=q_cap,
        trace_zeta=trace_zeta,
        trace_gzeta=trace_gzeta,
        quotient_zeta=quotient_zeta,
        fri=fri_proof,
        openings=openings,
    )


# ----------------------------------------------------------------------------
# verifier (host, pure python ints)
# ----------------------------------------------------------------------------


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
) -> bool:
    n_cols = air.n_cols
    blowup = config.blowup()
    n_ext = n * blowup
    log_n = n.bit_length() - 1
    log_n_ext = log_n + config.rate_bits
    g = gold.root_of_unity(log_n)
    g_last = pow(g, n - 1, P)
    w_ext = gold.root_of_unity(log_n_ext)

    if len(proof.trace_zeta) != n_cols or len(proof.trace_gzeta) != n_cols:
        return False
    if len(proof.quotient_zeta) != 2 * blowup:
        return False

    challenger = Challenger()
    challenger.observe_many([v % P for v in publics])
    for digest in proof.trace_cap:
        challenger.observe_many(digest)
    alpha = challenger.sample_ext()
    for digest in proof.quotient_cap:
        challenger.observe_many(digest)
    zeta = challenger.sample_ext()
    for v in proof.trace_zeta + proof.trace_gzeta + proof.quotient_zeta:
        _observe_ext(challenger, v)
    gamma = challenger.sample_ext()

    # --- ALI identity at zeta ----------------------------------------------
    alg = HostExtAlgebra()
    g_zeta = gold.ext_mul(zeta, (g, 0))
    pub_elems = [(v % P, 0) for v in publics]
    constraints = air.eval_constraints(
        list(proof.trace_zeta), list(proof.trace_gzeta), pub_elems, alg
    )
    acc = {}
    a_pow = (1, 0)
    for value, kind in constraints:
        term = gold.ext_mul(value, a_pow)
        acc[kind] = gold.ext_add(acc.get(kind, (0, 0)), term)
        a_pow = gold.ext_mul(a_pow, alpha)
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
    g_pows = []
    cur = (1, 0)
    for _ in range(2 * n_cols + 2 * blowup):
        g_pows.append(cur)
        cur = gold.ext_mul(cur, gamma)

    half = n_ext // 2
    query_state = {"round": -1}

    def deep_at(posn: int, row_t: list[int], row_q: list[int]):
        x = gold.mul(shift % P, pow(w_ext, posn, P))
        inv_xz = gold.ext_inv(gold.ext_sub((x, 0), zeta))
        inv_xgz = gold.ext_inv(gold.ext_sub((x, 0), g_zeta))
        num_a = (0, 0)
        num_b = (0, 0)
        for j in range(n_cols):
            tv = (row_t[j] % P, 0)
            num_a = gold.ext_add(
                num_a, gold.ext_mul(g_pows[j], gold.ext_sub(tv, proof.trace_zeta[j]))
            )
            num_b = gold.ext_add(
                num_b,
                gold.ext_mul(g_pows[n_cols + j], gold.ext_sub(tv, proof.trace_gzeta[j])),
            )
        for k in range(2 * blowup):
            qv = (row_q[k] % P, 0)
            num_a = gold.ext_add(
                num_a,
                gold.ext_mul(
                    g_pows[2 * n_cols + k], gold.ext_sub(qv, proof.quotient_zeta[k])
                ),
            )
        return gold.ext_add(gold.ext_mul(num_a, inv_xz), gold.ext_mul(num_b, inv_xgz))

    def layer0_check(i: int, pair) -> bool:
        query_state["round"] += 1
        r = query_state["round"]
        if r >= len(proof.openings):
            return False
        q = proof.openings[r]
        for posn, row_open_t, row_open_q, want in (
            (i, q.trace[0], q.quotient[0], pair[0]),
            (i + half, q.trace[1], q.quotient[1], pair[1]),
        ):
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
            if deep_at(posn, row_open_t.row, row_open_q.row) != want:
                return False
        return True

    return fri_verify_ext(
        proof.fri, n_ext, config.fri(), challenger, shift, layer0_check=layer0_check
    )
