"""logUp lookup argument on top of the two-stage STARK machinery
(the lookup/CTL analog of SURVEY.md §2.2 L2 [R]: upstream links Curta STARK
tables into circuits via lookups; here lookups live inside one AIR).

Identity (Haböck's logUp): for lookup values v_j (witness columns), a table
column T (preprocessed) and multiplicities m (witness, committed BEFORE the
challenge), with a post-commit challenge β:

    Σ_rows Σ_j 1/(β - v_j)  ==  Σ_rows m/(β - T)

Rational terms are materialized as stage-2 witness columns (committed after
β is sampled) with degree-2 well-formedness constraints, and the running
difference accumulates in a stage-2 column pinned to zero on the last row:

    w_j (β - v_j) = 1          wm (β - T) = m
    A_first = Σ w_j - wm       A' = A + Σ w_j' - wm'       A_last = 0

Soundness: β is sampled after v/m are committed. The PRODUCTION variant
(`*_multi_ext`, used by the Ed25519 AIR) samples β from GF(p²) = GF(p)[X]/
(X²-7): a cheating multiset must make the rational identity hold at the
random β, i.e. β must hit a root of a nonzero rational function with at most
(k+nt)·n ≈ 2^27 poles/zeros — probability ≤ 2^27 / p² ≈ 2^-101 (plonky2-
class; closes the r3 TODO). The ext element is carried as TWO base-field
challenge slots (β₀, β₁) and every ext constraint splits into its two GF(p)
components, so the two-stage STARK machinery (base-field quotient) is
untouched. The base-field single-table variant (`eval_logup_constraints`)
is kept for unit tests and small gadgets; its bound is only ~n·k/p ≈ 2^-40
and it must not guard a production table.

Helpers here are algebra-generic (device + host verifier), so an AIR mixes
lookups in by reserving stage-2 columns and calling the eval helpers from
its eval_constraints.
"""

from __future__ import annotations

import numpy as np

from blobstreamx_tpu.golden import goldilocks as gold

P = gold.P


def n_stage2_cols(n_lookup_cols: int) -> int:
    """w per lookup column + wm + accumulator A."""
    return n_lookup_cols + 2


def eval_logup_constraints(alg, beta, values, values_next, mult, mult_next,
                           table, table_next, stage2, stage2_next):
    """Constraint list for one logUp instance.

    values/values_next: the k lookup columns (local / next frame);
    mult: multiplicity column; table: the preprocessed table column;
    stage2 layout: [w_0..w_{k-1}, wm, A]. Returns [(value, kind), ...].
    """
    k = len(values)
    ws = stage2[:k]
    wm = stage2[k]
    acc = stage2[k + 1]
    ws_n = stage2_next[:k]
    wm_n = stage2_next[k]
    acc_n = stage2_next[k + 1]
    one = alg.const(1)
    cs = []
    for j in range(k):
        cs.append((alg.sub(alg.mul(ws[j], alg.sub(beta, values[j])), one), "all"))
    cs.append((alg.sub(alg.mul(wm, alg.sub(beta, table)), mult), "all"))

    def delta(ws_, wm_):
        d = ws_[0]
        for j in range(1, k):
            d = alg.add(d, ws_[j])
        return alg.sub(d, wm_)

    cs.append((alg.sub(acc, delta(ws, wm)), "first"))
    cs.append((alg.sub(acc_n, alg.add(acc, delta(ws_n, wm_n))), "transition"))
    cs.append((acc, "last"))
    return cs


def build_logup_stage2(values: np.ndarray, mult: np.ndarray, table: np.ndarray,
                       beta: int) -> np.ndarray:
    """Host construction of [w_0..w_{k-1}, wm, A] for an (n, k) lookup-value
    matrix, (n,) multiplicities and (n,) table."""
    n, k = values.shape
    out = np.zeros((n, k + 2), dtype=np.uint64)
    acc = 0
    for i in range(n):
        d = 0
        for j in range(k):
            w = gold.inv((beta - int(values[i, j])) % P)
            out[i, j] = w
            d = (d + w) % P
        wm = (int(mult[i]) * gold.inv((beta - int(table[i])) % P)) % P
        out[i, k] = wm
        acc = (acc + d - wm) % P
        out[i, k + 1] = acc
    assert acc == 0, "lookup multiset mismatch (witness bug)"
    return out


def multiplicities(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """Count how often each table row's value appears among the lookups."""
    from collections import Counter

    counts = Counter(int(v) for v in values.reshape(-1))
    return np.array([counts.get(int(t), 0) for t in table], dtype=np.uint64)


# ----------------------------------------------------------------------------
# multi-table-column generalization: Σ_rows Σ_j 1/(β-v_j) == Σ_rows Σ_t m_t/(β-T_t)
# lets a table larger than the trace height (e.g. the 16-bit limb range table
# of the Ed25519 STARK, docs/ed25519_stark.md) spread over ceil(|T|/n) fixed
# columns, each with its own multiplicity column.
# ----------------------------------------------------------------------------


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


def n_stage2_cols_multi(n_lookup_cols: int, n_table_cols: int) -> int:
    """w per lookup column + wm per table column + accumulator A."""
    return n_lookup_cols + n_table_cols + 1


def range_table_columns(n: int, bits: int = 16) -> np.ndarray:
    """(n, nt) fixed table columns jointly covering [0, 2^bits). When the
    trace is taller than the table, the tail repeats the top value (its
    multiplicity is assigned at the first occurrence only)."""
    size = 1 << bits
    nt = (size + n - 1) // n
    t = np.arange(n, dtype=np.int64)[:, None] + n * np.arange(nt, dtype=np.int64)[None, :]
    return np.minimum(t, size - 1).astype(np.uint64)


def multiplicities_multi(values: np.ndarray, table: np.ndarray) -> np.ndarray:
    """(n, nt) multiplicity matrix: each distinct table value's count lands at
    its first occurrence (in flat row-major order), zero at repeats."""
    size = int(table.max()) + 1
    counts = np.bincount(values.reshape(-1).astype(np.int64), minlength=size)
    assert counts.size <= size, "lookup value outside the table range"
    flat = table.reshape(-1)
    uniq, first_idx = np.unique(flat, return_index=True)
    m_flat = np.zeros(flat.size, dtype=np.uint64)
    m_flat[first_idx] = counts[uniq.astype(np.int64)]
    return m_flat.reshape(table.shape)


def eval_logup_multi(alg, beta, values_m, mult_m, table_m, values_m_next,
                     mult_m_next, table_m_next, stage2, stage2_next,
                     n_vals: int, n_tabs: int):
    """Matrix-form logUp with multiple table columns.

    values_m (width n_vals), mult_m / table_m (width n_tabs) are algebra
    matrices; stage2 layout: [w_0..w_{k-1}, wm_0..wm_{t-1}, A] (elements,
    starting at stage2 index 0 — pass the frame itself, which may be a lazy
    matrix view: frame_block then slices whole blocks instead of stacking
    1000 columns, see air.frame_block). Returns [(value, kind), ...]."""
    from .air import frame_block

    k, nt = n_vals, n_tabs
    w_m = frame_block(alg, stage2, 0, k)
    wm_m = frame_block(alg, stage2, k, k + nt)
    acc = stage2[k + nt]
    w_mn = frame_block(alg, stage2_next, 0, k)
    wm_mn = frame_block(alg, stage2_next, k, k + nt)
    acc_n = stage2_next[k + nt]
    cs = []
    cs.append(
        (alg.sub(alg.mul(w_m, alg.sub(beta, values_m)), alg.const_row([1] * k)), "all")
    )
    cs.append((alg.sub(alg.mul(wm_m, alg.sub(beta, table_m)), mult_m), "all"))

    def delta(w_, wm_):
        return alg.sub(alg.sum_cols(w_), alg.sum_cols(wm_))

    cs.append((alg.sub(acc, delta(w_m, wm_m)), "first"))
    cs.append((alg.sub(acc_n, alg.add(acc, delta(w_mn, wm_mn))), "transition"))
    cs.append((acc, "last"))
    return cs


def build_logup_stage2_multi(values: np.ndarray, mult: np.ndarray,
                             table: np.ndarray, beta: int) -> np.ndarray:
    """Host construction of [w.., wm.., A] for (n, k) small-range lookup
    values, (n, nt) multiplicities and (n, nt) table columns.

    Fast path: 1/(β-v) is memoized over DISTINCT values (≤ |table| of them),
    so the big (n, k) matrix costs one batch inversion over the distinct set
    plus numpy gathers — not n*k modular inversions."""
    n, k = values.shape
    uniq = np.unique(np.concatenate([values.reshape(-1), table.reshape(-1)]))
    inv_arr = np.array(
        _batch_inv([(beta - int(u)) % P for u in uniq]), dtype=np.uint64
    )

    def inv_of(x: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(uniq, x.reshape(-1))
        return inv_arr[idx].reshape(x.shape)

    W = inv_of(values)
    invT = inv_of(table)
    flat_m = mult.reshape(-1)
    flat_i = invT.reshape(-1)
    wm_flat = np.fromiter(
        ((int(m) * int(iv)) % P for m, iv in zip(flat_m, flat_i)),
        dtype=np.uint64,
        count=flat_m.size,
    )
    WM = wm_flat.reshape(invT.shape)

    def rowsum_mod(M_: np.ndarray) -> np.ndarray:
        lo = (M_ & np.uint64(0xFFFFFFFF)).sum(axis=1, dtype=np.uint64)
        hi = (M_ >> np.uint64(32)).sum(axis=1, dtype=np.uint64)
        return np.fromiter(
            (((int(a) + (int(b) << 32)) % P) for a, b in zip(lo, hi)),
            dtype=np.uint64,
            count=lo.size,
        )

    sw = rowsum_mod(W)
    swm = rowsum_mod(WM)
    acc = 0
    A = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        acc = (acc + int(sw[i]) - int(swm[i])) % P
        A[i] = acc
    assert acc == 0, "lookup multiset mismatch (witness bug)"
    return np.concatenate([W, WM, A[:, None]], axis=1)


# ----------------------------------------------------------------------------
# GF(p^2)-challenge variant (production): beta = (b0, b1) in GF(p)[X]/(X^2-7).
# Stage-2 rational columns become ext pairs — layout
#   [w0_0..w0_{k-1}, w1_0..w1_{k-1}, wm0_0..wm0_{t-1}, wm1_0..wm1_{t-1}, A0, A1]
# and every ext equation contributes its two GF(p) component constraints.
# ----------------------------------------------------------------------------

EXT_W = gold.EXT_W  # X^2 = 7


def n_stage2_cols_multi_ext(n_lookup_cols: int, n_table_cols: int) -> int:
    """Paired ext wells: one GF(p²) well (2 base columns) per PAIR of lookup
    columns (logUp numerator batching — w·(β−v₁)(β−v₂) = 2β−v₁−v₂, degree 3),
    + (wm0, wm1) per table column + (A0, A1). The k value wells keep the old
    base-field budget (k columns); the table wells and accumulator double
    (2·nt + 2 vs nt + 1) — the price of the 2^-101 ext-challenge soundness."""
    q = n_lookup_cols // 2 + n_lookup_cols % 2
    # NB vs the old base-field layout (k + nt + 1): the k value wells stay at
    # k base columns (2 per ext well x k/2 paired wells), while the table
    # wells and the accumulator DOUBLE (2*nt vs nt, 2 vs 1) — the ext
    # challenge costs nt+1 extra columns, not zero (ADVICE r4).
    return 2 * q + 2 * n_table_cols + 2


def _evens_odds(m):
    """Split a width-k algebra matrix into its even / odd columns (device:
    tuple of (n, k) arrays; host verifier: list of ext pairs)."""
    if isinstance(m, list):
        return m[0::2], m[1::2]
    return tuple(c[:, 0::2] for c in m), tuple(c[:, 1::2] for c in m)


def _last_col(m):
    if isinstance(m, list):
        return m[-1]
    return tuple(c[:, -1] for c in m)


def eval_logup_multi_ext(alg, beta0, beta1, values_m, mult_m, table_m,
                         values_m_next, mult_m_next, table_m_next,
                         stage2, stage2_next, n_vals: int, n_tabs: int):
    """Matrix-form logUp with a GF(p²) challenge and PAIRED wells.

    For a pair (va, vb) the committed ext well u satisfies
        u · (β − va) · (β − vb) = (β − va) + (β − vb) = 2β − va − vb
    i.e. u = 1/(β−va) + 1/(β−vb) — one well sums two reciprocals, halving
    the stage-2 column count (Haböck logUp numerator batching). With
    q = (β−va)(β−vb) = (s·t + 7·b₁², (s+t)·b₁), s = b₀−va, t = b₀−vb, the
    X²=7 component constraints are (degree 3 in committed columns):
        re: u0·q0 + u1·(7·q1) − (s + t) = 0
        im: u0·q1 + u1·q0 − 2·b₁       = 0
    An odd trailing column keeps a single degree-2 well u·(β−v) = 1.
    Table wells stay single (wm·(β−T) = m). The accumulator runs
    componentwise over Σu − Σwm.
    """
    from .air import frame_block

    k, nt = n_vals, n_tabs
    npairs, rem = k // 2, k % 2
    q_wells = npairs + rem
    u0 = frame_block(alg, stage2, 0, q_wells)
    u1 = frame_block(alg, stage2, q_wells, 2 * q_wells)
    wm0 = frame_block(alg, stage2, 2 * q_wells, 2 * q_wells + nt)
    wm1 = frame_block(alg, stage2, 2 * q_wells + nt, 2 * q_wells + 2 * nt)
    a0 = stage2[2 * q_wells + 2 * nt]
    a1 = stage2[2 * q_wells + 2 * nt + 1]
    u0n = frame_block(alg, stage2_next, 0, q_wells)
    u1n = frame_block(alg, stage2_next, q_wells, 2 * q_wells)
    wm0n = frame_block(alg, stage2_next, 2 * q_wells, 2 * q_wells + nt)
    wm1n = frame_block(alg, stage2_next, 2 * q_wells + nt, 2 * q_wells + 2 * nt)
    a0n = stage2_next[2 * q_wells + 2 * nt]
    a1n = stage2_next[2 * q_wells + 2 * nt + 1]

    # small scalar constants from the challenge, built by ADDS so they keep
    # the challenge's scalar shape in both algebra worlds (alg.const is
    # full-height in the device world and breaks matrix broadcasting)
    b1x2 = alg.add(beta1, beta1)
    b1x4 = alg.add(b1x2, b1x2)
    seven_b1 = alg.add(alg.add(b1x4, b1x2), beta1)
    b1sq7 = alg.mul(seven_b1, beta1)  # 7·b₁²

    cs = []
    if npairs:
        if rem:
            # paired part uses columns [0, 2*npairs); the trailing single
            # well gets its own constraints below
            def drop_last(m):
                if isinstance(m, list):
                    return m[:-1]
                return tuple(c[:, :-1] for c in m)

            paired_vals = drop_last(values_m)
            up0, up1 = (
                (u0[:-1], u1[:-1])
                if isinstance(u0, list)
                else (tuple(c[:, :-1] for c in u0), tuple(c[:, :-1] for c in u1))
            )
        else:
            paired_vals = values_m
            up0, up1 = u0, u1
        va, vb = _evens_odds(paired_vals)
        s = alg.sub(beta0, va)
        t = alg.sub(beta0, vb)
        st_sum = alg.add(s, t)
        q0 = alg.add(alg.mul(s, t), b1sq7)
        q1 = alg.mul(st_sum, beta1)
        cs.append((
            alg.sub(
                alg.add(alg.mul(up0, q0), alg.mul(up1, alg.mul(st_sum, seven_b1))),
                st_sum,
            ),
            "all",
        ))
        cs.append((
            alg.sub(alg.add(alg.mul(up0, q1), alg.mul(up1, q0)), b1x2),
            "all",
        ))
    if rem:
        v_last = _last_col(values_m)
        ul0, ul1 = _last_col(u0), _last_col(u1)
        one = alg.const(1)
        bmv = alg.sub(beta0, v_last)
        cs.append((
            alg.sub(alg.add(alg.mul(ul0, bmv), alg.mul(ul1, seven_b1)), one),
            "all",
        ))
        cs.append((alg.add(alg.mul(ul0, beta1), alg.mul(ul1, bmv)), "all"))

    # table wells
    bmt = alg.sub(beta0, table_m)
    cs.append((
        alg.sub(alg.add(alg.mul(wm0, bmt), alg.mul(wm1, seven_b1)), mult_m),
        "all",
    ))
    cs.append((alg.add(alg.mul(wm0, beta1), alg.mul(wm1, bmt)), "all"))

    def delta(ws, wms):
        return alg.sub(alg.sum_cols(ws), alg.sum_cols(wms))

    d0, d1 = delta(u0, wm0), delta(u1, wm1)
    d0n, d1n = delta(u0n, wm0n), delta(u1n, wm1n)
    cs.append((alg.sub(a0, d0), "first"))
    cs.append((alg.sub(a1, d1), "first"))
    cs.append((alg.sub(a0n, alg.add(a0, d0n)), "transition"))
    cs.append((alg.sub(a1n, alg.add(a1, d1n)), "transition"))
    cs.append((a0, "last"))
    cs.append((a1, "last"))
    return cs


def build_logup_stage2_multi_ext(values: np.ndarray, mult: np.ndarray,
                                 table: np.ndarray, beta: tuple[int, int]) -> np.ndarray:
    """Host construction of [u0.., u1.., wm0.., wm1.., A0, A1] for (n, k)
    small-range lookup values, (n, nt) multiplicities and (n, nt) tables,
    with PAIRED wells: u_i = 1/(β−v_{2i}) + 1/(β−v_{2i+1}) (a trailing odd
    column keeps a single-reciprocal well).

    1/(β − u) in GF(p²) for base u: with a = (b0 − u, b1), a⁻¹ =
    (a0, −a1) / (a0² − 7·b1²); the norms over the DISTINCT value set get one
    Montgomery batch inversion, the big matrices are numpy gathers."""
    b0, b1 = int(beta[0]) % P, int(beta[1]) % P
    n, k = values.shape
    uniq = np.unique(np.concatenate([values.reshape(-1), table.reshape(-1)]))
    sq_b1_7 = (EXT_W * b1 * b1) % P
    norms = [((b0 - int(u)) * (b0 - int(u)) - sq_b1_7) % P for u in uniq]
    if any(nv == 0 for nv in norms):
        # beta collided with a table/value element (possible only when
        # beta1 = 0 mod P, ~2^-64 per transcript): a zero norm would corrupt
        # EVERY inverse in the Montgomery batch silently (ADVICE r4).
        # Fail stop with a clear message; the caller re-proves, drawing a
        # fresh transcript (different commitment randomness).
        raise ValueError("logUp challenge beta collides with a looked-up value")
    inv_norms = _batch_inv(norms)
    re_arr = np.array(
        [((b0 - int(u)) * iv) % P for u, iv in zip(uniq, inv_norms)], dtype=np.uint64
    )
    im_arr = np.array([(-b1 * iv) % P for iv in inv_norms], dtype=np.uint64)

    def gather(arr, x):
        idx = np.searchsorted(uniq, x.reshape(-1))
        return arr[idx].reshape(x.shape)

    W0, W1 = gather(re_arr, values), gather(im_arr, values)
    T0, T1 = gather(re_arr, table), gather(im_arr, table)

    def addmod(a, b):
        out = np.empty(a.shape, dtype=np.uint64)
        flat = ((int(x) + int(y)) % P for x, y in zip(a.reshape(-1), b.reshape(-1)))
        out.reshape(-1)[:] = np.fromiter(flat, dtype=np.uint64, count=a.size)
        return out

    npairs, rem = k // 2, k % 2
    # paired wells: columnwise sums of the two reciprocals
    U0 = addmod(W0[:, 0 : 2 * npairs : 2], W0[:, 1 : 2 * npairs : 2])
    U1 = addmod(W1[:, 0 : 2 * npairs : 2], W1[:, 1 : 2 * npairs : 2])
    if rem:
        U0 = np.concatenate([U0, W0[:, -1:]], axis=1)
        U1 = np.concatenate([U1, W1[:, -1:]], axis=1)

    flat_m = mult.reshape(-1)
    WM0 = np.fromiter(
        ((int(m) * int(t)) % P for m, t in zip(flat_m, T0.reshape(-1))),
        dtype=np.uint64, count=flat_m.size,
    ).reshape(table.shape)
    WM1 = np.fromiter(
        ((int(m) * int(t)) % P for m, t in zip(flat_m, T1.reshape(-1))),
        dtype=np.uint64, count=flat_m.size,
    ).reshape(table.shape)

    def rowsum_mod(M_: np.ndarray) -> np.ndarray:
        lo = (M_ & np.uint64(0xFFFFFFFF)).sum(axis=1, dtype=np.uint64)
        hi = (M_ >> np.uint64(32)).sum(axis=1, dtype=np.uint64)
        return np.fromiter(
            (((int(a) + (int(b) << 32)) % P) for a, b in zip(lo, hi)),
            dtype=np.uint64, count=lo.size,
        )

    sw0, sw1 = rowsum_mod(U0), rowsum_mod(U1)
    swm0, swm1 = rowsum_mod(WM0), rowsum_mod(WM1)
    acc0 = acc1 = 0
    A0 = np.zeros(n, dtype=np.uint64)
    A1 = np.zeros(n, dtype=np.uint64)
    for i in range(n):
        acc0 = (acc0 + int(sw0[i]) - int(swm0[i])) % P
        acc1 = (acc1 + int(sw1[i]) - int(swm1[i])) % P
        A0[i] = acc0
        A1[i] = acc1
    assert acc0 == 0 and acc1 == 0, "lookup multiset mismatch (witness bug)"
    return np.concatenate([U0, U1, WM0, WM1, A0[:, None], A1[:, None]], axis=1)
