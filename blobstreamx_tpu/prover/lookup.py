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

Soundness: β is sampled after v/m are committed (Schwartz–Zippel over the
base field; ~n/|F| ≈ 2^-44 for n = 2^20 — the extension-field challenge
upgrade is noted in the module TODO).

Helpers here are algebra-generic (device + host verifier), so an AIR mixes
lookups in by reserving stage-2 columns [w_0..w_{k-1}, wm, A] and calling
eval_logup_constraints from its eval_constraints.
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
