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
