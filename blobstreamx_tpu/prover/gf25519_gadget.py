"""In-AIR GF(2^255 - 19) multiplication gadget — step 1 of the Ed25519
auxiliary STARK (docs/ed25519_stark.md; the Curta-analog of SURVEY.md §2.2
C6's in-STARK curve arithmetic [R]).

Representation: a field element is 16 little-endian 16-bit limbs (a loose
representative < 2^256; canonicalization is a separate gadget). One
multiplication c = a*b (mod q), q = 2^255 - 19, is witnessed as

    a * b  =  Q * q + c          over the integers,

with Q a 17-limb quotient, checked limb-column-wise with signed carries:

    t_k := conv_k(a, b) - conv_k(Q, q) - c_k + r_{k-1}
    t_k == r_k * 2^16,       r_31 == 0

where conv_k(x, y) = sum_{i+j=k} x_i y_j. Every carry r_k is encoded as
cl_k + 2^16 ch_k - 2^31 with cl, ch in [0, 2^16) (range-checked via ONE
shared logUp table, prover.lookup). Magnitude analysis: |t_k| < 2^38 and
|r_k 2^16| < 2^48, both far below p/2 — so per-limb GOLDILOCKS equality
implies integer equality, and telescoping the 32 limb equations implies the
integer identity above. All constraints are degree 2.

Column budget per multiplication: 16(a) + 16(b) + 16(c) + 17(Q) + 32(cl)
+ 32(ch) = 129 (operands may be shared between chained muls, so an Edwards
add row reuses a/b slots across its ~9 muls).
"""

from __future__ import annotations

import numpy as np

from blobstreamx_tpu.golden import ed25519 as ged

Q255 = ged.Q  # 2^255 - 19
N_LIMBS = 16
N_QLIMBS = 17
N_CARRY = 32  # limb equations k = 0..31
OFFSET = 1 << 31  # signed-carry bias; carries satisfy |r_k| < 2^31

Q_LIMBS = [(Q255 >> (16 * i)) & 0xFFFF for i in range(N_LIMBS)]


def to_limbs(v: int, n: int = N_LIMBS) -> list[int]:
    return [(v >> (16 * i)) & 0xFFFF for i in range(n)]


def from_limbs(limbs) -> int:
    return sum(int(l) << (16 * i) for i, l in enumerate(limbs))


class MulWitness:
    """Host-side witness for one multiplication c = a*b mod q (c is the
    canonical remainder; the gadget itself only enforces the loose integer
    identity, which is exact for canonical c)."""

    def __init__(self, a: int, b: int):
        self.a = a % (1 << 256)
        self.b = b % (1 << 256)
        prod = self.a * self.b
        self.q = prod // Q255
        self.c = prod - self.q * Q255
        assert self.c == (self.a * self.b) % Q255
        self.a_limbs = to_limbs(self.a)
        self.b_limbs = to_limbs(self.b)
        self.c_limbs = to_limbs(self.c)
        self.q_limbs = to_limbs(self.q, N_QLIMBS)
        assert from_limbs(self.q_limbs) == self.q, "quotient exceeds 17 limbs"
        # carries
        self.cl = []
        self.ch = []
        r_prev = 0
        for k in range(N_CARRY):
            t = (
                _conv_int(self.a_limbs, self.b_limbs, k)
                - _conv_int(self.q_limbs, Q_LIMBS, k)
                - (self.c_limbs[k] if k < N_LIMBS else 0)
                + r_prev
            )
            assert t % (1 << 16) == 0, (k, t)
            r = t >> 16
            assert -OFFSET <= r < OFFSET, (k, r)
            enc = r + OFFSET
            self.cl.append(enc & 0xFFFF)
            self.ch.append(enc >> 16)
            r_prev = r
        assert r_prev == 0, "multiplication identity does not close"

    def columns(self) -> list[int]:
        """Flat column values in gadget order: a, b, c, Q, cl, ch."""
        return (
            self.a_limbs + self.b_limbs + self.c_limbs + self.q_limbs + self.cl + self.ch
        )


N_COLS = 3 * N_LIMBS + N_QLIMBS + 2 * N_CARRY  # 129


def _conv_int(x, y, k: int) -> int:
    return sum(int(x[i]) * int(y[k - i]) for i in range(len(x)) if 0 <= k - i < len(y))


def range_checked_columns() -> list[int]:
    """Gadget-relative indices of every column that must be in [0, 2^16).
    (a, b, c are range-checked too so chained gadgets stay sound.)"""
    return list(range(N_COLS))


def eval_mul_constraints(alg, cols):
    """Degree-2 constraint values (kind 'all') for one gadget instance.

    cols: the 129 per-column algebra elements in MulWitness.columns() order.
    Returns a list of (value, kind) pairs — 32 limb equations as one width-32
    matrix constraint.
    """
    a = cols[0:N_LIMBS]
    b = cols[N_LIMBS : 2 * N_LIMBS]
    c = cols[2 * N_LIMBS : 3 * N_LIMBS]
    q = cols[3 * N_LIMBS : 3 * N_LIMBS + N_QLIMBS]
    cl = cols[3 * N_LIMBS + N_QLIMBS : 3 * N_LIMBS + N_QLIMBS + N_CARRY]
    ch = cols[3 * N_LIMBS + N_QLIMBS + N_CARRY :]

    two16 = 1 << 16
    limb_eqs = []
    r_prev = None  # algebra element for r_{k-1}
    for k in range(N_CARRY):
        # conv_k(a, b) — empty for k = 31 (a, b have 16 limbs each)
        t = None
        for i in range(N_LIMBS):
            j = k - i
            if 0 <= j < N_LIMBS:
                term = alg.mul(a[i], b[j])
                t = term if t is None else alg.add(t, term)
        if t is None:
            t = alg.const(0)
        # - conv_k(Q, q_const): q limbs are constants -> scalar-weighted sum
        for i in range(N_QLIMBS):
            j = k - i
            if 0 <= j < N_LIMBS and Q_LIMBS[j]:
                term = alg.mul(q[i], alg.const(Q_LIMBS[j]))
                t = alg.sub(t, term)
        if k < N_LIMBS:
            t = alg.sub(t, c[k])
        if r_prev is not None:
            t = alg.add(t, r_prev)
        # r_k = cl_k + 2^16 ch_k - OFFSET
        r_k = alg.sub(
            alg.add(cl[k], alg.mul(ch[k], alg.const(two16))), alg.const(OFFSET)
        )
        limb_eqs.append(alg.sub(t, alg.mul(r_k, alg.const(two16))))
        r_prev = r_k
    # final carry must close the identity
    limb_eqs.append(r_prev)
    return [(alg.stack(limb_eqs), "all")]
