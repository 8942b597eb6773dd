"""AIR (algebraic intermediate representation) interface for the STARK prover
(component C8, SURVEY.md §2.2: "vectorized constraint evaluator: per-gate
closed-form evaluation over the sharded domain").

Design (SURVEY.md §3.3): there is NO runtime circuit-builder DSL. An AIR is a
plain Python class whose ``eval_constraints`` writes each constraint as a
closed-form polynomial in the trace frame, using a tiny *algebra* object so
the SAME definition runs in two worlds:

  - on device, over the whole extended domain at once (elements are base-field
    Gl arrays of shape (n_ext,); the expression compiles to fused VPU code);
  - on the host verifier, at the single out-of-domain point zeta (elements are
    GF(p^2) pairs of python ints).

Each constraint carries a divisor kind saying where it must vanish:
  'transition' — every row except the last   (Z_H(x) / (x - g^{n-1}))
  'first'      — the first row only          (x - 1)
  'last'       — the last row only           (x - g^{n-1})
  'all'        — every row                   (Z_H(x))
"""

from __future__ import annotations

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gold

KINDS = ("transition", "first", "last", "all")


class DeviceAlgebra:
    """Base-field arithmetic on (n_ext,)-shaped Gl arrays."""

    def __init__(self, shape):
        self.shape = shape

    def const(self, v: int):
        return gf64.full(self.shape, v % gold.P)

    def add(self, a, b):
        return gf64.gl_add(a, b)

    def sub(self, a, b):
        return gf64.gl_sub(a, b)

    def mul(self, a, b):
        return gf64.gl_mul(a, b)


class HostExtAlgebra:
    """GF(p^2) arithmetic on (c0, c1) python-int pairs (verifier at zeta)."""

    def const(self, v: int):
        return (v % gold.P, 0)

    def add(self, a, b):
        return gold.ext_add(a, b)

    def sub(self, a, b):
        return gold.ext_sub(a, b)

    def mul(self, a, b):
        return gold.ext_mul(a, b)


class Air:
    """Base class. Subclasses define the trace width, the constraint list,
    and (for provers) the witness layout."""

    n_cols: int = 0
    max_degree: int = 2  # max total degree of any constraint in trace values

    def eval_constraints(self, local, nxt, publics, alg):
        """Return [(value, kind), ...].

        local/nxt: per-column trace values (algebra elements) on the current /
        next row. publics: per-public-input values, ALSO algebra elements (on
        device they are traced scalars, so changing a public input does not
        recompile the quotient program). alg.const is for static literals
        only. Constraint ORDER defines the alpha-power assignment and must be
        identical for prover and verifier (it is: same code).
        """
        raise NotImplementedError

    def cache_key(self):
        """Key for the compiled-phase cache. Airs whose constraint system
        depends on instance parameters must include them here."""
        return type(self)
