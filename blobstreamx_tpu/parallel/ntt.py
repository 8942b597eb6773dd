"""Multi-chip NTT: the six-step factorization with an all_to_all transpose
over ICI (config 4, /root/repo/BASELINE.json:10; SURVEY.md §5.7).

A length-n polynomial is the (n1, n2) matrix x[i1, i2] = coeffs[i1*n2 + i2],
columns sharded across the mesh axis. Then:

  A. local column NTTs (length n1) — no communication
  B. local twiddle multiply by W[k1, i2] = w^(k1*i2) (columns of W sharded)
  C. all_to_all re-shard + local transpose  (the only cross-chip traffic:
     n/D elements per chip, Ulysses-pattern)
  D. local column NTTs (length n2)

The result is the (n2, n1) matrix Z with natural-order flattening
out[k2*n1 + k1] = Z[k2, k1], columns (k1) sharded. FRI folding composes with
this layout for free: the fold pairs (i, i + N/2) are rows (k2, k2 + n2/2) of
the SAME column, so every fold stage down to n2 = 1 stays chip-local.

Column-batched LDE for prover trace matrices is embarrassingly data-parallel
(columns sharded, no comm) — see ``lde_cols_sharded``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl, gl_mul
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.ops import ntt as ntt_ops
from .mesh import AXIS


def _factor(log_n: int) -> tuple[int, int]:
    log_n1 = log_n // 2
    return 1 << log_n1, 1 << (log_n - log_n1)


def _local_six_step(xlo, xhi, wlo, whi, inverse: bool):
    mat = ntt_ops.ntt_cols((xlo, xhi), inverse)  # A: local col NTTs
    mat = gl_mul(mat, (wlo, whi))  # B: twiddle
    # C: distributed transpose: (n1, n2/D) -> (n1/D, n2) -> local T (n2, n1/D)
    tlo = jax.lax.all_to_all(mat[0], AXIS, split_axis=0, concat_axis=1, tiled=True)
    thi = jax.lax.all_to_all(mat[1], AXIS, split_axis=0, concat_axis=1, tiled=True)
    mat = (tlo.T, thi.T)
    return ntt_ops.ntt_cols(mat, inverse)  # D: local col NTTs


from functools import lru_cache


@lru_cache(maxsize=None)
def _sharded_ntt_fn(mesh, inverse: bool):
    """jitted shard_map program, cached per (mesh, direction). Without jit,
    shard_map runs eagerly and dispatches every elementwise op per-shard
    (observed: minutes instead of milliseconds)."""
    spec = P(None, AXIS)
    fn = partial(_local_six_step, inverse=inverse)
    return jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec),
            check_vma=False,
        )
    )


def ntt_matrix_sharded(x: Gl, mesh, inverse: bool = False) -> Gl:
    """Six-step NTT. x: (n1, n2) Gl matrix (row-major view of the length-n
    input), columns sharded over `mesh`. Returns the (n2, n1) natural-order
    matrix, columns sharded."""
    n1, n2 = x[0].shape
    log_n = (n1 * n2).bit_length() - 1
    assert _factor(log_n) == (n1, n2), "shape must match the canonical factorization"
    w = gf64.from_u64(ntt_ops._four_step_twiddles(log_n, inverse))
    return _sharded_ntt_fn(mesh, inverse)(x[0], x[1], w[0], w[1])


def ntt_sharded(coeffs: Gl, mesh, inverse: bool = False) -> Gl:
    """Natural-order (n,) -> natural-order (n,) six-step NTT (convenience
    wrapper; the flat reshape of the output matrix triggers a resharding
    gather, so performance-critical callers should consume the matrix form)."""
    n = coeffs[0].shape[0]
    log_n = n.bit_length() - 1
    n1, n2 = _factor(log_n)
    x = (coeffs[0].reshape(n1, n2), coeffs[1].reshape(n1, n2))
    sharding = NamedSharding(mesh, P(None, AXIS))
    x = jax.device_put(x, sharding)
    out = ntt_matrix_sharded(x, mesh, inverse)
    return out[0].reshape(n), out[1].reshape(n)


@lru_cache(maxsize=None)
def _sharded_lde_fn(mesh, rate_bits: int, shift: int):
    spec = P(None, AXIS)

    def local(lo, hi):
        return ntt_ops.lde_cols((lo, hi), rate_bits, shift)

    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
            check_vma=False,
        )
    )


def lde_cols_sharded(coeffs: Gl, rate_bits: int, mesh, shift: int = gold.COSET_SHIFT) -> Gl:
    """Data-parallel LDE of a trace matrix: (n, C) with C sharded, no comm."""
    return _sharded_lde_fn(mesh, rate_bits, shift)(coeffs[0], coeffs[1])
