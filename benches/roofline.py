#!/usr/bin/env python
"""Measured roofline / speed-of-light model for this chip (BASELINE.md).

Promised at SURVEY.md §6 ("the build's own roofline model ... defines
speed-of-light") — this script MEASURES the two resources that bound every
kernel in this framework and DERIVES speed-of-light rates for the primary
metrics, so BASELINE.md numbers can carry an MFU-style achieved fraction.

All hot-path arithmetic here is integer u32 on the VPU (bit-exactness
forbids floats, so the MXU is idle by design — the roofline is the VPU
integer issue rate and HBM bandwidth, not bf16 FLOPs).

Method:
  1. vpu_u32_ops_per_s  — sustained elementwise u32 multiply-add chain,
     array resident on device, K dependent steps so XLA cannot collapse
     the chain; ops = 2 * K * N.
  2. hbm_bytes_per_s    — u32 stream copy-add (read N*4 + write N*4 bytes).
  3. ops-per-primitive  — counted mechanically from the closed jaxpr of the
     actual library code (gl_mul / NTT butterfly pair / Poseidon round),
     counting u32 arithmetic/logic primitives (mul, add, sub, shifts, and,
     or, xor, compares, selects). This is the honest cost of the u32-pair
     formulation, not a hand-waved ideal.
  4. speed-of-light:
       SoL(butterflies/s) = vpu_ops / ops_per_butterfly   (compute-bound;
         the fused Pallas NTT keeps all 22 stages in VMEM, so HBM is
         touched once per transform and never binds)
       SoL(poseidon perms/s) = vpu_ops / ops_per_perm
     plus the HBM-bound alternative for an UNfused stage-by-stage NTT
     (16 B read + 16 B write per butterfly per stage) for context.

Prints one JSON line; paste-friendly for docs/roofline.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np

# u32 arithmetic/logic primitives that occupy a VPU issue slot
_VPU_PRIMS = {
    "add", "sub", "mul", "and", "or", "xor", "shift_left",
    "shift_right_logical", "shift_right_arithmetic", "lt", "le", "gt", "ge",
    "eq", "ne", "select_n", "convert_element_type", "not",
}


def _count_vpu_ops(fn, *args) -> int:
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)

    def walk(jx):
        n = 0
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("pjit", "closed_call", "custom_jvp_call", "custom_vjp_call"):
                inner = eqn.params.get("jaxpr")
                if inner is not None:
                    n += walk(inner.jaxpr if hasattr(inner, "jaxpr") else inner)
                continue
            if name in _VPU_PRIMS:
                n += 1
        return n

    return walk(jaxpr.jaxpr)


def _sync(x):
    import jax

    jax.block_until_ready(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def _bench(fn, x, iters=10):
    _sync(fn(x))
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def measure_vpu_u32() -> float:
    """Sustained u32 ops/s: K-deep dependent multiply-add chain."""
    import jax
    import jax.numpy as jnp

    N = 1 << 24
    K = 64

    @jax.jit
    def chain(x):
        c = jnp.uint32(2654435761)
        d = jnp.uint32(0x9E3779B9)
        for _ in range(K):
            x = x * c + d
        return x

    x = jax.device_put(np.arange(N, dtype=np.uint32))
    dt = _bench(chain, x)
    return 2.0 * K * N / dt


def measure_hbm() -> float:
    """Stream bandwidth: read + write of a u32 array too big for VMEM."""
    import jax

    N = 1 << 27  # 512 MiB traffic per pass

    @jax.jit
    def stream(x):
        return x + np.uint32(1)

    x = jax.device_put(np.zeros(N, dtype=np.uint32))
    dt = _bench(stream, x)
    return 8.0 * N / dt  # 4 B read + 4 B write per element


def op_counts() -> dict:
    from blobstreamx_tpu.fields import gf64

    shape = (8,)
    a = gf64.zeros(shape)
    b = gf64.zeros(shape)

    def butterfly(a, b):
        # one radix-2 butterfly pair: t = w*b; (a+t, a-t)
        t = gf64.gl_mul(a, b)
        return gf64.gl_add(a, t), gf64.gl_sub(a, t)

    per_elem = {
        "gl_mul": _count_vpu_ops(gf64.gl_mul, a, b),
        "gl_add": _count_vpu_ops(gf64.gl_add, a, b),
        "butterfly": _count_vpu_ops(butterfly, a, b),
    }

    from blobstreamx_tpu.ops import poseidon as pos

    # count per-round bodies directly (permute runs rounds under lax.scan,
    # whose body the jaxpr top level hides); 8 full + 22 partial rounds
    states = gf64.zeros((12, 8))
    rc = gf64.zeros((12, 1))
    full = _count_vpu_ops(pos._full_round, states, rc)
    partial = _count_vpu_ops(pos._partial_round, states, rc)
    per_elem["poseidon_permutation"] = 8 * full + 22 * partial
    return per_elem


def main() -> None:
    import jax

    vpu = measure_vpu_u32()
    hbm = measure_hbm()
    ops = op_counts()

    sol_butterfly_compute = vpu / ops["butterfly"]
    # unfused stage-by-stage NTT: each butterfly streams 2 elements in + 2 out
    sol_butterfly_hbm_unfused = hbm / 32.0
    sol_poseidon = vpu / ops["poseidon_permutation"]

    rec = {
        "backend": jax.default_backend(),
        "vpu_u32_ops_per_s": vpu,
        "hbm_bytes_per_s": hbm,
        "u32_ops_per_gl_mul": ops["gl_mul"],
        "u32_ops_per_gl_add": ops["gl_add"],
        "u32_ops_per_butterfly": ops["butterfly"],
        "u32_ops_per_poseidon_perm": ops["poseidon_permutation"],
        "sol_butterflies_per_s_compute": sol_butterfly_compute,
        "sol_butterflies_per_s_hbm_unfused": sol_butterfly_hbm_unfused,
        "sol_poseidon_perms_per_s": sol_poseidon,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
