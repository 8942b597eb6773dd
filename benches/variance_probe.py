#!/usr/bin/env python
"""Variance probe for the two regression-flagged kernel metrics (VERDICT r4
weak #1): N independent samples of the NTT and Poseidon timings using
bench.py's exact methodology, printed as JSONL with spread stats. Decides
"environment variance" vs "real regression" with committed evidence.

Usage: python benches/variance_probe.py [N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _timed(fn, x, iters: int, repeats: int = 4) -> float:
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = fn(y)
        jax.block_until_ready(y)
        _ = np.asarray(y[0][:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    import jax

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl
    from blobstreamx_tpu.ops import ntt as ntt_ops, poseidon as pos

    rng = np.random.default_rng(0)
    n = 1 << 22
    x = jax.device_put(gf64.from_u64(rng.integers(0, gl.P, size=(n,), dtype=np.uint64)))
    states = jax.device_put(
        gf64.from_u64(rng.integers(0, gl.P, size=(12, 1 << 16), dtype=np.uint64))
    )
    bf = ntt_ops.butterfly_count(22)

    ntt_fns = {"four_step": jax.jit(ntt_ops.ntt_four_step)}
    for name in ("ntt_four_step_pallas_split", "ntt_four_step_pallas"):
        fn = getattr(ntt_ops, name, None)
        if fn is not None:
            ntt_fns[name] = jax.jit(fn)
    pos_fns = {"xla": jax.jit(pos.permute), "pallas": jax.jit(pos.permute_pallas)}

    ntt_best: dict[str, list[float]] = {k: [] for k in ntt_fns}
    pos_best: dict[str, list[float]] = {k: [] for k in pos_fns}
    for s in range(n_samples):
        rec: dict = {"sample": s, "ts": time.time()}
        for name, fn in ntt_fns.items():
            try:
                dt = _timed(fn, x, 16)
                ntt_best[name].append(bf / dt)
                rec[f"ntt_{name}"] = bf / dt
            except Exception as e:
                rec[f"ntt_{name}"] = f"err:{type(e).__name__}"
        for name, fn in pos_fns.items():
            try:
                dt = _timed(fn, states, 16)
                pos_best[name].append((1 << 16) / dt)
                rec[f"poseidon_{name}"] = (1 << 16) / dt
            except Exception as e:
                rec[f"poseidon_{name}"] = f"err:{type(e).__name__}"
        print(json.dumps(rec), flush=True)

    def stats(vals: list[float]) -> dict:
        if not vals:
            return {}
        a = np.array(vals)
        return {
            "n": len(vals),
            "min": float(a.min()),
            "max": float(a.max()),
            "median": float(np.median(a)),
            "spread_pct": float((a.max() - a.min()) / a.max() * 100),
        }

    summary = {
        "summary": True,
        "backend": jax.default_backend(),
        **{f"ntt_{k}": stats(v) for k, v in ntt_best.items()},
        **{f"poseidon_{k}": stats(v) for k, v in pos_best.items()},
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
