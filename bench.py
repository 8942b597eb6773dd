#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the primary metric.

Primary metric (per /root/repo/BASELINE.json:2): Goldilocks NTT
butterflies/s/chip, measured on a full radix-2 NTT of a 2^22-coefficient
polynomial (config 4 size) on the locally visible accelerator.

vs_baseline: the reference stack publishes no numbers
(/root/repo/BASELINE.json:13, BASELINE.md). We anchor against a documented
assumption of 1.0e8 butterflies/s for a laptop-class CPU plonky2-style FFT
(BASELINE.md "external sanity anchors"), so vs_baseline = value / 1e8.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


LOG_N = 22
BASELINE_BUTTERFLIES_PER_S = 1.0e8


def _guard_dead_tunnel() -> None:
    """This image's sitecustomize dials the axon TPU tunnel at interpreter
    start (when PALLAS_AXON_POOL_IPS is set); a dead tunnel hangs `import
    jax` forever. Probe jax init in a short-lived child; if it cannot come
    up, re-exec ourselves on the CPU backend so the harness always gets its
    JSON line instead of a hang."""
    if os.environ.get("BSX_BENCH_GUARDED"):
        return
    try:
        probe_ok = (
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=240,
                capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        probe_ok = False  # hung import == dead tunnel
    env = dict(os.environ, BSX_BENCH_GUARDED="1")
    if not probe_ok:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def _timed(fn, x, iters: int) -> float:
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:1])  # true sync: the tunneled backend's
    # block_until_ready is not a reliable completion barrier; a device->host
    # readback is.
    t0 = time.perf_counter()
    y = x
    for _ in range(iters):
        y = fn(y)  # chain output->input so iterations can't overlap-collapse
    jax.block_until_ready(y)
    _ = np.asarray(y[0][:1])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    try:
        _guard_dead_tunnel()
    except Exception:
        pass  # probe infrastructure failed: proceed with the inherited env
    import jax

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl
    from blobstreamx_tpu.ops import ntt as ntt_ops

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    x = gf64.from_u64(rng.integers(0, gl.P, size=(n,), dtype=np.uint64))
    x = jax.device_put(x)

    iters = 10
    dt = _timed(jax.jit(ntt_ops.ntt_four_step), x, iters)
    # the Pallas-fused paths (every butterfly stage in VMEM) usually win on
    # TPU; take the best path measured on this backend
    for variant in (ntt_ops.ntt_four_step_pallas_split, ntt_ops.ntt_four_step_pallas):
        try:
            dt = min(dt, _timed(jax.jit(variant), x, iters))
        except Exception:
            pass  # backends without Mosaic support (or VMEM limits) skip
    butterflies = ntt_ops.butterfly_count(LOG_N)
    value = butterflies / dt
    print(
        json.dumps(
            {
                "metric": "goldilocks_ntt_butterflies_per_s_per_chip",
                "value": value,
                "unit": "butterflies/s",
                "vs_baseline": value / BASELINE_BUTTERFLIES_PER_S,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
