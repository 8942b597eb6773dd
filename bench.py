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
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return  # no tunnel configured: nothing to probe, run in-process
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
    if probe_ok:
        return  # healthy: the sitecustomize already dialed this process's jax
    env = dict(os.environ, BSX_BENCH_GUARDED="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)], env)


def _timed(fn, x, iters: int, repeats: int = 4) -> float:
    """Best-of-`repeats` timing of `iters` chained calls.

    Round 3 recorded 28% swings on UNCHANGED kernel code (perf_history
    d6432ae vs 650eb01) — single-sample timing on a tunneled backend folds
    host jitter and tunnel stalls into the metric. The min over several
    measurement windows is the standard throughput estimator: noise only
    ever ADDS time."""
    import jax

    out = fn(x)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:1])  # true sync: the tunneled backend's
    # block_until_ready is not a reliable completion barrier; a device->host
    # readback is.
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        y = x
        for _ in range(iters):
            y = fn(y)  # chain output->input so iterations can't overlap-collapse
        jax.block_until_ready(y)
        _ = np.asarray(y[0][:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _measure_poseidon() -> float | None:
    """Config-2 shape: 2^16 width-12 permutations, best of XLA/Pallas."""
    import jax

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl
    from blobstreamx_tpu.ops import poseidon as pos

    n = 1 << 16
    rng = np.random.default_rng(0)
    states = jax.device_put(
        gf64.from_u64(rng.integers(0, gl.P, size=(12, n), dtype=np.uint64))
    )
    best = None
    for fn in (pos.permute, pos.permute_pallas):
        try:
            dt = _timed(jax.jit(fn), states, 16)
            best = dt if best is None else min(best, dt)
        except Exception:
            pass
    return None if best is None else n / best


def _measure_ed25519() -> float | None:
    """Config-3 shape: 256-signature Ed25519 batch verify, best-of-4 warm."""
    from blobstreamx_tpu.golden import ed25519 as ged
    from blobstreamx_tpu.ops import ed25519 as ed_ops

    rng = np.random.default_rng(0)
    items = []
    for i in range(256):
        sk = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        msg = b"bench-%d" % i
        items.append((ged.public_key(sk), msg, ged.sign(sk, msg)))
    ok, _ = ed_ops.batch_verify(items)  # cold (compiles)
    if not ok:
        return None
    dt = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        ok, _ = ed_ops.batch_verify(items)
        dt = min(dt, time.perf_counter() - t0)
    return 256 / dt if ok else None


def _measure_skip_wall() -> dict:
    """North-star shape (config 5): full skip prove wall-clock, run in a
    budgeted subprocess so a stuck compile can never take down the primary
    metric. Size via BSX_BENCH_SKIP_HEADERS (0 disables)."""
    headers = int(os.environ.get("BSX_BENCH_SKIP_HEADERS", "64"))
    if headers <= 0:
        return {}
    budget = int(os.environ.get("BSX_BENCH_SKIP_TIMEOUT", "1500"))
    try:
        proc = subprocess.run(
            [
                sys.executable,
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "benches", "configs.py"),
                "5",
                "--headers",
                str(headers),
                "--validators",
                os.environ.get("BSX_BENCH_SKIP_VALIDATORS", "16"),
            ],
            capture_output=True,
            text=True,
            timeout=budget,
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("config") == 5 and rec.get("ok"):
                out = {
                    "skip_prove_wall_s": rec["prove_s"],
                    "skip_witness_wall_s": rec["witness_s"],
                    "skip_headers": rec["headers"],
                    "skip_validators": rec["validators"],
                }
                # warm = compute-only (phase programs already compiled);
                # cold conflates XLA compile with proving (VERDICT r3 #7)
                if rec.get("prove_warm_s") is not None:
                    out["skip_prove_warm_s"] = rec["prove_warm_s"]
                if rec.get("timing_warm") or rec.get("timing"):
                    out["skip_phase_timing"] = rec.get("timing_warm") or rec["timing"]
                return out
    except Exception:
        pass
    return {"skip_prove_wall_s": None, "skip_headers": headers}


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

    iters = 16
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

    # the other two primary metrics (/root/repo/BASELINE.json:2), carried in
    # the same JSON line; failures degrade to null, never kill the run
    record = {
        "metric": "goldilocks_ntt_butterflies_per_s_per_chip",
        "value": value,
        "unit": "butterflies/s",
        "vs_baseline": value / BASELINE_BUTTERFLIES_PER_S,
    }
    try:
        record["poseidon_permutations_per_s"] = _measure_poseidon()
    except Exception:
        record["poseidon_permutations_per_s"] = None
    try:
        record["ed25519_sigs_per_s"] = _measure_ed25519()
    except Exception:
        record["ed25519_sigs_per_s"] = None
    record.update(_measure_skip_wall())

    # round-over-round tracking with loud >10% regression warnings (stderr,
    # so the driver's JSON-line contract is untouched)
    try:
        from blobstreamx_tpu.utils.perf_history import record as record_history

        hist = {
            "ntt_butterflies_per_s_per_chip": value,
            "poseidon_permutations_per_s": record.get("poseidon_permutations_per_s"),
            "ed25519_sigs_per_s": record.get("ed25519_sigs_per_s"),
            "skip_prove_wall_s": record.get("skip_prove_wall_s"),
            "skip_prove_warm_s": record.get("skip_prove_warm_s"),
            "backend": jax.default_backend(),
        }
        for w in record_history(hist, source="bench.py"):
            print(w, file=sys.stderr)
    except Exception:
        pass

    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
