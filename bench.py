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


def _timed(fn, x, iters: int, repeats: int = 10) -> float:
    """Best-of-`repeats` timing of `iters` chained calls.

    Round 3 recorded 28% swings on UNCHANGED kernel code (perf_history
    d6432ae vs 650eb01), and the round-5 variance probe
    (benches/variance_probe.py, committed data benches/variance_r5.jsonl)
    measured 7-14% spread across 8 fresh samples of best-of-4 windows on
    unchanged kernels — single-sample timing on a tunneled backend folds
    host jitter and tunnel stalls into the metric. The min over MANY
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
    """Config-2 shape: 2^20 width-12 permutations (the Merkle-leaf regime —
    a 2^18-row rate-4 LDE commits >2^20 leaf hashes), best of XLA/Pallas.
    Round 5 moved the batch from 2^16 to 2^20: grid overhead dominates small
    batches (8.4 M/s at 2^16 vs 13.9 M/s at 2^20 on identical kernels,
    benches/variance_r5.jsonl + the round-5 block sweep in BASELINE.md)."""
    import jax

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl
    from blobstreamx_tpu.ops import poseidon as pos

    n = 1 << 20
    rng = np.random.default_rng(0)
    states = jax.device_put(
        gf64.from_u64(rng.integers(0, gl.P, size=(12, n), dtype=np.uint64))
    )
    best = None
    for fn in (pos.permute, pos.permute_pallas):
        try:
            dt = _timed(jax.jit(fn), states, 8, repeats=6)
            best = dt if best is None else min(best, dt)
        except Exception:
            pass
    return None if best is None else n / best


def _measure_sha256() -> float | None:
    """Device SHA-256 compression throughput (blocks/s): 8 chained blocks
    per lane x 8192 lanes, the batched-STARK witness hot shape. The
    consensus phase and the full-coverage SHA STARK are SHA-dominated
    (VERDICT r4 weak #7 / SURVEY.md §2.2 C4), so the driver bench carries
    the number each round."""
    import time

    import jax

    from blobstreamx_tpu.ops import sha256 as sha_ops

    b, n = 8, 8192
    rng = np.random.default_rng(0)
    blocks = jax.device_put(
        rng.integers(0, 1 << 32, size=(b, 16, n), dtype=np.uint64).astype(np.uint32)
    )
    fn = jax.jit(sha_ops.sha256_packed)
    out = fn(blocks)
    jax.block_until_ready(out)
    _ = np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(10):
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn(blocks)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][:1])
        best = min(best, (time.perf_counter() - t0) / 8)
    return b * n / best


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
    headers = int(os.environ.get("BSX_BENCH_SKIP_HEADERS", "1024"))
    if headers <= 0:
        return {}
    budget = int(os.environ.get("BSX_BENCH_SKIP_TIMEOUT", "2400"))
    args = [
        sys.executable,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "benches", "configs.py"),
        "5",
        "--headers",
        str(headers),
        "--validators",
        os.environ.get("BSX_BENCH_SKIP_VALIDATORS", "32"),
    ]
    tier = os.environ.get("BSX_BENCH_SKIP_TIER", "default")
    if tier == "full":
        args += ["--sha-stark-full", "--ed-stark"]
    try:
        proc = subprocess.run(args, capture_output=True, text=True, timeout=budget)
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("config") == 5 and rec.get("ok"):
                # headline = WARM wall (compute-only; phase programs already
                # compiled — the number that scales to production, where one
                # compile amortizes over every proof). Cold listed separately
                # (VERDICT r4 missing #4).
                warm = rec.get("prove_warm_s")
                out = {
                    "skip_prove_wall_s": warm if warm is not None else rec["prove_s"],
                    "skip_prove_cold_s": rec["prove_s"],
                    "skip_witness_wall_s": rec["witness_s"],
                    "skip_headers": rec["headers"],
                    "skip_validators": rec["validators"],
                    "skip_tier": tier,
                }
                if warm is not None:
                    out["skip_prove_warm_s"] = warm
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
    # two candidate paths: plain XLA four-step and the all-stages-in-VMEM
    # Pallas kernel. (The split-butterfly Pallas variant measured 4x slower
    # on this chip — benches/variance_r5.jsonl — and is skipped to save its
    # multi-minute tunnel compile.) Two interleaved passes per variant so a
    # transient tunnel stall can't taint a whole variant's window set.
    variants = [jax.jit(ntt_ops.ntt_four_step)]
    try:
        variants.append(jax.jit(ntt_ops.ntt_four_step_pallas))
    except Exception:
        pass
    dt = float("inf")
    for _ in range(2):
        for fn in variants:
            try:
                dt = min(dt, _timed(fn, x, iters, repeats=5))
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
    try:
        record["sha256_blocks_per_s"] = _measure_sha256()
    except Exception:
        record["sha256_blocks_per_s"] = None
    record.update(_measure_skip_wall())

    # round-over-round tracking with loud >10% regression warnings (stderr,
    # so the driver's JSON-line contract is untouched)
    try:
        from blobstreamx_tpu.utils.perf_history import record as record_history

        hist = {
            "ntt_butterflies_per_s_per_chip": value,
            "poseidon_permutations_per_s": record.get("poseidon_permutations_per_s"),
            "ed25519_sigs_per_s": record.get("ed25519_sigs_per_s"),
            "sha256_blocks_per_s": record.get("sha256_blocks_per_s"),
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
