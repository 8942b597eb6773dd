#!/usr/bin/env python
"""Scaling-efficiency harness (SURVEY.md §7.3 step 9, §5.5; the ≥80 %
multi-host target in BASELINE.md): measures per-kernel throughput at 1 device
and at N devices through the SAME shard_map programs the prover uses, and
writes JSONL records a BASELINE table can consume.

On real pod slices this measures ICI-bound scaling; on the CPU backend with
virtual devices (the only multi-device option in this image, SURVEY.md §4.3
item 4) the numbers validate the *mechanics* — sharding, collectives,
record schema — not silicon performance.

Usage:
  JAX_PLATFORMS=cpu python benches/scaling.py --devices 8 --out scaling.jsonl

Multi-PROCESS mode (jax.distributed bring-up, SURVEY.md §5.8; same recipe a
pod slice uses — CPU loopback validates the path without hardware):

  python benches/scaling.py --coordinator 127.0.0.1:9955 --num-processes 2 \
      --process-id 0 --devices 1 &
  python benches/scaling.py --coordinator 127.0.0.1:9955 --num-processes 2 \
      --process-id 1 --devices 1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time


def _sync(x):
    import jax
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    # slice on device BEFORE fetching (a whole-array fetch costs seconds on
    # the tunneled TPU backend and was round 3's bench-noise root cause)
    np.asarray(leaf.ravel()[:1])


def _time(fn, *args, iters=5, repeats=3):
    fn(*args)  # compile + warm
    _sync(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--log-n", type=int, default=16, help="NTT size exponent")
    ap.add_argument("--hashes", type=int, default=1 << 12)
    ap.add_argument("--out", default="scaling.jsonl")
    ap.add_argument(
        "--weak",
        action="store_true",
        help="weak scaling: PER-DEVICE work constant (global size scales with "
        "D — the shape a pod run uses; VERDICT r4 missing #2c). Efficiency = "
        "t_1(base) / t_D(D*base): 1.0 means D devices finish D units of work "
        "in the single-device single-unit time.",
    )
    from blobstreamx_tpu.parallel.distributed import add_distributed_args, maybe_initialize

    add_distributed_args(ap)
    args = ap.parse_args()

    import os

    import jax

    # Do NOT probe jax.default_backend() here — that initializes the backend
    # and locks the platform before we can request virtual CPU devices.
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or not os.environ.get(
        "BSX_SCALING_REAL", ""
    ):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except Exception:
            pass  # backend already up (e.g. a real pod slice run)

    # multi-host/process bring-up (must precede first backend use); after
    # this, jax.devices() spans every process and the shard_map programs
    # below run as one multi-process SPMD job
    distributed = maybe_initialize(args)
    if distributed:
        import jax as _jax

        print(
            f"jax.distributed up: process {_jax.process_index()}/"
            f"{_jax.process_count()}, {len(_jax.devices())} global devices"
        )

    import numpy as np
    from jax.sharding import Mesh

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl
    from blobstreamx_tpu.ops import ntt as ntt_ops, poseidon as pos
    from blobstreamx_tpu.parallel import mesh as pmesh, ntt as pntt, merkle as pmerkle
    from blobstreamx_tpu.utils.metrics import MetricsWriter

    devices = jax.devices()
    n_dev = min(args.devices, len(devices))
    metrics = MetricsWriter(args.out)
    rng = np.random.default_rng(0)

    # ---- NTT: single-device four-step vs sharded six-step ------------------
    # weak mode: the sharded transform runs at D x the base size, so each
    # device owns a constant base-sized slice
    log_n_sharded = args.log_n + (n_dev - 1).bit_length() if args.weak else args.log_n
    n = 1 << args.log_n
    poly = gf64.from_u64(rng.integers(0, gl.P, size=(n,), dtype=np.uint64))
    t1 = _time(jax.jit(ntt_ops.ntt_four_step), poly)
    bf = ntt_ops.butterfly_count(args.log_n)
    rec1 = {"butterflies_per_s": bf / t1, "devices": 1, "wall_s": t1}
    metrics.emit("ntt_single", n=n, weak=args.weak, **rec1)

    mesh = Mesh(np.array(devices[:n_dev]), (pmesh.AXIS,))
    poly_sharded = (
        gf64.from_u64(
            rng.integers(0, gl.P, size=(1 << log_n_sharded,), dtype=np.uint64)
        )
        if args.weak
        else poly
    )
    bf_sharded = ntt_ops.butterfly_count(log_n_sharded)
    tn = _time(lambda x: pntt.ntt_sharded(x, mesh), poly_sharded)
    recn = {"butterflies_per_s": bf_sharded / tn, "devices": n_dev, "wall_s": tn}
    metrics.emit("ntt_sharded", n=1 << log_n_sharded, weak=args.weak, **recn)
    # one formula covers both modes: efficiency = throughput_D / (D x
    # throughput_1); weak mode just feeds the sharded program D x the work
    eff_ntt = (bf_sharded / tn) / (n_dev * bf / t1)
    metrics.emit("ntt_scaling", devices=n_dev, weak=args.weak, efficiency=eff_ntt)

    # ---- Poseidon tree: single vs column-sharded ----------------------------
    n_leaves = args.hashes
    n_leaves_sharded = n_leaves * n_dev if args.weak else n_leaves
    leaves = gf64.from_u64(rng.integers(0, gl.P, size=(8, n_leaves), dtype=np.uint64))
    from blobstreamx_tpu.ops import merkle as merkle_ops

    t1p = _time(jax.jit(lambda x: merkle_ops.tree_layers(x, 1)[-1]), leaves)
    hashes = 2 * n_leaves - 1
    metrics.emit("poseidon_tree_single", hashes_per_s=hashes / t1p, devices=1, wall_s=t1p)

    leaves_sharded = (
        gf64.from_u64(
            rng.integers(0, gl.P, size=(8, n_leaves_sharded), dtype=np.uint64)
        )
        if args.weak
        else leaves
    )
    hashes_sharded = 2 * n_leaves_sharded - 1
    sh_leaves = jax.device_put(leaves_sharded, pmesh.col_sharding(mesh))
    tnp = _time(
        lambda x: pmerkle.poseidon_tree_sharded(x, mesh, cap_height=0).layers[-1],
        sh_leaves,
    )
    metrics.emit(
        "poseidon_tree_sharded",
        hashes_per_s=hashes_sharded / tnp,
        devices=n_dev,
        weak=args.weak,
        wall_s=tnp,
    )
    eff_pos = (hashes_sharded / tnp) / (n_dev * hashes / t1p)
    metrics.emit("poseidon_scaling", devices=n_dev, weak=args.weak, efficiency=eff_pos)

    # ---- SHA-256 data-commitment tuple tree: single vs leaf-sharded --------
    from blobstreamx_tpu.ops import sha256 as sha_ops

    n_leaves_t = args.hashes
    n_leaves_ts = n_leaves_t * n_dev if args.weak else n_leaves_t
    heights = np.arange(1, n_leaves_t + 1, dtype=np.uint64)
    hlo = (heights & 0xFFFFFFFF).astype(np.uint32)
    hhi = (heights >> 32).astype(np.uint32)
    words = sha_ops.bytes32_to_words([rng.bytes(32) for _ in range(n_leaves_t)])
    import jax as _jax

    # jit the single-device baseline: the eager path dispatches per tree
    # level and would make the sharded (one-program) variant look 100x
    # better than it is (the round-4 sweep's committed distortion)
    t1t = _time(_jax.jit(sha_ops.tuple_tree_root), hlo, hhi, words)
    sha_blocks = 3 * n_leaves_t - 1  # 2 blocks per 64 B leaf + 1 per inner node
    metrics.emit("tuple_tree_single", blocks_per_s=sha_blocks / t1t, devices=1, wall_s=t1t)
    heights_s = np.arange(1, n_leaves_ts + 1, dtype=np.uint64)
    hlo_s = (heights_s & 0xFFFFFFFF).astype(np.uint32)
    hhi_s = (heights_s >> 32).astype(np.uint32)
    words_s = (
        sha_ops.bytes32_to_words([rng.bytes(32) for _ in range(n_leaves_ts)])
        if args.weak
        else words
    )
    sha_blocks_s = 3 * n_leaves_ts - 1
    tnt = _time(lambda: pmerkle.tuple_tree_root_sharded(hlo_s, hhi_s, words_s, mesh))
    metrics.emit(
        "tuple_tree_sharded",
        blocks_per_s=sha_blocks_s / tnt,
        devices=n_dev,
        weak=args.weak,
        wall_s=tnt,
    )
    eff_tuple = (sha_blocks_s / tnt) / (n_dev * sha_blocks / t1t)
    metrics.emit("tuple_tree_scaling", devices=n_dev, weak=args.weak, efficiency=eff_tuple)

    # On CPU virtual devices all D shards share the same cores, so linear-
    # scaling "efficiency" is structurally ~1/D; the meaningful schedule
    # metric off-silicon is the COLLECTIVE OVERHEAD: tn/t1 - 1 (0 = the
    # sharded program costs no more total work than the single-device one).
    print(
        f"devices={n_dev} ntt_eff={eff_ntt:.3f} poseidon_eff={eff_pos:.3f} "
        f"tuple_eff={eff_tuple:.3f} | collective overhead: "
        f"ntt={tn / t1 - 1:+.2%} poseidon={tnp / t1p - 1:+.2%} "
        f"tuple={tnt / t1t - 1:+.2%}"
    )


if __name__ == "__main__":
    main()
