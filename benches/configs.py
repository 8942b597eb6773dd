#!/usr/bin/env python
"""Measure the BASELINE.md config ladder on the locally visible accelerator
(configs 1-4; config 5's full-scale run needs a pod slice). Prints one JSON
line per config; paste results into BASELINE.md."""

from __future__ import annotations

import json
import time


def _sync(x):
    import jax
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jax.device_get(leaf)).ravel()[:1]


def _time(fn, *args, iters=5):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import numpy as np

    from blobstreamx_tpu.fields import gf64
    from blobstreamx_tpu.golden import goldilocks as gl, merkle as gmerkle
    from blobstreamx_tpu.ops import ntt as ntt_ops, poseidon as pos
    from blobstreamx_tpu.circuits.data_commitment import data_commitment_device

    backend = jax.default_backend()
    rng = np.random.default_rng(0)

    # config 1: 64-leaf tuple root, bit-exact (correctness gate + wall clock)
    heights = list(range(1, 65))
    hashes = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(64)]
    t0 = time.perf_counter()
    root = data_commitment_device(heights, hashes)
    dt1 = time.perf_counter() - t0
    ok = root == gmerkle.data_commitment(heights, hashes)
    print(json.dumps({"config": 1, "bit_exact": bool(ok), "wall_s": dt1, "backend": backend}))

    # config 2: 2^16 Poseidon permutations, batched, bit-exact digests
    n = 1 << 16
    states = gf64.from_u64(rng.integers(0, gl.P, size=(12, n), dtype=np.uint64))
    states = jax.device_put(states)
    f = jax.jit(pos.permute)
    dt2 = _time(f, states, iters=10)
    print(
        json.dumps(
            {"config": 2, "hashes_per_s": n / dt2, "wall_s": dt2, "backend": backend}
        )
    )

    # config 3: Ed25519 batch verify, 256 signatures
    from blobstreamx_tpu.golden import ed25519 as ged
    from blobstreamx_tpu.ops import ed25519 as ed_ops

    items = []
    for i in range(256):
        sk = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        msg = b"bench-%d" % i
        pk = ged.public_key(sk)
        sig = ged.sign(sk, msg)
        items.append((pk, msg, sig))
    t0 = time.perf_counter()
    ok3 = ed_ops.batch_verify(items)
    dt3 = time.perf_counter() - t0
    t0 = time.perf_counter()
    ok3 = ed_ops.batch_verify(items)
    dt3 = time.perf_counter() - t0  # second run: jit warm
    print(
        json.dumps(
            {
                "config": 3,
                "ok": bool(ok3),
                "sigs_per_s": 256 / dt3,
                "wall_s": dt3,
                "backend": backend,
            }
        )
    )

    # config 4: 2^22 NTT + FRI fold
    from blobstreamx_tpu.ops import fri as fri_ops

    x = jax.device_put(gf64.from_u64(rng.integers(0, gl.P, size=(1 << 22,), dtype=np.uint64)))
    f4 = jax.jit(ntt_ops.ntt_four_step)
    dt4 = _time(f4, x, iters=10)
    bf = ntt_ops.butterfly_count(22)
    print(
        json.dumps(
            {
                "config": 4,
                "butterflies_per_s": bf / dt4,
                "ntt_wall_s": dt4,
                "backend": backend,
            }
        )
    )


if __name__ == "__main__":
    main()
