#!/usr/bin/env python
"""Phase profile of config 3 (Ed25519 batch verify, 256 signatures):
separates host scalar prep, device decompression, digit matrix build, the
Pippenger MSM, and the identity check — the breakdown VERDICT r2 asked for
(BASELINE.md provenance). Prints one JSON line."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


def _sync(x):
    import jax
    import numpy as np

    jax.block_until_ready(x)
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def main() -> None:
    import numpy as np

    import jax

    from blobstreamx_tpu.golden import ed25519 as ged
    from blobstreamx_tpu.ops import curve25519 as curve, ed25519 as ed_ops, msm as msm_ops

    n = 256
    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        sk = bytes(rng.integers(0, 256, 32, dtype=np.uint8))
        msg = b"bench-%d" % i
        items.append((ged.public_key(sk), msg, ged.sign(sk, msg)))

    # warm everything once (compiles)
    ok, _ = ed_ops.batch_verify(items)
    assert ok

    rec = {"n": n, "backend": jax.default_backend()}

    # --- host scalar math (hashing + z derivation), no device ---------------
    import hashlib

    t0 = time.perf_counter()
    zs = ed_ops.derive_z(items)
    z_r, z_a, s_sum = [], [], 0
    L = ged.L
    for (pk, msg, sig), z in zip(items, zs):
        s = int.from_bytes(sig[32:], "little")
        h = int.from_bytes(hashlib.sha512(sig[:32] + pk + msg).digest(), "little") % L
        z_r.append(z % L)
        z_a.append(z * h % L)
        s_sum = (s_sum + z * s) % L
    rec["host_scalar_s"] = time.perf_counter() - t0

    # --- device decompression ----------------------------------------------
    enc = curve.encode_points_host([sig[:32] for _, _, sig in items] + [pk for pk, _, _ in items])
    t0 = time.perf_counter()
    pts, valid = curve.decompress(enc)
    _sync(pts)
    rec["decompress_s"] = time.perf_counter() - t0

    # --- digit matrix (host) ------------------------------------------------
    scalars = z_r + z_a + [(L - s_sum) % L]
    t0 = time.perf_counter()
    digits = msm_ops.scalars_to_digits(scalars)
    rec["digits_s"] = time.perf_counter() - t0

    # --- MSM (device) -------------------------------------------------------
    import jax.numpy as jnp

    b = curve.base_point(1)
    points = tuple(jnp.concatenate([c, cb], axis=1) for c, cb in zip(pts, b))
    p_pad, d_pad = msm_ops.pad_to_streams(points, digits)
    _sync(msm_ops._msm_jitted(p_pad, d_pad))  # warm exact shape
    t0 = time.perf_counter()
    out = msm_ops._msm_jitted(p_pad, d_pad)
    _sync(out)
    rec["msm_s"] = time.perf_counter() - t0

    # --- stage split inside the MSM ----------------------------------------
    acc_j = jax.jit(lambda p, d: msm_ops.accumulate_buckets(p, d))
    _sync(acc_j(p_pad, d_pad))
    t0 = time.perf_counter()
    buckets = acc_j(p_pad, d_pad)
    _sync(buckets)
    rec["msm_accumulate_s"] = time.perf_counter() - t0

    red_j = jax.jit(lambda b: msm_ops.reduce_buckets(b, msm_ops.NUM_WINDOWS))
    _sync(red_j(buckets))
    t0 = time.perf_counter()
    wins = red_j(buckets)
    _sync(wins)
    rec["msm_reduce_s"] = time.perf_counter() - t0

    comb_j = jax.jit(msm_ops.combine_windows)
    _sync(comb_j(wins))
    t0 = time.perf_counter()
    res = comb_j(wins)
    _sync(res)
    rec["msm_combine_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    ident = bool(np.asarray(jax.jit(curve.is_identity)(res))[0])
    rec["identity_check_s"] = time.perf_counter() - t0
    rec["ok"] = ident

    # --- fast path variants: device windows + host combine ------------------
    for c, streams in ((4, 64), (4, 128), (4, 256), (2, 256), (8, 64)):
        digs = msm_ops.scalars_to_digits(scalars, c)
        try:
            pp, dd = msm_ops.pad_to_streams(points, digs, streams=streams)
            _sync(msm_ops._msm_windows_jitted(pp, dd, c, streams))  # warm
            t0 = time.perf_counter()
            wins = msm_ops._msm_windows_jitted(pp, dd, c, streams)
            _sync(wins)
            dt_dev = time.perf_counter() - t0
            t0 = time.perf_counter()
            res = msm_ops.combine_windows_host(wins, c)
            dt_host = time.perf_counter() - t0
            rec[f"fast_c{c}_k{streams}_windows_s"] = dt_dev
            rec[f"fast_c{c}_k{streams}_hostcombine_s"] = dt_host
        except Exception as e:
            rec[f"fast_c{c}_k{streams}_error"] = str(e)[:80]

    # --- end-to-end warm ----------------------------------------------------
    t0 = time.perf_counter()
    ok, _ = ed_ops.batch_verify(items)
    rec["end_to_end_s"] = time.perf_counter() - t0
    rec["sigs_per_s"] = n / rec["end_to_end_s"]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
