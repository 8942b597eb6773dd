"""Ed25519 batch verification via Pippenger MSM (component C6;
config 3 at /root/repo/BASELINE.json:9).

Checks the random-linear-combination batch equation (cofactorless, matching
TendermintX semantics and golden.ed25519.batch_verify_equation):

    sum_i z_i R_i + sum_i (z_i h_i mod L) A_i + [(-sum_i z_i s_i) mod L] B
        == identity

as ONE (2n+1)-point MSM on device. Host work is O(n) tiny scalar math:
h_i = SHA-512(R_i ‖ A_i ‖ M_i) mod L (hashing public data), the z_i
coefficients (derived deterministically by hashing the whole batch — a
Fiat-Shamir-style derivation, so verification is reproducible), and the digit
matrix. Point decompression, every curve op, and the MSM run batched on
device.
"""

from __future__ import annotations

import hashlib

import numpy as np

import jax

from blobstreamx_tpu.golden import ed25519 as gold
from blobstreamx_tpu.ops import curve25519 as curve, msm as msm_ops

# module-level jit: an inline jax.jit(...) per call would recompile each time
_is_identity_jit = jax.jit(curve.is_identity)

L = gold.L


def derive_z(items: list[tuple[bytes, bytes, bytes]], bits: int = 128) -> list[int]:
    """Deterministic 128-bit batch coefficients from the batch transcript."""
    h = hashlib.sha512()
    for pk, msg, sig in items:
        h.update(pk)
        h.update(sig)
        h.update(hashlib.sha512(msg).digest())
    seed = h.digest()
    zs = []
    for i in range(len(items)):
        d = hashlib.sha512(seed + i.to_bytes(4, "little")).digest()
        zs.append((int.from_bytes(d[:16], "little") | 1) & ((1 << bits) - 1))
    return zs


def prepare_batch(
    items: list[tuple[bytes, bytes, bytes]],
    zs: list[int] | None = None,
    c: int = msm_ops.WINDOW_BITS,
):
    """Host scalar math + device decompression for the batch equation.

    Returns (points, digits, n_invalid) — the (2n+1)-point MSM inputs — or
    None if any input is malformed or any s >= L. n_invalid counts lanes
    whose point encoding failed to decompress. c: digit window bits.
    """
    assert len(items) > 0
    if zs is None:
        zs = derive_z(items)

    z_r, z_a = [], []
    s_sum = 0
    enc_r, enc_a = [], []
    for (pk, msg, sig), z in zip(items, zs):
        if len(sig) != 64 or len(pk) != 32:
            return None
        s = int.from_bytes(sig[32:], "little")
        if s >= L:
            return None
        # hashlib, not the golden pure-python SHA-512: this is the production
        # host path (the golden model is the device kernel's oracle; here it
        # cost ~100 ms/signature -- 25 s of a 27 s batch-prepare)
        h = int.from_bytes(hashlib.sha512(sig[:32] + pk + msg).digest(), "little") % L
        z_r.append(z % L)
        z_a.append(z * h % L)
        s_sum = (s_sum + z * s) % L
        enc_r.append(sig[:32])
        enc_a.append(pk)

    # device: decompress all R and A points
    encoded = curve.encode_points_host(enc_r + enc_a)
    pts, valid = curve.decompress(encoded)
    n_invalid = int((~np.asarray(valid)).sum())

    # append B with scalar (-sum z_i s_i) mod L
    import jax.numpy as jnp

    b = curve.base_point(1)
    points = tuple(jnp.concatenate([co, cb], axis=1) for co, cb in zip(pts, b))
    scalars = z_r + z_a + [(L - s_sum) % L]
    digits = msm_ops.scalars_to_digits(scalars, c)
    return points, digits, n_invalid


from functools import partial as _partial

import jax.numpy as jnp


@_partial(jax.jit, static_argnames=("c", "streams"))
def _batch_device(y_limbs, signs, digits, c: int, streams: int):
    """The whole device side of batch verification as ONE program: point
    decompression of the 2n R/A encodings, append the base point, identity-
    pad to the stream multiple, Pippenger bucket accumulation and window
    reduction. One upload + one dispatch + one fetch — on a tunneled
    backend each extra host<->device round trip costs ~10-20 ms, which had
    come to dominate the optimized pipeline (benches/ed_profile.py)."""
    from blobstreamx_tpu.ops import curve25519 as curve

    pts, valid = curve._decompress_core(y_limbs, signs)
    b = curve.base_point(1)
    points = tuple(jnp.concatenate([co, cb], axis=1) for co, cb in zip(pts, b))
    n_pts = points[0].shape[1]
    pad = (-n_pts) % streams
    if pad:
        idn = curve.identity(pad)
        points = tuple(jnp.concatenate([co, ci], axis=1) for co, ci in zip(points, idn))
    w = digits.shape[0]
    buckets = msm_ops.accumulate_buckets(points, digits, streams=streams, c=c)
    wins = msm_ops.reduce_buckets(buckets, w, c=c)
    return jnp.stack(wins, axis=0), jnp.all(valid)


@_partial(jax.jit)
def _batch_device_bitwise(y_limbs, signs, bits):
    """Device side of batch verification over the BITWISE-window MSM
    (ops.msm.msm_bitwise_windows_device): decompression + masked tree sums,
    no gathers or scatters anywhere. bits: (256, N_pow2) 0/1, N_pow2 covers
    2n+1 points (identity-padded here to match)."""
    from blobstreamx_tpu.ops import curve25519 as curve

    pts, valid = curve._decompress_core(y_limbs, signs)
    b = curve.base_point(1)
    points = tuple(jnp.concatenate([co, cb], axis=1) for co, cb in zip(pts, b))
    n_pts = points[0].shape[1]
    pad = bits.shape[1] - n_pts
    if pad:
        idn = curve.identity(pad)
        points = tuple(jnp.concatenate([co, ci], axis=1) for co, ci in zip(points, idn))
    wins = msm_ops.msm_bitwise_windows_device(points, bits)
    return jnp.stack(wins, axis=0), jnp.all(valid)


def batch_verify(
    items: list[tuple[bytes, bytes, bytes]],
    zs: list[int] | None = None,
    c: int | None = None,
    streams: int | None = None,
    method: str | None = None,
):
    """items: [(pubkey32, message, signature64)]. Returns (ok, diagnostics).

    ok is False if any encoding is invalid, any s >= L, or the batch equation
    fails. (A False batch can then be bisected with golden.ed25519.verify.)

    Fast path (profiled, benches/ed_profile.py): host scalar math, then ONE
    device program (decompression + bucketized Pippenger to the per-window
    results, narrow windows + Pallas-fused complete adds), then the O(W)
    weighted combine and identity test on host bigints — the device work is
    latency-bound, so round trips and sequential point ops are what count.

    c/streams default to the TPU-profiled fast config; tests pass small
    values (the compile scales with streams x 2^c bucket lanes).

    method: "bucket" (stream-parallel bucketized Pippenger) or "bitwise"
    (c=1 masked-tree-sum MSM, no gathers/scatters — see ops.msm). Both
    compute the same group element; the equation check is identical.
    Measured on the v5e chip at 256 signatures (2026-08-22): bucket
    3,604 sigs/s vs bitwise 2,551 — the bitwise path's power-of-two
    padding (513 -> 1024 lanes) and c=1's 4x add count outweigh its
    gather/scatter savings at this batch size, so bucket stays the
    default everywhere; bitwise remains the multichip gate's MSM (it
    compiles clean where the bucket scan loops XLA:CPU's simplifier).
    """
    if method is None:
        method = "bucket"
    c = msm_ops.FAST_WINDOW_BITS if c is None else c
    streams = msm_ops.fast_streams() if streams is None else streams
    assert len(items) > 0
    if zs is None:
        zs = derive_z(items)
    z_r, z_a = [], []
    s_sum = 0
    enc_r, enc_a = [], []
    for (pk, msg, sig), z in zip(items, zs):
        if len(sig) != 64 or len(pk) != 32:
            return False, {"reason": "malformed input or s >= L"}
        s = int.from_bytes(sig[32:], "little")
        if s >= L:
            return False, {"reason": "malformed input or s >= L"}
        h = int.from_bytes(hashlib.sha512(sig[:32] + pk + msg).digest(), "little") % L
        z_r.append(z % L)
        z_a.append(z * h % L)
        s_sum = (s_sum + z * s) % L
        enc_r.append(sig[:32])
        enc_a.append(pk)

    from blobstreamx_tpu.ops import curve25519 as curve

    y_limbs, signs = curve.unpack_y_limbs_host(
        curve.encode_points_host(enc_r + enc_a)
    )
    scalars = z_r + z_a + [(L - s_sum) % L]
    if method == "bitwise":
        bits = msm_ops.scalars_to_digits(scalars, 1)
        n2 = max(2, 1 << (bits.shape[1] - 1).bit_length())
        if n2 != bits.shape[1]:
            bits = np.concatenate(
                [bits, np.zeros((bits.shape[0], n2 - bits.shape[1]), np.uint32)],
                axis=1,
            )
        wins, valid = _batch_device_bitwise(y_limbs, signs, jnp.asarray(bits))
        result = msm_ops.combine_windows_host(wins, 1)
        n_msm = int(bits.shape[1])
    else:
        digits = msm_ops.scalars_to_digits(scalars, c)
        pad = (-digits.shape[1]) % streams
        if pad:
            digits = np.concatenate(
                [digits, np.zeros((digits.shape[0], pad), np.uint32)], axis=1
            )
        wins, valid = _batch_device(y_limbs, signs, digits, c, streams)
        result = msm_ops.combine_windows_host(wins, c)
        n_msm = int(digits.shape[1])
    if not bool(np.asarray(valid)):
        return False, {"reason": "invalid point encoding"}
    ok = gold.point_equal(result, gold.IDENTITY)
    return ok, {"n": len(items), "msm_points": n_msm, "method": method}
