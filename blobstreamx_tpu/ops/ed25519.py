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

from blobstreamx_tpu.golden import ed25519 as gold
from blobstreamx_tpu.ops import curve25519 as curve, msm as msm_ops

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


def batch_verify(items: list[tuple[bytes, bytes, bytes]], zs: list[int] | None = None):
    """items: [(pubkey32, message, signature64)]. Returns (ok, diagnostics).

    ok is False if any encoding is invalid, any s >= L, or the batch equation
    fails. (A False batch can then be bisected with golden.ed25519.verify.)
    """
    n = len(items)
    assert n > 0
    if zs is None:
        zs = derive_z(items)

    # host: scalars
    s_ok = True
    z_r, z_a = [], []
    s_sum = 0
    enc_r, enc_a = [], []
    for (pk, msg, sig), z in zip(items, zs):
        if len(sig) != 64 or len(pk) != 32:
            return False, {"reason": "malformed input"}
        s = int.from_bytes(sig[32:], "little")
        if s >= L:
            s_ok = False
        h = int.from_bytes(gold.sha512(sig[:32] + pk + msg), "little") % L
        z_r.append(z % L)
        z_a.append(z * h % L)
        s_sum = (s_sum + z * s) % L
        enc_r.append(sig[:32])
        enc_a.append(pk)
    if not s_ok:
        return False, {"reason": "s >= L"}

    # device: decompress all R and A points
    encoded = curve.encode_points_host(enc_r + enc_a)
    pts, valid = curve.decompress(encoded)
    valid_np = np.asarray(valid)
    if not valid_np.all():
        return False, {"reason": "invalid point encoding", "lanes": np.where(~valid_np)[0]}

    # append B with scalar (-sum z_i s_i) mod L
    b = curve.base_point(1)
    points = tuple(np.concatenate([np.asarray(c), np.asarray(cb)], axis=1) for c, cb in zip(pts, b))
    import jax.numpy as jnp

    points = tuple(jnp.asarray(c) for c in points)
    scalars = z_r + z_a + [(L - s_sum) % L]
    digits = msm_ops.scalars_to_digits(scalars)

    result = msm_ops.msm_jit(points, digits)
    ok = bool(np.asarray(curve.is_identity(result))[0])
    return ok, {"n": n, "msm_points": len(scalars)}
