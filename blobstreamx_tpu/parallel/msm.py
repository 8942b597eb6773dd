"""Multi-chip Pippenger MSM and Ed25519 batch verification (component C6;
config 3 at /root/repo/BASELINE.json:9; SURVEY.md §2.3 "EP" row: bucket
ownership + collective reduction).

Plan (one shard_map program over the 1-D mesh):

  1. points/digits partitioned per chip (data parallel) — each chip runs the
     single-chip stream-parallel bucket accumulation on its slice.
  2. bucket copies are combined across chips by a recursive-doubling
     all-reduce whose monoid is the complete-Edwards point addition: log2(D)
     rounds of ppermute(XOR partner) + batched point add over ICI. (A psum
     cannot reduce curve points — addition is the group law, not integer
     add — so the reduction is built from ppermute, the TPU-native ring/
     butterfly primitive.)
  3. the per-window weighted bucket reduction (the suffix-scan heavy phase)
     is sharded over the *window* axis: each chip reduces W/D windows.
  4. window results are all_gather'd (tiny: W points) and the final Horner
     combine runs replicated.

Same code runs on the 8-device CPU simulation and a real slice.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from blobstreamx_tpu.ops import curve25519 as curve, msm as msm_ops
from .mesh import AXIS


def _allreduce_points(p: curve.Point, n_devices: int) -> curve.Point:
    """Recursive-doubling all-reduce with the Edwards group law as monoid."""
    step = 1
    while step < n_devices:
        perm = [(i, i ^ step) for i in range(n_devices)]
        received = tuple(jax.lax.ppermute(c, AXIS, perm) for c in p)
        p = curve.add(p, received)
        step *= 2
    return p


def _local_msm(xlo, ylo, zlo, tlo, digits, *, n_devices: int, streams: int, c: int):
    points = (xlo, ylo, zlo, tlo)
    w = digits.shape[0]
    # 1. local bucket accumulation over this chip's point slice
    buckets = msm_ops.accumulate_buckets(points, digits, streams=streams, c=c)
    # 2. cross-chip bucket combine (Edwards all-reduce over ICI)
    buckets = _allreduce_points(buckets, n_devices)
    # 3. window-sharded weighted reduction
    b = 1 << c
    if w % n_devices == 0:
        my = jax.lax.axis_index(AXIS)
        w_local = w // n_devices
        sliced = tuple(
            jax.lax.dynamic_slice_in_dim(x, my * w_local * b, w_local * b, axis=1)
            for x in buckets
        )
        windows = msm_ops.reduce_buckets(sliced, w_local, c=c)
        windows = tuple(jax.lax.all_gather(x, AXIS, axis=1, tiled=True) for x in windows)
    else:
        windows = msm_ops.reduce_buckets(buckets, w, c=c)
    # 4. replicated Horner combine
    return msm_ops.combine_windows(windows, c=c)


@lru_cache(maxsize=None)
def _msm_fn(mesh, streams: int, c: int):
    d = mesh.devices.size
    pt_spec = P(None, AXIS)
    fn = partial(_local_msm, n_devices=d, streams=streams, c=c)
    return jax.jit(
        shard_map(
            fn,
            mesh=mesh,
            in_specs=(pt_spec, pt_spec, pt_spec, pt_spec, P(None, AXIS)),
            out_specs=(P(None, None),) * 4,
            check_vma=False,
        )
    )


def msm_sharded(points: curve.Point, digits, mesh, streams: int = 16) -> curve.Point:
    """Multi-chip MSM. points: (16, N) coord tuple; digits: (W, N) uint32.

    The window width c is inferred from the digit matrix (W = ceil(256/c)),
    so callers pick the compile/runtime tradeoff by choosing their
    scalars_to_digits c — narrow windows compile far faster (fewer bucket
    lanes), wide windows do fewer scan steps on big batches.

    Pads N to a multiple of D*streams with identity/digit-0 lanes (free:
    bucket 0 is never reduced), shards points per chip, returns the
    replicated (16, 1) result point.
    """
    d = mesh.devices.size
    w = int(digits.shape[0])
    c = -(-256 // w)
    assert -(-256 // c) == w, f"digit rows {w} do not match a window width"
    # W -> c is not injective (e.g. c=17 also yields W=16): a digit built
    # with a wider window would overflow the 2^c bucket lanes and JAX's
    # clamping scatter would produce a WRONG result silently (ADVICE r4).
    dmax = int(np.asarray(digits).max()) if digits.size else 0
    assert dmax < (1 << c), f"digit {dmax} overflows inferred window c={c}"
    points, digits = msm_ops.pad_to_streams(points, digits, streams=streams * d)
    sharding = NamedSharding(mesh, P(None, AXIS))
    points = jax.device_put(points, sharding)
    digits = jax.device_put(digits, sharding)
    return _msm_fn(mesh, streams, c)(*points, digits)


@lru_cache(maxsize=None)
def _msm_bitwise_fn(mesh):
    d = mesh.devices.size

    def local(p0, p1, p2, p3, bits):
        wins = msm_ops.msm_bitwise_windows_device((p0, p1, p2, p3), bits)
        return _allreduce_points(wins, d)  # (16, W) replicated

    pt_spec = P(None, AXIS)
    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(pt_spec, pt_spec, pt_spec, pt_spec, P(None, AXIS)),
            out_specs=(P(None, None),) * 4,
            check_vma=False,
        )
    )


def msm_bitwise_sharded(points: curve.Point, scalars: list[int], mesh):
    """Multi-chip bitwise-window MSM (the round-5 no-gather/no-scatter
    formulation, ops.msm.msm_bitwise_windows_device): points partitioned per
    chip, each chip masked-tree-sums its slice's 256 window sums locally,
    and the (16, 256) window points all-reduce across chips by the Edwards
    ppermute reduction — a fixed 256-lane payload per round regardless of N.
    Returns host extended coords (x, y, z, t) as python ints."""
    d = mesh.devices.size
    bits = msm_ops.scalars_to_digits(scalars, c=1)
    n = bits.shape[1]
    # per-chip slices must be equal power-of-two lanes (>= 2) for the local
    # compacting tree: pad N up to d * 2^k
    per = max(2, -(-n // d))
    per = 1 << (per - 1).bit_length()
    n2 = d * per
    if n2 != n:
        idn = curve.identity(n2 - n)
        points = tuple(jnp.concatenate([a, b], axis=1) for a, b in zip(points, idn))
        bits = np.concatenate([bits, np.zeros((bits.shape[0], n2 - n), np.uint32)], axis=1)
    sharding = NamedSharding(mesh, P(None, AXIS))
    points = jax.device_put(points, sharding)
    bits_d = jax.device_put(jnp.asarray(bits), sharding)
    wins = _msm_bitwise_fn(mesh)(*points, bits_d)
    return msm_ops.combine_windows_host(jnp.stack(wins, axis=0), 1)


def batch_verify_sharded(
    items, mesh, zs=None, streams: int = 16, c: int = msm_ops.FAST_WINDOW_BITS
):
    """Multi-chip Ed25519 batch verification: decompression data-parallel,
    batch equation as one sharded (2n+1)-point MSM. Same protocol as
    ops.ed25519.batch_verify. Narrow windows (c=4) by default, matching the
    fast single-chip path: fewer bucket lanes compile far faster and the
    result is bit-identical."""
    from blobstreamx_tpu.ops import ed25519 as dev_ed

    prep = dev_ed.prepare_batch(items, zs, c=c)
    if prep is None:
        return False, {"reason": "malformed input or s >= L"}
    points, digits, n_invalid = prep
    if n_invalid:
        return False, {"reason": "invalid point encoding"}
    result = msm_sharded(points, digits, mesh, streams=streams)
    ok = bool(np.asarray(curve.is_identity(result))[0])
    return ok, {"n": len(items), "msm_points": digits.shape[1]}
