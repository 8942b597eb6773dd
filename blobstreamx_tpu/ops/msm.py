"""Pippenger bucketized multi-scalar multiplication on TPU (component C6;
config 3 at /root/repo/BASELINE.json:9).

TPU-native formulation (SURVEY.md §7.2 item 2): no data-dependent branching —
bucket accumulation is a lax.scan over point *groups*, with K parallel streams
each owning a private bucket copy so every scan step performs one fully
vectorized complete-Edwards addition across (windows x streams) lanes:

  - scalars -> (W, N) c-bit digit matrix (host, tiny)
  - scan step i: for every window w and stream k, add point i_k into bucket
    digits[w, i_k] of stream k's copy — a gather + batched point add + scatter
    over W*K lanes
  - merge the K stream copies (log K batched adds over W*2^c lanes)
  - per-window weighted bucket reduction sum_b b*S_b via a reversed
    Hillis-Steele suffix scan (c batched adds) + log-depth total
  - window combine by Horner under lax.scan (c doublings + 1 add per window)

Buckets are identity-initialized; digit-0 entries land in bucket 0, which the
weighted reduction excludes, so padding points with digit 0 is free.

Trace-size discipline: every log-depth reduction (stream merge, suffix scan,
bucket-total tree) runs as a lax.scan over its step schedule with masked
dynamic gathers, so the whole MSM traces ~6 point additions instead of ~30 —
a complete-Edwards add inlines ~9 field muls and XLA compile time scales with
trace size (an unrolled version took ~3 min to compile on CPU).

The multi-chip version partitions points per chip and merges bucket copies
across chips the same way it merges streams (blobstreamx_tpu.parallel.msm).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.ops import curve25519 as curve

WINDOW_BITS = 8
NUM_WINDOWS = 32  # ceil(256 / 8)
NUM_BUCKETS = 1 << WINDOW_BITS

# Batch-verify path defaults (profiled on TPU v5e, benches/ed_profile.py):
# narrow windows + moderate stream count minimize SEQUENTIAL point ops —
# the scan steps are latency-bound (each complete add inlines ~9 field
# muls), so step count beats per-step lane width, but the log2(K) stream
# merge works on W*2^c*K lanes and starts dominating past K=64 (measured:
# c4/K64 107 ms, c4/K128 183 ms, c4/K256 401 ms, c8/K64 767 ms for the
# 513-point batch). c=4 also shortens the bucket suffix scan (4 steps).
FAST_WINDOW_BITS = 4
FAST_STREAMS = 64


def fast_streams() -> int:
    """Backend-aware stream count for the batch-verify path. The K=64
    TPU-profiled config means a 64*16*64-lane bucket array whose complete-
    Edwards scan costs XLA:CPU minutes of compile; 4 streams keep the CPU
    (test) backend bounded. Values are bit-identical either way
    (tests/test_curve_msm.py pins the two fold paths to equal results)."""
    return FAST_STREAMS if jax.default_backend() == "tpu" else 4


def scalars_to_digits(scalars: list[int], c: int = WINDOW_BITS) -> np.ndarray:
    """(W, N) uint32 digit matrix, digit[w, i] = (s_i >> (c*w)) & (2^c - 1)."""
    w = -(-256 // c)
    out = np.zeros((w, len(scalars)), dtype=np.uint32)
    for i, s in enumerate(scalars):
        assert 0 <= s < (1 << 256)
        for j in range(w):
            out[j, i] = (s >> (c * j)) & ((1 << c) - 1)
    return out


def _gather_point(p: curve.Point, idx) -> curve.Point:
    return tuple(jnp.take(c, idx, axis=1) for c in p)


def _scatter_set(dst: curve.Point, idx, src: curve.Point) -> curve.Point:
    return tuple(d.at[:, idx].set(s) for d, s in zip(dst, src))


def pad_to_streams(points: curve.Point, digits, streams: int = 16):
    """Pad (points, digits) with identity/digit-0 lanes to a multiple of the
    stream count. Call BEFORE the jitted MSM so n=1..streams share one
    compiled executable (digit-0 padding is free: bucket 0 is never reduced)."""
    w, n = np.asarray(digits).shape
    pad = (-n) % streams
    if pad:
        idn = curve.identity(pad)
        points = tuple(jnp.concatenate([a, b], axis=1) for a, b in zip(points, idn))
        digits = np.concatenate([np.asarray(digits), np.zeros((w, pad), np.uint32)], axis=1)
    return points, jnp.asarray(digits)


def _fold_groups(p: curve.Point, group: int) -> curve.Point:
    """Sum each contiguous `group`-lane block into its lane 0.

    p: (16, M) with M a multiple of `group` (a power of two). Lane layout
    g*group + j. After the scan, lane j=0 of each block holds the block sum;
    other lanes are stale. One point add in the traced body.
    """
    m = p[0].shape[1]
    assert group & (group - 1) == 0 and m % group == 0
    lane = jnp.arange(m)
    j = lane % group
    halves = jnp.asarray([group >> (i + 1) for i in range(group.bit_length() - 1)], jnp.int32)

    def step(s, h):
        src = _gather_point(s, jnp.minimum(lane + h, m - 1))
        summed = curve.add_fused(s, src)
        return curve.select(j < h, summed, s), None

    out, _ = jax.lax.scan(step, p, halves)
    return out


def _fold_groups_compact(p: curve.Point, group: int) -> curve.Point:
    """Sum each contiguous `group`-lane block, COMPACTING: returns the
    (16, M/group) block sums directly. Unlike _fold_groups (whose masked
    full-width adds keep every stale lane busy), each tree level here adds
    only the surviving half — total work 2M lane-adds instead of M*log2(G),
    and every add is a clean Pallas-tileable slab (no masks, no gathers)."""
    m = p[0].shape[1]
    assert group & (group - 1) == 0 and m % group == 0
    n_groups = m // group
    x = tuple(c.reshape(16, n_groups, group) for c in p)
    g = group
    while g > 1:
        half = g // 2
        left = tuple(c[:, :, :half].reshape(16, n_groups * half) for c in x)
        right = tuple(c[:, :, half:].reshape(16, n_groups * half) for c in x)
        s = curve.add_fused(left, right)
        x = tuple(c.reshape(16, n_groups, half) for c in s)
        g = half
    return tuple(c.reshape(16, n_groups) for c in x)


def fold_group_sums(p: curve.Point, group: int) -> curve.Point:
    """Sum each contiguous `group`-lane block -> compacted (16, M/group).

    Backend-gated: on TPU use the unrolled compacting tree (every level is a
    clean Pallas-tileable slab). Elsewhere use the scan-based fold + slice —
    the unrolled tree's log2(G) inlined complete-Edwards adds send XLA:CPU's
    algebraic simplifier into a circular-simplification loop when compiled
    inside shard_map (the round-3 multichip-gate regression; scan bodies
    trace ONE add and compile in seconds on every backend).
    """
    if group == 1:
        return p
    if jax.default_backend() == "tpu":
        return _fold_groups_compact(p, group)
    folded = _fold_groups(p, group)
    return tuple(c.reshape(16, -1, group)[:, :, 0] for c in folded)


def accumulate_buckets(
    points: curve.Point, digits, streams: int = 16, c: int = WINDOW_BITS
) -> curve.Point:
    """Bucket accumulation. points: (16, N) coords; digits: (W, N) uint32,
    N a multiple of `streams` (see pad_to_streams).

    Returns the merged bucket points as a (16, W*2^c)-lane Point:
    lane w*2^c + b  =  sum of points whose window-w digit is b.
    """
    n_buckets = 1 << c
    w, n = digits.shape
    k = streams  # power of two required by the pairwise merge
    assert k & (k - 1) == 0 and n % k == 0, (n, k)
    digits = jnp.asarray(digits)
    steps = n // k

    # per-stream bucket copies: lane layout (w * n_buckets + b) * k + stream
    buckets = curve.identity(w * n_buckets * k)

    # reorder so step i handles points [i, i+steps, i+2*steps, ...] per stream
    order = jnp.arange(n).reshape(k, steps).T.reshape(-1)  # step-major
    pts = _gather_point(points, order)
    digs = jnp.take(digits, order, axis=1)  # (W, n) step-major

    pts_steps = tuple(c.reshape(16, steps, k) for c in pts)
    digs_steps = digs.reshape(w, steps, k)

    def step(bkts, xs):
        pt_k = xs[0]  # tuple of (16, k)
        dig_k = xs[1]  # (W, k)
        # lanes: for each (window, stream): target bucket index
        lane = (
            (jnp.arange(w, dtype=jnp.uint32)[:, None] * n_buckets + dig_k) * k
            + jnp.arange(k, dtype=jnp.uint32)[None, :]
        ).reshape(-1)  # (W*K,)
        cur = _gather_point(bkts, lane)
        # broadcast each stream's point across its windows
        pt_wk = tuple(jnp.tile(c, (1, w)) for c in pt_k)
        new = curve.add_fused(cur, pt_wk)
        return _scatter_set(bkts, lane, new), None

    xs = (tuple(jnp.moveaxis(c, 1, 0) for c in pts_steps), jnp.moveaxis(digs_steps, 1, 0))
    buckets, _ = jax.lax.scan(step, buckets, xs)

    # merge the K stream copies: compacting pairwise tree over the k lanes
    return fold_group_sums(buckets, k)  # (16, W*B)


def reduce_buckets(
    buckets: curve.Point, w: int = NUM_WINDOWS, c: int = WINDOW_BITS
) -> curve.Point:
    """Per-window weighted sum sum_b b * S_b -> (16, W) window results.

    Suffix sums U_j = sum_{b>=j} S_b via reversed Hillis-Steele (c scan steps
    with masked dynamic-shift gathers), then sum_{j>=1} U_j via _fold_groups.
    """
    b = 1 << c
    m = w * b
    lane = jnp.arange(m)
    lane_b = lane % b
    idn = curve.identity(m)
    shifts = jnp.asarray([1 << i for i in range(b.bit_length() - 1)], jnp.int32)

    def step(suf, shift):
        src = _gather_point(suf, jnp.minimum(lane + shift, m - 1))
        src = curve.select(lane_b + shift < b, src, idn)
        return curve.add_fused(suf, src), None

    suf, _ = jax.lax.scan(step, buckets, shifts)
    # suf lane (w, j) = U_j; want sum_{j>=1} U_j: zero out U_0, fold each window
    suf = curve.select(lane_b != 0, suf, idn)
    return fold_group_sums(suf, b)  # (16, W)


def combine_windows(windows: curve.Point, c: int = WINDOW_BITS) -> curve.Point:
    """Horner: result = sum_w 2^(c*w) W_w, scanning from the top window."""

    def step(acc, win):
        acc = jax.lax.fori_loop(0, c, lambda _, a: curve.double(a), acc)
        return curve.add(acc, win), None

    # scan over windows reversed; each xs element is a (16, 1) point
    xs = tuple(jnp.moveaxis(x[:, ::-1][:, :, None], 1, 0) for x in windows)  # (w,16,1)
    acc, _ = jax.lax.scan(step, curve.identity(1), xs)
    return acc


def msm(points: curve.Point, digits, streams: int = 16, c: int = WINDOW_BITS) -> curve.Point:
    """Full Pippenger MSM: returns the (16, 1)-lane result point."""
    w = digits.shape[0]
    buckets = accumulate_buckets(points, digits, streams=streams, c=c)
    windows = reduce_buckets(buckets, w, c=c)
    return combine_windows(windows, c=c)


def msm_jit(points: curve.Point, digits, streams: int = 16, c: int = WINDOW_BITS) -> curve.Point:
    points, digits = pad_to_streams(points, digits, streams=streams)
    return _msm_jitted(points, digits, streams, c)


from functools import partial as _partial_


@_partial_(jax.jit, static_argnames=("streams", "c"))
def _msm_jitted(points, digits, streams, c):
    return msm(points, digits, streams=streams, c=c)


# ---------------------------------------------------------------------------
# fast batch-verify path: device windows + HOST window combine
# ---------------------------------------------------------------------------
#
# The device Horner combine runs ~2^c doublings + W adds on a SINGLE lane —
# pure sequential latency (~340 ms of the 470 ms MSM at c=8 on v5e, measured
# by benches/ed_profile.py: every field mul's carry chain serializes). The
# window results are only W points, so the weighted combine is O(1) host
# bigint work (~1 ms): ship the windows back and finish with the golden
# group law. Bit-exactness is untouched — same group, same values.


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("c", "streams"))
def _msm_windows_jitted(points, digits, c: int, streams: int):
    w = digits.shape[0]
    buckets = accumulate_buckets(points, digits, streams=streams, c=c)
    # stacked INSIDE the jit: the host fetches one jit output in one
    # round-trip (eager-op results fetch pathologically on the tunneled
    # backend — measured seconds vs ~20 ms for a jit output)
    return jnp.stack(reduce_buckets(buckets, w, c=c), axis=0)  # (4, 16, W)


def msm_windows(
    points: curve.Point,
    digits,
    c: int = FAST_WINDOW_BITS,
    streams: int | None = None,
):
    """Device Pippenger up to the per-window results, stacked (4, 16, W)."""
    streams = fast_streams() if streams is None else streams
    points, digits = pad_to_streams(points, digits, streams=streams)
    return _msm_windows_jitted(points, digits, c, streams)


def combine_windows_host(windows, c: int):
    """Host Horner over the stacked (4, 16, W) window points: returns the
    extended-coordinate result as python ints (x, y, z, t)."""
    from blobstreamx_tpu.fields import gf25519 as f
    from blobstreamx_tpu.golden import ed25519 as gold

    stacked = np.asarray(windows)  # (4, 16, W), one transfer
    coords = [f.to_int(stacked[i]) for i in range(4)]  # 4 x [W ints]
    w = len(coords[0])
    acc = gold.IDENTITY
    for j in reversed(range(w)):  # acc = 2^c * acc + W_j, top window first
        if j != w - 1:
            for _ in range(c):
                acc = gold.point_add(acc, acc)
        acc = gold.point_add(acc, tuple(coords[i][j] % gold.Q for i in range(4)))
    return acc


def msm_host_combined(
    points: curve.Point,
    digits,
    c: int = FAST_WINDOW_BITS,
    streams: int | None = None,
):
    """Fast full MSM: device buckets/windows, host combine. Returns host
    extended coordinates (x, y, z, t) as python ints."""
    return combine_windows_host(msm_windows(points, digits, c, streams), c)


# ---------------------------------------------------------------------------
# bitwise-window MSM: zero gathers, zero scatters
# ---------------------------------------------------------------------------
#
# With c=1 windows, Pippenger needs no buckets at all: window sum
# T_w = sum_{i : bit_w(s_i) = 1} P_i, and the result is sum_w 2^w T_w.
# Each T_w is a MASKED TREE SUM — level 0 selects point-or-identity per
# (window, lane) and adds pairs; the remaining levels are the clean
# compacting slab tree of fold_group_sums. Every op is a full-width
# elementwise VPU pass: no bucket gather, no scatter (the dominant cost of
# the bucketized scan on TPU — the round-5 roofline put the bucketized path
# at ~4% of the mul-issue SoL). Total work is W*N lane-adds (~4x the
# bucketized path's useful adds at c=4) but sequential depth drops to
# 1 + log2(N/2) adds and every add is Pallas-tileable.


def msm_bitwise_windows_device(points: curve.Point, bits) -> curve.Point:
    """All 256 window sums at once. points: (16, N) coords; bits: (W, N)
    0/1 uint32 (scalars_to_digits with c=1), N a power of two >= 2.
    Returns (16, W): lane w = T_w."""
    w, n = bits.shape
    assert n & (n - 1) == 0 and n >= 2, n
    h = n // 2

    def masked_half(sel, pts):
        flat = tuple(
            jnp.broadcast_to(c[:, None, :], (16, w, h)).reshape(16, w * h)
            for c in pts
        )
        return curve.select(sel.reshape(-1) != 0, flat, curve.identity(w * h))

    a = masked_half(bits[:, :h], tuple(c[:, :h] for c in points))
    b = masked_half(bits[:, h:], tuple(c[:, h:] for c in points))
    x = curve.add_fused(a, b)  # (16, w*h), layout (w, h)
    return fold_group_sums(x, h)  # (16, w)


@_partial_(jax.jit)
def _msm_bitwise_jitted(p0, p1, p2, p3, bits):
    return jnp.stack(msm_bitwise_windows_device((p0, p1, p2, p3), bits), axis=0)


def pad_points_bits_pow2(points: curve.Point, bits):
    """Identity/zero-bit pad N up to the next power of two (>= 2)."""
    w, n = np.asarray(bits).shape
    n2 = max(2, 1 << (n - 1).bit_length())
    if n2 != n:
        idn = curve.identity(n2 - n)
        points = tuple(jnp.concatenate([a, b], axis=1) for a, b in zip(points, idn))
        bits = np.concatenate([np.asarray(bits), np.zeros((w, n2 - n), np.uint32)], axis=1)
    return points, jnp.asarray(bits)


def msm_bitwise_host_combined(points: curve.Point, scalars: list[int]):
    """Full MSM via bitwise windows + host Horner (c=1: W doublings+adds of
    host bigint work on the W window points). Returns extended coords as
    python ints."""
    bits = scalars_to_digits(scalars, c=1)
    points, bits = pad_points_bits_pow2(points, bits)
    wins = _msm_bitwise_jitted(*points, bits)
    return combine_windows_host(wins, 1)
