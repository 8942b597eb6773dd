"""Validator-set gadgets (component C15, SURVEY.md §2.2: "fixed-layout
byte-encoding tables + batched hashing; power sums via integer reductions").

Device responsibilities:
  - hash a whole validator set to its Tendermint SimpleMerkle root: leaf
    SHA-256 of every protobuf-encoded SimpleValidator in parallel lanes, then
    a pair-and-promote tree reduction (bit-identical to the RFC 6962
    largest-power-of-two split used by golden.merkle — the two rules build
    the same left-balanced tree; asserted in tests for all small n);
  - accumulate signed voting power as u32-pair integer reductions (no float
    anywhere, SURVEY.md §5.2).

Host responsibilities (thin, O(n) bytes): protobuf encoding via
golden.encoding, message padding/packing via ops.sha256.pack_messages_host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.golden import encoding as enc
from blobstreamx_tpu.ops import sha256 as sha_ops


def simple_root_from_digests(digests):
    """Tendermint SimpleMerkle root over an arbitrary number of already-
    leaf-hashed nodes, entirely on device.

    digests: (8, N) uint32. Returns (8, 1). Iterative pair-and-promote:
    each level inner-hashes adjacent pairs left-to-right and promotes an
    odd trailing node unchanged — this builds the same tree as the
    recursive largest-power-of-two-split rule (verified vs golden).
    """
    layer = digests
    n = layer.shape[1]
    assert n >= 1
    while n > 1:
        half = n // 2
        pairs = sha_ops.inner_hash_pairs(layer[:, 0 : 2 * half : 2], layer[:, 1 : 2 * half : 2])
        if n % 2:
            layer = jnp.concatenate([pairs, layer[:, -1:]], axis=1)
        else:
            layer = pairs
        n = layer.shape[1]
    return layer


def pack_validator_leaves(validators: list[tuple[bytes, int]]):
    """Host: encode SimpleValidator records and pack the RFC 6962 leaf
    messages (0x00-prefixed) into SHA block tensors."""
    msgs = [b"\x00" + enc.encode_simple_validator(pk, power) for pk, power in validators]
    return sha_ops.pack_messages_host(msgs)


def validators_root_device(validators: list[tuple[bytes, int]]):
    """Full device validators-hash: leaf lanes + tree reduction. (8,1) words."""
    blocks, n_blocks = pack_validator_leaves(validators)
    leaf = _leaf_and_root(blocks.shape[0], blocks.shape[2])
    return leaf(jnp.asarray(blocks), jnp.asarray(n_blocks))


_root_cache: dict[tuple[int, int], object] = {}


def _leaf_and_root(b_max: int, n: int):
    key = (b_max, n)
    if key not in _root_cache:

        def fn(blocks, n_blocks):
            digests = sha_ops.sha256_packed(blocks, n_blocks)
            return simple_root_from_digests(digests)

        _root_cache[key] = jax.jit(fn)
    return _root_cache[key]


# ----------------------------------------------------------------------------
# voting-power accumulation (integer u32-pair reduction; powers < 2^63 total)
# ----------------------------------------------------------------------------


def powers_to_u32(powers) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(powers, dtype=np.uint64)
    return (arr & 0xFFFFFFFF).astype(np.uint32), (arr >> 32).astype(np.uint32)


@jax.jit
def signed_power_sum(power_lo, power_hi, signed_mask):
    """sum(power_i where signed_i) and sum(power_i) as exact integers.

    power_lo/hi: (N,) uint32; signed_mask: (N,) bool. TPU has no u64 lanes,
    so each u32 word is split into 16-bit limbs whose u32 lane-sums are exact
    for N < 2^16 lanes; the limb sums are recombined into a python int by
    limb_sums_to_int (SURVEY.md §7.2 item 1: u32-limb integer arithmetic).
    Returns two (4,) uint32 limb-sum vectors (signed, total).
    """

    def limb_sums(lo, hi):
        return jnp.stack(
            [
                jnp.sum(lo & jnp.uint32(0xFFFF)),
                jnp.sum(lo >> jnp.uint32(16)),
                jnp.sum(hi & jnp.uint32(0xFFFF)),
                jnp.sum(hi >> jnp.uint32(16)),
            ]
        )

    mask = signed_mask.astype(jnp.uint32)
    return limb_sums(power_lo * mask, power_hi * mask), limb_sums(power_lo, power_hi)


def limb_sums_to_int(limbs) -> int:
    arr = np.asarray(limbs, dtype=np.uint64)
    return sum(int(v) << (16 * i) for i, v in enumerate(arr))


def threshold_gt(signed: int, total: int, num: int, den: int) -> bool:
    """signed > total * num / den without floats: signed * den > total * num."""
    return signed * den > total * num
