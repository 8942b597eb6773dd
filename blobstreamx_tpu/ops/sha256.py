"""Batched SHA-256 on TPU (component C4, SURVEY.md §2.2; config 1 at
/root/repo/BASELINE.json:7).

Layout: N independent hash lanes. A state is a (8, N) uint32 array; a message
block is a (16, N) uint32 array (big-endian words, one message per lane). The
compression function is pure u32 VPU code; the 64 rounds run under lax.scan
with the round constant as the scanned input and the 16-word schedule window
as carry, so compile time is O(1) in rounds.

Variable-length messages are handled with static shapes: the host packs each
message into a padded (B_max, 16, N) word tensor plus a per-lane block count;
the device scans over B_max compressions and masks inactive lanes — no dynamic
shapes anywhere (SURVEY.md §5.6).

The 65-byte "prefix ‖ 32B ‖ 32B" message shape shared by RFC 6962 leaf and
inner hashing (Tendermint tuple trees) gets a dedicated on-device two-block
builder so whole Merkle levels run without host round-trips.

Golden oracle: blobstreamx_tpu.golden.sha256 (and hashlib, independently).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.golden import sha256 as gold

H0 = np.array(gold.h_constants(), dtype=np.uint32)  # (8,)
K = np.array(gold.k_constants(), dtype=np.uint32)  # (64,)


def _rotr(x, n: int):
    return (x >> n) | (x << (32 - n))


def compress_blocks(state, words):
    """One compression per lane. state (8, N), words (16, N) -> (8, N)."""

    def round_step(carry, k_t):
        (a, b, c, d, e, f, g, h), w = carry
        w_t = w[0]
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + s1 + ch + k_t + w_t
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        new_state = (t1 + t2, a, b, c, d + t1, e, f, g)
        # schedule: w[t+16] = w[t] + sig0(w[t+1]) + w[t+9] + sig1(w[t+14])
        sig0 = _rotr(w[1], 7) ^ _rotr(w[1], 18) ^ (w[1] >> 3)
        sig1 = _rotr(w[14], 17) ^ _rotr(w[14], 19) ^ (w[14] >> 10)
        w_next = w[0] + sig0 + w[9] + sig1
        w = jnp.concatenate([w[1:], w_next[None]], axis=0)
        return (new_state, w), None

    init = (tuple(state[i] for i in range(8)), words)
    (final, _), _ = jax.lax.scan(round_step, init, jnp.asarray(K))
    return jnp.stack([state[i] + final[i] for i in range(8)], axis=0)


def sha256_packed(blocks, n_blocks=None):
    """Full SHA-256 over host-packed padded messages.

    blocks: (B, 16, N) uint32 — per-lane padded message blocks.
    n_blocks: optional (N,) int32 — actual block count per lane; lanes keep
    their state once their blocks are exhausted.
    Returns digests as (8, N) uint32 words.
    """
    b_max, _, n = blocks.shape
    state = jnp.broadcast_to(jnp.asarray(H0)[:, None], (8, n))

    def step(carry, xs):
        st = carry
        block, idx = xs
        new = compress_blocks(st, block)
        if n_blocks is not None:
            active = (idx < n_blocks)[None, :]
            new = jnp.where(active, new, st)
        return new, None

    idxs = jnp.arange(b_max, dtype=jnp.int32)
    state, _ = jax.lax.scan(step, state, (blocks, idxs))
    return state


def pack_messages_host(messages: list[bytes]):
    """Host-side packing: pad (FIPS 180-4) and build (B_max, 16, N) blocks."""
    padded = [gold.pad(m) for m in messages]
    n_blocks = np.array([len(p) // 64 for p in padded], dtype=np.int32)
    b_max = int(n_blocks.max())
    n = len(messages)
    blocks = np.zeros((b_max, 16, n), dtype=np.uint32)
    for lane, p in enumerate(padded):
        arr = np.frombuffer(p, dtype=">u4").reshape(-1, 16)
        blocks[: arr.shape[0], :, lane] = arr
    return blocks, n_blocks


def digests_to_bytes(digests) -> list[bytes]:
    """(8, N) uint32 -> list of 32-byte digests (host side)."""
    arr = np.asarray(digests).astype(">u4")
    return [arr[:, j].tobytes() for j in range(arr.shape[1])]


def bytes32_to_words(data: list[bytes]) -> np.ndarray:
    """list of 32-byte values -> (8, N) uint32 big-endian words (host side)."""
    flat = np.frombuffer(b"".join(data), dtype=">u4").reshape(-1, 8).T
    return np.ascontiguousarray(flat).astype(np.uint32)


# ----------------------------------------------------------------------------
# RFC 6962 prefix ‖ 32B ‖ 32B hashing, fully on device (leaf + inner nodes)
# ----------------------------------------------------------------------------


def _prefixed_pair_blocks(prefix: int, a, b):
    """Build the two padded blocks of SHA-256(prefix ‖ a ‖ b) on device.

    a, b: (8, N) uint32 big-endian word views of 32-byte values.
    Message is 65 bytes -> padded to 128 bytes (2 blocks).
    """
    n = a.shape[1]
    words = jnp.concatenate([a, b], axis=0)  # (16, N): the 64 payload bytes

    def shifted(j):
        # byte stream m[0]=prefix, m[1..64]=payload; block word j = m[4j..4j+3]
        prev = jnp.full((n,), np.uint32(prefix), jnp.uint32) if j == 0 else words[j - 1]
        cur = words[j] if j < 16 else None
        if cur is None:  # word 0 of block 2: m[64], 0x80, 0, 0
            return ((prev & 0xFF) << 24) | jnp.uint32(0x00800000)
        return ((prev & 0xFF) << 24) | (cur >> 8)

    block1 = jnp.stack([shifted(j) for j in range(16)], axis=0)
    zero = jnp.zeros((n,), jnp.uint32)
    block2 = jnp.stack(
        [shifted(16)] + [zero] * 14 + [jnp.full((n,), np.uint32(65 * 8), jnp.uint32)],
        axis=0,
    )
    return block1, block2


def hash_prefixed_pair(prefix: int, a, b):
    """SHA-256(prefix ‖ a ‖ b) per lane: (8,N),(8,N) -> (8,N)."""
    block1, block2 = _prefixed_pair_blocks(prefix, a, b)
    n = a.shape[1]
    state = jnp.broadcast_to(jnp.asarray(H0)[:, None], (8, n))
    state = compress_blocks(state, block1)
    return compress_blocks(state, block2)


def inner_hash_pairs(left, right):
    """RFC 6962 inner node: SHA-256(0x01 ‖ L ‖ R)."""
    return hash_prefixed_pair(0x01, left, right)


def leaf_hash_tuples(height_lo, height_hi, data_hashes):
    """DataRootTuple leaf hash: SHA-256(0x00 ‖ uint256-BE height ‖ data_hash).

    height_lo/hi: (N,) uint32 (64-bit heights as two u32 words);
    data_hashes: (8, N) uint32 words. Returns (8, N).
    """
    n = height_lo.shape[0]
    zero = jnp.zeros((6, n), jnp.uint32)
    height_words = jnp.concatenate([zero, height_hi[None], height_lo[None]], axis=0)
    return hash_prefixed_pair(0x00, height_words, data_hashes)


def tuple_tree_root(height_lo, height_hi, data_hashes):
    """Full data-commitment root over a power-of-two leaf count (C14).

    Builds the leaf layer then log2(n) reduction layers, all on device.
    Returns (8, 1) uint32 root words.
    """
    layer = leaf_hash_tuples(height_lo, height_hi, data_hashes)
    n = layer.shape[1]
    assert n & (n - 1) == 0, "device tuple tree requires power-of-two leaves"
    while n > 1:
        layer = inner_hash_pairs(layer[:, 0::2], layer[:, 1::2])
        n //= 2
    return layer
