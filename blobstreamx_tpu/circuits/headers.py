"""Header-field Merkle inclusion proofs (component C16, SURVEY.md §2.2:
"batched inclusion-proof verification kernel").

A Tendermint header commits to 14 field leaves via the RFC 6962 SimpleMerkle
tree (golden.encoding.Header). The skip/step circuits must check that
data_hash / validators_hash / next_validators_hash (all 32-byte leaves, each
at depth 4 in the 14-leaf tree) are included under given header roots. This
module batches N such checks into lane-parallel device hashing: one leaf-hash
block + a lax.scan over the path levels, one SHA-256 double-block per level.

Host side supplies (siblings, directions) audit paths via
merkle_proof_with_dirs (golden-model structure; static shapes per depth).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blobstreamx_tpu.golden import merkle as gold_merkle
from blobstreamx_tpu.ops import sha256 as sha_ops


def merkle_proof_with_dirs(leaves: list[bytes], index: int):
    """(siblings leaf-to-root, dirs leaf-to-root) in the RFC 6962 tree.

    dirs[d] == 1 iff the running node is the RIGHT child at level d.
    """
    siblings = gold_merkle.merkle_proof(leaves, index)

    dirs: list[int] = []

    def walk(idx: int, n: int):
        if n == 1:
            return
        k = gold_merkle._split_point(n)
        if idx < k:
            walk(idx, k)
            dirs.append(0)
        else:
            walk(idx - k, n - k)
            dirs.append(1)

    walk(index, len(leaves))
    assert len(dirs) == len(siblings)
    return siblings, dirs


def leaf_hash_32(values):
    """RFC 6962 leaf hash of 32-byte values, on device: SHA-256(0x00 ‖ v).

    values: (8, N) uint32 big-endian words. 33-byte message -> 1 block.
    """
    n = values.shape[1]

    def word(j):
        prev = jnp.zeros((n,), jnp.uint32) if j == 0 else values[j - 1]
        if j < 8:
            return ((prev & 0xFF) << 24) | (values[j] >> 8)
        return ((prev & 0xFF) << 24) | jnp.uint32(0x00800000)  # v[31], 0x80

    zero = jnp.zeros((n,), jnp.uint32)
    block = jnp.stack(
        [word(j) for j in range(9)] + [zero] * 6 + [jnp.full((n,), np.uint32(33 * 8))],
        axis=0,
    )
    state = jnp.broadcast_to(jnp.asarray(sha_ops.H0)[:, None], (8, n))
    return sha_ops.compress_blocks(state, block)


def fold_paths(leaf_digests, siblings, dirs):
    """Fold N audit paths of equal depth D on device.

    leaf_digests: (8, N); siblings: (D, 8, N); dirs: (D, N) uint32 (1 = node
    is right child). Returns computed roots (8, N).
    """

    def step(h, xs):
        sib, d = xs
        left = jnp.where(d[None, :] == 1, sib, h)
        right = jnp.where(d[None, :] == 1, h, sib)
        return sha_ops.inner_hash_pairs(left, right), None

    out, _ = jax.lax.scan(step, leaf_digests, (siblings, dirs))
    return out


@jax.jit
def verify_inclusions(values, siblings, dirs, roots):
    """Batched inclusion check: leaf-hash 32-byte values, fold paths, compare
    to expected roots. Returns (N,) bool."""
    computed = fold_paths(leaf_hash_32(values), siblings, dirs)
    return jnp.all(computed == roots, axis=0)


def pack_proofs_host(proofs: list[tuple[bytes, list[bytes], list[int], bytes]]):
    """Host packing for verify_inclusions.

    proofs: per lane (value32, siblings leaf-to-root, dirs, root32); all
    lanes must share one path depth (true for the header fields we verify).
    """
    depth = len(proofs[0][1])
    assert all(len(p[1]) == depth and len(p[2]) == depth for p in proofs)
    values = sha_ops.bytes32_to_words([p[0] for p in proofs])
    roots = sha_ops.bytes32_to_words([p[3] for p in proofs])
    sibs = np.stack(
        [sha_ops.bytes32_to_words([p[1][d] for p in proofs]) for d in range(depth)]
    )
    dirs = np.array([[p[2][d] for p in proofs] for d in range(depth)], dtype=np.uint32)
    return values, sibs, dirs, roots
