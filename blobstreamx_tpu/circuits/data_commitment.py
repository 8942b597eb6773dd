"""Data-commitment builder (component C14, SURVEY.md §2.2: "batched
tuple-tree kernel"; config 1 at /root/repo/BASELINE.json:7).

The data commitment for a header range (start, end] is the Tendermint
SimpleMerkle root over 64-byte DataRootTuple leaves
(uint256-BE height ‖ data_hash). Upstream MapReduce'd this over batches of
map circuits with recursive proof aggregation (SURVEY.md §3.5); here one
device program hashes all leaves lane-parallel and reduces the tree —
sharded across chips via parallel.merkle.tuple_tree_root_sharded when a mesh
is given (subtree roots merged with all_gather, no recursion).
"""

from __future__ import annotations

import numpy as np

from blobstreamx_tpu.circuits.validators import simple_root_from_digests
from blobstreamx_tpu.ops import sha256 as sha_ops
from blobstreamx_tpu.parallel import merkle as pmerkle

import jax


def heights_to_u32(heights) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(heights, dtype=np.uint64)
    return (arr & 0xFFFFFFFF).astype(np.uint32), (arr >> 32).astype(np.uint32)


@jax.jit
def _root_any_n(hlo, hhi, data_words):
    return simple_root_from_digests(sha_ops.leaf_hash_tuples(hlo, hhi, data_words))


def data_commitment_device(heights, data_hashes: list[bytes], mesh=None) -> bytes:
    """Data-root tuple commitment on device; returns the 32-byte root.

    heights: list[int]; data_hashes: list of 32-byte values. With a mesh and
    power-of-two lanes-per-chip, uses the sharded builder (C14 multi-chip
    path); otherwise a single-program pair-and-promote reduction that matches
    golden.merkle.data_commitment for ANY leaf count.
    """
    hlo, hhi = heights_to_u32(heights)
    words = sha_ops.bytes32_to_words(data_hashes)
    n = len(data_hashes)
    if mesh is not None and n % mesh.devices.size == 0:
        per = n // mesh.devices.size
        if per & (per - 1) == 0 and n & (n - 1) == 0:
            root = pmerkle.tuple_tree_root_sharded(hlo, hhi, words, mesh)
            return sha_ops.digests_to_bytes(root)[0]
    root = _root_any_n(hlo, hhi, words)
    return sha_ops.digests_to_bytes(root)[0]
