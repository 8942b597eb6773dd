"""Device Merkle tree builders (component C5, SURVEY.md §2.2).

Poseidon prover trees over field-element leaf vectors, with `cap_height` caps:
leaf layer via the batched sponge, then log2(n) two-to-one reduction layers,
all device-resident. All layers are returned so query-phase path extraction
(FRI, SURVEY.md §3.4 step 7) is a host-side gather with no rehashing.

The SHA-256 Tendermint tuple trees live in blobstreamx_tpu.ops.sha256
(device) and golden.merkle (general shapes, host).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.fields.gf64 import Gl
from blobstreamx_tpu.ops import poseidon as pos


@dataclass
class PoseidonTree:
    """layers[0] = leaf digests (4, n) ... layers[-1] = cap (4, 2^cap_height)."""

    layers: list
    cap_height: int

    @property
    def cap(self) -> Gl:
        return self.layers[-1]

    def num_leaves(self) -> int:
        return self.layers[0][0].shape[1]

    def host_layers(self):
        """Device->host copies of all layers as uint64 (cached: path queries
        would otherwise re-transfer whole layers per call)."""
        if not hasattr(self, "_host_layers"):
            self._host_layers = [
                gf64.to_u64((np.asarray(lo), np.asarray(hi))) for lo, hi in self.layers
            ]
        return self._host_layers

    def path(self, index: int):
        """Sibling digests (host ints, each len-4) leaf->cap + cap index."""
        sibs = []
        idx = index
        for layer in self.host_layers()[:-1]:
            sibs.append([int(x) for x in layer[:, idx ^ 1]])
            idx >>= 1
        return sibs, idx


def tree_layers(leaves: Gl, cap_height: int = 0, permute_fn=pos.permute):
    """All tree layers as a jit-friendly tuple (leaf digests ... cap)."""
    n = leaves[0].shape[1]
    assert n & (n - 1) == 0 and (1 << cap_height) <= n
    layer = pos.hash_columns(leaves, permute_fn)
    layers = [layer]
    while layer[0].shape[1] > (1 << cap_height):
        lo, hi = layer
        layer = pos.compress_pairs(
            (lo[:, 0::2], hi[:, 0::2]), (lo[:, 1::2], hi[:, 1::2]), permute_fn
        )
        layers.append(layer)
    return tuple(layers)


def build_tree(leaves: Gl, cap_height: int = 0, permute_fn=pos.permute) -> PoseidonTree:
    """leaves: (L, N) field-element matrix, one leaf vector per column."""
    return PoseidonTree(
        layers=list(tree_layers(leaves, cap_height, permute_fn)), cap_height=cap_height
    )


def cap_to_ints(tree: PoseidonTree) -> list[list[int]]:
    """Cap digests as python ints (for the Fiat-Shamir challenger)."""
    lo, hi = tree.cap
    arr = gf64.to_u64((np.asarray(lo), np.asarray(hi)))
    return [[int(x) for x in arr[:, j]] for j in range(arr.shape[1])]
