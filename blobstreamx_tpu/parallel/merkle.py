"""Sharded Merkle builders: local subtrees + collective top reduction
(SURVEY.md §3.5: "leaves sharded per chip, subtree roots computed locally,
merged with all_gather + local top-tree, no recursion needed").
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from blobstreamx_tpu.fields.gf64 import Gl
from blobstreamx_tpu.ops import merkle as merkle_ops, poseidon as pos, sha256 as sha_ops
from .mesh import AXIS


@lru_cache(maxsize=None)
def _tuple_tree_fn(mesh):
    def local(hlo, hhi, dh):
        sub = sha_ops.tuple_tree_root(hlo, hhi, dh)  # (8, 1) local subtree root
        roots = jax.lax.all_gather(sub, AXIS, axis=1, tiled=True)  # (8, D)
        d = roots.shape[1]
        while d > 1:
            roots = sha_ops.inner_hash_pairs(roots[:, 0::2], roots[:, 1::2])
            d //= 2
        return roots

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(None, AXIS)),
            out_specs=P(None, None),
            check_vma=False,
        )
    )


def tuple_tree_root_sharded(height_lo, height_hi, data_hashes, mesh):
    """Data-commitment root (C14) with leaves sharded across chips.

    height_lo/hi: (N,) uint32; data_hashes: (8, N) uint32. N and N/D must be
    powers of two. Returns replicated (8, 1) root words.
    """
    return _tuple_tree_fn(mesh)(height_lo, height_hi, data_hashes)


@lru_cache(maxsize=None)
def _leaf_layer_fn(mesh):
    spec = P(None, AXIS)

    def local(lo, hi):
        return pos.hash_columns((lo, hi))

    return jax.jit(
        shard_map(
            local, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
            check_vma=False,
        )
    )


def poseidon_leaf_layer_sharded(leaves: Gl, mesh) -> Gl:
    """Leaf digests of a Poseidon tree, (L, N) leaves column-sharded -> (4, N)."""
    return _leaf_layer_fn(mesh)(leaves[0], leaves[1])


@lru_cache(maxsize=None)
def _subtree_fn(mesh, leaves_per_chip: int):
    spec = P(None, AXIS)

    def local_subtree(lo, hi):
        tree = merkle_ops.build_tree((lo, hi), cap_height=0)
        outs = []
        for layer in tree.layers:
            outs.append(layer[0])
            outs.append(layer[1])
        return tuple(outs)

    n_layers = leaves_per_chip.bit_length()
    out_specs = tuple(spec for _ in range(2 * n_layers))
    return jax.jit(
        shard_map(
            local_subtree, mesh=mesh, in_specs=(spec, spec), out_specs=out_specs,
            check_vma=False,
        )
    )


def poseidon_tree_sharded(leaves: Gl, mesh, cap_height: int = 0):
    """Full Poseidon cap tree: local subtrees per chip, then the top
    log2(D) + cap levels computed on gathered digests.

    Requires leaves-per-chip to be a power of two >= 1 and
    2^cap_height <= D * 1 (cap taken from the gathered top). Returns a host
    PoseidonTree whose top layers are replicated; per-chip layers stay sharded
    in the device list for path extraction.
    """
    d = mesh.devices.size
    n = leaves[0].shape[1]
    assert n % d == 0 and ((n // d) & (n // d - 1)) == 0

    outs = _subtree_fn(mesh, n // d)(leaves[0], leaves[1])
    n_layers = (n // d).bit_length()
    layers = [(outs[2 * i], outs[2 * i + 1]) for i in range(n_layers)]
    # top levels over the D gathered local roots, replicated compute
    top = layers[-1]
    while top[0].shape[1] > (1 << cap_height):
        lo, hi = top
        top = pos.compress_pairs((lo[:, 0::2], hi[:, 0::2]), (lo[:, 1::2], hi[:, 1::2]))
        layers.append(top)
    # if the requested cap is wider than the local-root layer (2^cap_height > D),
    # it is one of the sharded layers: truncate the stack there.
    target = 1 << cap_height
    layers = [l for l in layers if l[0].shape[1] > target] + [
        next(l for l in layers if l[0].shape[1] == target)
    ]
    return merkle_ops.PoseidonTree(layers=layers, cap_height=cap_height)
