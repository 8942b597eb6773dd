"""Device Poseidon trees vs golden model."""

import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gl, merkle as gold
from blobstreamx_tpu.ops import merkle as dev


@pytest.mark.parametrize("cap_height", [0, 1, 2])
@pytest.mark.parametrize("n,L", [(8, 7), (16, 3)])
def test_tree_matches_golden(n, L, cap_height):
    rng = np.random.default_rng(11)
    cols = rng.integers(0, gl.P, size=(L, n), dtype=np.uint64)
    tree = dev.build_tree(gf64.from_u64(cols), cap_height)
    got_cap = dev.cap_to_ints(tree)
    leaves = [[int(x) for x in cols[:, j]] for j in range(n)]
    want_cap = gold.poseidon_tree_cap(leaves, cap_height)
    assert got_cap == want_cap

    for idx in range(n):
        path, cap_idx = tree.path(idx)
        want_path, want_cap_idx = gold.poseidon_merkle_path(leaves, idx, cap_height)
        assert path == want_path and cap_idx == want_cap_idx
        assert gold.poseidon_verify_path(want_cap, leaves[idx], idx, path)
