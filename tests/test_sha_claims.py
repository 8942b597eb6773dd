"""Data-commitment tuple tree proven inside the batched SHA-256 STARK
(prover.sha_claims): roundtrip against the golden tree root plus claim
tamper probes. Runs in a 1-device subprocess (see tests/subproc.py)."""

import pytest


@pytest.mark.slow
class TestDataCommitmentStark:
    def test_roundtrip_and_tampers(self):
        from subproc import run_py

        run_py(
            """
import copy
import numpy as np
from blobstreamx_tpu.golden import merkle as gmerkle
from blobstreamx_tpu.prover import sha_claims
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=6, final_poly_len=8)
rng = np.random.default_rng(11)
heights = list(range(100, 103))  # 3 leaves exercises the RFC 6962 split
data_hashes = [bytes(rng.integers(0, 256, 32, dtype=np.uint8)) for _ in range(3)]
proof, root = sha_claims.prove_data_commitment_stark(heights, data_hashes, CFG)
assert root == gmerkle.data_commitment(heights, data_hashes), "root vs golden"
assert sha_claims.verify_data_commitment_stark(proof, heights, data_hashes, root, CFG)

bad_root = bytes([root[0] ^ 1]) + root[1:]
assert not sha_claims.verify_data_commitment_stark(proof, heights, data_hashes, bad_root, CFG)

tampered = list(data_hashes)
tampered[1] = bytes([tampered[1][0] ^ 1]) + tampered[1][1:]
assert not sha_claims.verify_data_commitment_stark(proof, heights, tampered, root, CFG)

bad = copy.deepcopy(proof)
n_msgs = 2 * len(heights) - 1
blk = 2 * n_msgs - 1  # the root message's second block carries the root claim
w, out = bad.aux[blk]
bad.aux[blk] = (w, tuple(int(out[0]) ^ 1 if j == 0 else int(v) for j, v in enumerate(out)))
assert not sha_claims.verify_data_commitment_stark(bad, heights, data_hashes, root, CFG)
print("sha claims roundtrip ok")
"""
        )
