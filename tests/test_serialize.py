"""Proof transport (prover.serialize): lossless roundtrip, the deserialized
proof still verifies, and run-to-run determinism (SURVEY.md §5.2: bit-exact
digest equality across runs)."""

import pytest


class TestSerialize:
    def test_roundtrip_determinism_and_transport(self):
        """FibAir proof transport + run-to-run byte identity + the step
        workload roundtrip, in one 1-device subprocess (in-process proving
        under the 8-device config recompiles everything uncached; see
        tests/subproc.py)."""
        from subproc import run_py

        run_py(
            """
from blobstreamx_tpu.prover import serialize, stark
import sys
sys.path.insert(0, "tests")
from test_stark import CFG, FibAir, fib_trace

n = 64
trace, publics = fib_trace(n)
proof = stark.prove(FibAir(), trace, publics, CFG)
blob = serialize.stark_proof_to_bytes(proof)
back = serialize.stark_proof_from_bytes(blob)
assert stark.verify(FibAir(), back, publics, CFG, n)
assert serialize.stark_proof_to_bytes(back) == blob

# run-to-run determinism: same witness, same transcript, same bytes —
# forbidding nondeterministic reduction orders is a stated invariant
b2 = serialize.stark_proof_to_bytes(stark.prove(FibAir(), trace, publics, CFG))
assert b2 == blob

# step workload transport
from blobstreamx_tpu.models import step
chain = step.generate_chain(seed=9, n_headers=3, n_validators=4)
w = step.build_witness(chain, prev_height=1)
cfg = step.StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=8,
                       proof_of_work_bits=2, final_poly_len=4)
sp = step.prove(w, config=cfg)
sb = step.from_bytes(step.to_bytes(sp))
assert step.verify(sb, config=cfg)
assert step.to_bytes(sb) == step.to_bytes(sp)
print("serialize battery ok")
"""
        )

    @pytest.mark.slow
    def test_skip_with_ed_stark_roundtrip(self):
        """The ed_stark aux (bigint scalars, affine points, extended-coord
        results) survives transport and the deserialized proof verifies
        against the re-derived claims. Runs in a 1-device subprocess: the Ed
        AIR quotient compile is far too slow under the 8-device config
        (tests/subproc.py)."""
        from subproc import run_py

        run_py(
            """
from blobstreamx_tpu.models import skip
from blobstreamx_tpu.prover import pipeline

chain = skip.generate_chain(seed=13, n_headers=6, n_validators=2, sign_heights={6})
w = skip.build_witness(chain, trusted_height=1, target_height=6)
cfg = skip.StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=8,
                       proof_of_work_bits=2, final_poly_len=4)
proof = skip.prove(w, config=cfg, with_ed_stark=True)
back = skip.from_bytes(skip.to_bytes(proof))
assert back.ed_stark is not None
items = pipeline.signature_items(w)
assert pipeline.verify_skip_proof(back, cfg, sign_items=items), "roundtrip reject"
assert skip.to_bytes(back) == skip.to_bytes(proof), "bytes not stable"
print("ed-stark transport ok")
"""
        )
