"""Proof transport (prover.serialize): lossless roundtrip, the deserialized
proof still verifies, and run-to-run determinism (SURVEY.md §5.2: bit-exact
digest equality across runs)."""

import numpy as np

from blobstreamx_tpu.prover import serialize, stark
from test_stark import CFG, FibAir, fib_trace


class TestSerialize:
    def test_roundtrip_and_verify(self):
        n = 64
        trace, publics = fib_trace(n)
        proof = stark.prove(FibAir(), trace, publics, CFG)
        blob = serialize.stark_proof_to_bytes(proof)
        back = serialize.stark_proof_from_bytes(blob)
        assert stark.verify(FibAir(), back, publics, CFG, n)
        assert serialize.stark_proof_to_bytes(back) == blob

    def test_run_to_run_determinism(self):
        """Same witness, same transcript, same proof bytes — forbidding
        nondeterministic reduction orders is a stated invariant."""
        n = 64
        trace, publics = fib_trace(n)
        a = serialize.stark_proof_to_bytes(stark.prove(FibAir(), trace, publics, CFG))
        b = serialize.stark_proof_to_bytes(stark.prove(FibAir(), trace, publics, CFG))
        assert a == b


class TestWorkloadProofTransport:
    def test_step_roundtrip(self):
        from blobstreamx_tpu.models import step

        chain = step.generate_chain(seed=9, n_headers=3, n_validators=4)
        w = step.build_witness(chain, prev_height=1)
        cfg = step.StarkConfig(
            rate_bits=2, cap_height=1, num_query_rounds=8, proof_of_work_bits=2,
            final_poly_len=4,
        )
        proof = step.prove(w, config=cfg)
        back = step.from_bytes(step.to_bytes(proof))
        assert step.verify(back, config=cfg)
        assert step.to_bytes(back) == step.to_bytes(proof)

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
