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
