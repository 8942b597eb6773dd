"""Device FRI vs golden: fold bit-exactness, grind equivalence, and full
device-prove -> golden-verify roundtrips (including proof-for-proof equality
with the golden prover)."""

import random

import numpy as np
import pytest

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import fri as gold_fri, goldilocks as gl, ntt as gold_ntt
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.ops import fri as dev_fri


def _codeword(log_coeffs, rate_bits, seed):
    rng = random.Random(seed)
    coeffs = [rng.randrange(gl.P) for _ in range(1 << log_coeffs)]
    return gold_ntt.lde(coeffs, rate_bits)


class TestFold:
    @pytest.mark.parametrize("log_n,shift", [(4, gl.COSET_SHIFT), (6, 1), (8, gl.COSET_SHIFT)])
    def test_matches_golden(self, log_n, shift):
        rng = random.Random(log_n)
        evals = [rng.randrange(gl.P) for _ in range(1 << log_n)]
        beta = rng.randrange(gl.P)
        want = gold_fri.fold_codeword(evals, beta, shift)
        got = gf64.to_u64(
            dev_fri.fold_codeword(gf64.from_u64(np.array(evals, np.uint64)), beta, shift)
        )
        assert [int(v) for v in got] == want


class TestGrind:
    # bits kept small: the *golden* grind is sequential Python (2^bits tries)
    @pytest.mark.parametrize("bits", [4, 6, 8])
    def test_matches_golden_grind(self, bits):
        c = Challenger()
        c.observe_many([7, 11, 13])
        want = gold_fri.grind(c, bits)
        got = dev_fri.grind(c, bits, batch=256)
        assert got == want

    def test_with_pending_inputs(self):
        c = Challenger()
        c.observe_many(list(range(13)))  # leaves 5 pending after one duplex
        assert len(c.input_buffer) == 5
        assert dev_fri.grind(c, 6, batch=128) == gold_fri.grind(c, 6)


class TestProve:
    CFG = gold_fri.FriConfig(
        rate_bits=2, cap_height=1, num_query_rounds=10, proof_of_work_bits=5,
        final_poly_len=8,
    )

    def test_device_proof_verifies_and_matches_golden(self):
        evals = _codeword(5, self.CFG.rate_bits, seed=1)
        dev_proof = dev_fri.fri_prove(
            gf64.from_u64(np.array(evals, np.uint64)), self.CFG, Challenger()
        )
        assert gold_fri.fri_verify(dev_proof, len(evals), self.CFG, Challenger(), gl.COSET_SHIFT)
        gold_proof = gold_fri.fri_prove(list(evals), self.CFG, Challenger(), gl.COSET_SHIFT)
        assert dev_proof.caps == gold_proof.caps
        assert dev_proof.betas == gold_proof.betas
        assert dev_proof.final_poly == gold_proof.final_poly
        assert dev_proof.pow_nonce == gold_proof.pow_nonce
        assert dev_proof.query_rounds == gold_proof.query_rounds

    def test_tampered_device_proof_rejected(self):
        evals = _codeword(4, self.CFG.rate_bits, seed=2)
        proof = dev_fri.fri_prove(
            gf64.from_u64(np.array(evals, np.uint64)), self.CFG, Challenger()
        )
        proof.query_rounds[0].layers[0].pair = (123, 456)
        assert not gold_fri.fri_verify(proof, len(evals), self.CFG, Challenger(), gl.COSET_SHIFT)
