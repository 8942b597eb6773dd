"""End-to-end config-5 slice: fixture chain -> witness -> device consensus
checks -> SkipAir DEEP-ALI STARK -> host verify, with tamper probes."""

import dataclasses

import numpy as np
import pytest

from blobstreamx_tpu.circuits import fixtures as fx, witness as wit
from blobstreamx_tpu.prover import pipeline
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12, proof_of_work_bits=4, final_poly_len=4)


@pytest.fixture(scope="module")
def chain():
    return fx.generate_chain(
        seed=11, n_headers=12, n_validators=4, rotate_every=4,
        sign_fraction=0.75, sign_heights={10},
    )


@pytest.fixture(scope="module")
def proof(chain, tmp_path_factory):
    w = wit.build_skip_witness(chain, trusted_height=2, target_height=10)
    ckpt = tmp_path_factory.mktemp("ckpt")
    return pipeline.prove_skip(w, CFG, checkpoint_dir=str(ckpt))


class TestSkipPipeline:
    def test_roundtrip(self, proof):
        assert pipeline.verify_skip_proof(proof, CFG)
        assert proof.outputs.target_height == 10
        assert "consensus" in proof.timing and "stark" in proof.timing

    def test_tampered_commitment_rejected(self, proof):
        bad_out = dataclasses.replace(proof.outputs, data_commitment=bytes(32))
        bad = dataclasses.replace(proof, outputs=bad_out)
        assert not pipeline.verify_skip_proof(bad, CFG)

    def test_tampered_power_public_rejected(self, proof):
        pub = list(proof.publics)
        pub[0] = pub[1]  # claim every validator signed
        bad = dataclasses.replace(proof, publics=pub)
        assert not pipeline.verify_skip_proof(bad, CFG)

    def test_threshold_violation_rejected(self, proof):
        pub = list(proof.publics)
        pub[0] = pub[1] * 2 // 3  # exactly 2/3, not >
        bad = dataclasses.replace(proof, publics=pub)
        assert not pipeline.verify_skip_proof(bad, CFG)

    def test_unsatisfied_witness_failstop(self, chain):
        w = wit.build_skip_witness(chain, 2, 10)
        w.target_signed = np.zeros_like(w.target_signed)
        with pytest.raises(ValueError):
            pipeline.prove_skip(w, CFG)

    def test_with_sha_stark(self):
        """Opt-in Curta-analog path: the data-commitment tuple tree's hashes
        proven in the batched SHA-256 STARK and checked by the verifier.
        1-device subprocess (see tests/subproc.py)."""
        from subproc import run_py

        run_py(
            """
from blobstreamx_tpu.circuits import fixtures as fx, witness as wit
from blobstreamx_tpu.prover import pipeline
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=4, final_poly_len=4)
chain = fx.generate_chain(seed=11, n_headers=12, n_validators=4,
                          rotate_every=4, sign_fraction=0.75, sign_heights={5})
w = wit.build_skip_witness(chain, trusted_height=2, target_height=5)
p = pipeline.prove_skip(w, CFG, with_sha_stark=True)
assert p.sha_stark is not None
heights = [int(h) for h in w.range_heights]
assert pipeline.verify_skip_proof(
    p, CFG, range_heights=heights, range_data_hashes=w.range_data_hashes
)
bad_hashes = list(w.range_data_hashes)
bad_hashes[0] = bytes([bad_hashes[0][0] ^ 1]) + bad_hashes[0][1:]
assert not pipeline.verify_skip_proof(
    p, CFG, range_heights=heights, range_data_hashes=bad_hashes
)
print("skip with sha stark ok")
"""
        )

    def test_step_roundtrip(self, chain):
        from blobstreamx_tpu.circuits import step as step_mod

        # header 10 is the only signed height in this fixture chain
        w = step_mod.build_step_witness(chain, prev_height=9)
        p = pipeline.prove_step(w, CFG)
        assert pipeline.verify_step_proof(p, CFG)
        assert p.outputs.new_height == 10
        # tamper: claim full participation
        pub = list(p.publics)
        pub[0] = pub[1]
        bad = dataclasses.replace(p, publics=pub)
        assert not pipeline.verify_step_proof(bad, CFG)
        # exactly 2/3 must fail the strict threshold
        pub2 = list(p.publics)
        pub2[0] = pub2[1] * 2 // 3
        bad2 = dataclasses.replace(p, publics=pub2)
        assert not pipeline.verify_step_proof(bad2, CFG)

    def test_trace_matches_scalars(self, chain):
        from blobstreamx_tpu.circuits.skip import verify_skip

        w = wit.build_skip_witness(chain, 2, 10)
        res = verify_skip(w)
        trace = pipeline.build_skip_trace(res)
        assert int(trace[-1, 2]) == res.signed_target_power
        assert int(trace[-1, 3]) == res.total_target_power
        assert int(trace[-1, 6]) == res.signed_trusted_power
        assert int(trace[-1, 7]) == res.total_trusted_power
