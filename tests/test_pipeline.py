"""End-to-end config-5 slice: fixture chain -> witness -> device consensus
checks -> SkipAir DEEP-ALI STARK -> host verify, with tamper probes.

The STARK-proving battery runs in ONE 1-device subprocess (tests/subproc.py):
under this suite's 8-virtual-device config XLA:CPU compiles ~10x slower and
the persistent compile cache must stay off (see conftest), so in-process
proving here cost ~20 min/run; the subprocess path is warm-cached and runs
in seconds. Consensus-layer checks (no STARK) stay in-process."""

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


class TestConsensusLayer:
    def test_unsatisfied_witness_failstop(self, chain):
        w = wit.build_skip_witness(chain, 2, 10)
        w.target_signed = np.zeros_like(w.target_signed)
        with pytest.raises(ValueError):
            pipeline.prove_skip(w, CFG)

    def test_trace_matches_scalars(self, chain):
        from blobstreamx_tpu.circuits.skip import verify_skip

        w = wit.build_skip_witness(chain, 2, 10)
        res = verify_skip(w)
        trace = pipeline.build_skip_trace(res)
        assert int(trace[-1, 2]) == res.signed_target_power
        assert int(trace[-1, 3]) == res.total_target_power
        assert int(trace[-1, 6]) == res.signed_trusted_power
        assert int(trace[-1, 7]) == res.total_trusted_power

    def test_publics_layout(self, chain):
        from blobstreamx_tpu.circuits.skip import verify_skip

        w = wit.build_skip_witness(chain, 2, 10)
        res = verify_skip(w)
        pub = pipeline.skip_publics(res.outputs, res)
        assert len(pub) == pipeline.SkipAir.N_PUBLICS
        # digest words are zero when no aux STARKs are attached
        assert pub[30:46] == [0] * 16


class TestSkipPipeline:
    def test_prove_verify_tampers_resume(self):
        """Roundtrip + tamper probes + checkpoint resume + step workload, in
        one subprocess so the compiled programs are built once."""
        from subproc import run_py

        run_py(
            """
import dataclasses
import tempfile

import numpy as np

from blobstreamx_tpu.circuits import fixtures as fx, witness as wit
from blobstreamx_tpu.prover import pipeline
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=4, final_poly_len=4)
chain = fx.generate_chain(seed=11, n_headers=12, n_validators=4,
                          rotate_every=4, sign_fraction=0.75, sign_heights={10})
w = wit.build_skip_witness(chain, trusted_height=2, target_height=10)
ckpt = tempfile.mkdtemp()
proof = pipeline.prove_skip(w, CFG, checkpoint_dir=ckpt)

# roundtrip
assert pipeline.verify_skip_proof(proof, CFG)
assert proof.outputs.target_height == 10
assert "consensus" in proof.timing and "stark" in proof.timing

# tampered data commitment
bad_out = dataclasses.replace(proof.outputs, data_commitment=bytes(32))
assert not pipeline.verify_skip_proof(dataclasses.replace(proof, outputs=bad_out), CFG)

# tampered power public: claim every validator signed
pub = list(proof.publics); pub[0] = pub[1]
assert not pipeline.verify_skip_proof(dataclasses.replace(proof, publics=pub), CFG)

# exactly 2/3 fails the strict threshold
pub2 = list(proof.publics); pub2[0] = pub2[1] * 2 // 3
assert not pipeline.verify_skip_proof(dataclasses.replace(proof, publics=pub2), CFG)

# signer-binding checks on the default proof (no aux STARKs needed)
claims = pipeline.claim_data_from_witness(w)
ok, detail = pipeline.verify_skip_proof_detailed(proof, CFG, claims)
assert ok and detail["binding"] == "ok", detail

# checkpoint resume: a retry must do NO STARK work (SURVEY.md §5.4)
from blobstreamx_tpu.prover import stark as stark_mod
orig = stark_mod.prove
def boom(*a, **k):
    raise RuntimeError("resume failed: stark.prove called on retry")
stark_mod.prove = boom
try:
    p2 = pipeline.prove_skip(w, CFG, checkpoint_dir=ckpt)
finally:
    stark_mod.prove = orig
from blobstreamx_tpu.prover.serialize import skip_proof_to_bytes
assert skip_proof_to_bytes(dataclasses.replace(p2, timing="")) == \
       skip_proof_to_bytes(dataclasses.replace(proof, timing=""))
assert "resumed from checkpoint" in p2.timing

# a different witness must NOT resume from those checkpoints
calls = {"n": 0}
def counting(*a, **k):
    calls["n"] += 1
    return orig(*a, **k)
stark_mod.prove = counting
try:
    w2 = wit.build_skip_witness(chain, trusted_height=3, target_height=10)
    p3 = pipeline.prove_skip(w2, CFG, checkpoint_dir=ckpt)
finally:
    stark_mod.prove = orig
assert calls["n"] == 1 and pipeline.verify_skip_proof(p3, CFG)

# step workload roundtrip + tampers
from blobstreamx_tpu.circuits import step as step_mod
ws = step_mod.build_step_witness(chain, prev_height=9)
ps = pipeline.prove_step(ws, CFG)
assert pipeline.verify_step_proof(ps, CFG)
assert ps.outputs.new_height == 10
pub = list(ps.publics); pub[0] = pub[1]
assert not pipeline.verify_step_proof(dataclasses.replace(ps, publics=pub), CFG)
pub2 = list(ps.publics); pub2[0] = pub2[1] * 2 // 3
assert not pipeline.verify_step_proof(dataclasses.replace(ps, publics=pub2), CFG)
print("pipeline battery ok")
"""
        )

    @pytest.mark.slow
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
# stripping the aux STARK must be caught by the digest binding alone
import dataclasses
assert not pipeline.verify_skip_proof(dataclasses.replace(p, sha_stark=None), CFG)
print("skip with sha stark ok")
"""
        )
