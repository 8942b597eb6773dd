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

# embedded claim bundle survives skip-proof transport (structure only; the
# digest-checked verify path is exercised in the slow ed-stark roundtrip)
from blobstreamx_tpu.circuits.skip import SkipPublicOutputs
from blobstreamx_tpu.models import skip
from blobstreamx_tpu.prover.pipeline import SkipClaimData, SkipProof
fake = SkipProof(
    outputs=SkipPublicOutputs(
        trusted_height=1, trusted_root=b"\\x01" * 32, target_height=5,
        target_root=b"\\x02" * 32, data_commitment=b"\\x03" * 32),
    publics=[0] * 46, n_rows=64, stark=proof, timing="",
    claims=SkipClaimData(
        range_heights=[2, 3], range_data_hashes=[b"\\x04" * 32] * 2,
        sign_items=[(b"\\x05" * 32, b"msg", b"\\x06" * 64)],
        trusted_vals=[(b"\\x05" * 32, 7)], target_vals=[(b"\\x05" * 32, 7)]),
)
back2 = skip.from_bytes(skip.to_bytes(fake))
assert back2.claims is not None
assert back2.claims.range_heights == [2, 3]
assert back2.claims.sign_items == fake.claims.sign_items
assert back2.claims.trusted_vals == [(b"\\x05" * 32, 7)]
assert skip.to_bytes(back2) == skip.to_bytes(fake)
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

# self-contained verification: the blob embeds its claim bundle, so the
# verifier needs NOTHING beyond the blob — and reports the ed batch checked
assert back.claims is not None and back.claims.sign_items == items
ok, detail = pipeline.verify_skip_proof_detailed(back, cfg)
assert ok, detail
assert detail["claims"] == "embedded", detail
assert detail["ed_stark"] == "ok", detail

# tampering with the embedded (untrusted) claims must be rejected by the
# digest binding / claim walk, not silently accepted
pk, msg, sig = back.claims.sign_items[0]
back.claims.sign_items[0] = (pk, msg + b"!", sig)
ok2, detail2 = pipeline.verify_skip_proof_detailed(back, cfg)
assert not ok2, detail2

# FAIL CLOSED (ADVICE r3 high): deleting the claims key from the blob must
# NOT downgrade to ok-with-skipped — the ed STARK's batch equation would
# never be checked
import json as _json
d = _json.loads(skip.to_bytes(proof)); del d["claims"]
stripped = skip.from_bytes(_json.dumps(d, separators=(",", ":")).encode())
ok3, detail3 = pipeline.verify_skip_proof_detailed(stripped, cfg)
assert not ok3 and "fail closed" in detail3["ed_stark"], detail3

# embedded claims truncated to sign_items only -> binding fail-closed
d = _json.loads(skip.to_bytes(proof))
for k in ("trusted_vals", "target_vals"):
    d["claims"].pop(k, None)
trunc = skip.from_bytes(_json.dumps(d, separators=(",", ":")).encode())
ok4, detail4 = pipeline.verify_skip_proof_detailed(trunc, cfg)
assert not ok4 and "fail closed" in detail4["binding"], detail4

# malformed bytes -> typed clean rejection, not an arbitrary crash
from blobstreamx_tpu.prover import serialize as _ser
try:
    skip.from_bytes(b'{"schema":1,"kind":"skip","publics":"x"}')
    raise AssertionError("malformed blob must raise ProofDecodeError")
except _ser.ProofDecodeError:
    pass
print("ed-stark transport ok")
"""
        )
