"""Ed25519 batch-equation claim binding (prover.ed_claims): pair derivation
vs the golden batch equation, and a full prove/verify roundtrip with tamper
probes (subprocess; one signature -> 4 STARK segments of 512 rows)."""

import pytest
from blobstreamx_tpu.golden import ed25519 as ged
from blobstreamx_tpu.prover import ed_claims


def _signed_item(seed: int, msg: bytes):
    secret = bytes([(seed + i) % 256 for i in range(32)])
    pk = ged.public_key(secret)
    sig = ged.sign(secret, msg)
    return (pk, msg, sig)


class TestPairs:
    def test_pairs_close_the_equation(self):
        items = [_signed_item(1, b"header-1"), _signed_item(99, b"header-1")]
        pairs = ed_claims.batch_msm_pairs(items)
        assert len(pairs) == 8  # 2n+1 = 5 padded to 8
        total = ged.IDENTITY
        for s, (px, py) in pairs:
            ext = (px, py, 1, px * py % ged.Q)
            total = ged.point_add(total, ged.point_mul(s, ext))
        assert ged.point_equal(total, ged.IDENTITY)

    def test_bad_signature_does_not_close(self):
        pk, msg, sig = _signed_item(2, b"m")
        bad = sig[:32] + bytes([sig[32] ^ 1]) + sig[33:]
        pairs = ed_claims.batch_msm_pairs([(pk, msg, bad)])
        if pairs is None:
            return  # s >= L after the flip: rejected even earlier
        total = ged.IDENTITY
        for s, (px, py) in pairs:
            ext = (px, py, 1, px * py % ged.Q)
            total = ged.point_add(total, ged.point_mul(s, ext))
        assert not ged.point_equal(total, ged.IDENTITY)

    def test_malformed_rejected(self):
        pk, msg, sig = _signed_item(3, b"m")
        assert ed_claims.batch_msm_pairs([(pk[:31], msg, sig)]) is None
        too_big = sig[:32] + (ged.L).to_bytes(32, "little")
        assert ed_claims.batch_msm_pairs([(pk, msg, too_big)]) is None


@pytest.mark.slow
class TestEdClaimsStark:
    def test_roundtrip_and_tampers(self):
        from subproc import run_py

        run_py(
            """
from blobstreamx_tpu.golden import ed25519 as ged
from blobstreamx_tpu.prover import ed_claims
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=6, final_poly_len=8)
secret = bytes(range(32))
pk = ged.public_key(secret)
msg = b"tendermint-vote"
sig = ged.sign(secret, msg)
items = [(pk, msg, sig)]
proof = ed_claims.prove_batch_stark(items, config=CFG)
assert ed_claims.verify_batch_stark(proof, items, config=CFG), "honest rejected"
# a different message must not verify against this proof
assert not ed_claims.verify_batch_stark(proof, [(pk, b"other", sig)], config=CFG)
# tampering a claimed result point must not verify
bad_aux = list(proof.aux)
s0, p0, out0 = bad_aux[0]
bad_aux[0] = (s0, p0, (out0[0] + 1, out0[1], out0[2], out0[3]))
bad = ed_claims.EdStarkProof(stark=proof.stark, aux=bad_aux, n_rows=proof.n_rows)
assert not ed_claims.verify_batch_stark(bad, items, config=CFG)
print("ed claims roundtrip ok")
""",
            timeout=3600,
        )
