"""Full-coverage SHA claims for the skip relation (prover.skip_claims): the
Curta-parity trust story — every hash of the skip circuit proven in one
batched SHA-256 STARK, walked by a verifier that hashes nothing.

Fast tier: structure helpers + the claim cursor on fabricated data.
Slow tier (1-device subprocess): a real full-coverage skip proof end-to-end
through prove_skip(with_sha_stark="full") with tamper probes for every claim
class (wrong validator list, broken chain link, tampered range, stripped or
cross-proof aux via the digest binding)."""

import pytest

from blobstreamx_tpu.golden import encoding as enc
from blobstreamx_tpu.golden import merkle as gmerkle
from blobstreamx_tpu.prover import skip_claims
from blobstreamx_tpu.prover.sha_claims import _pad_words


class TestStructure:
    def test_path_dirs_match_tree_shape(self):
        # fold a leaf along path_dirs directions == recompute the whole tree
        import hashlib

        leaves = [bytes([i]) * 3 for i in range(14)]
        root = gmerkle.simple_hash_from_byte_slices(leaves)
        for idx in range(14):
            dirs = skip_claims.path_dirs(14, idx)
            sibs = _audit_path(leaves, idx)
            assert len(sibs) == len(dirs)
            h = hashlib.sha256(b"\x00" + leaves[idx]).digest()
            for sib, d in zip(sibs, dirs):
                pair = sib + h if d == 1 else h + sib
                h = hashlib.sha256(b"\x01" + pair).digest()
            assert h == root, idx

    def test_parse_block_id_leaf_roundtrip(self):
        from blobstreamx_tpu.circuits.witness import block_id_leaf_bytes

        leaf = block_id_leaf_bytes(bytes(range(32)), 300, bytes(32))
        prev, total, psh = skip_claims.parse_block_id_leaf(leaf)
        assert prev == bytes(range(32)) and total == 300 and psh == bytes(32)

    def test_message_lengths_match_enumeration(self):
        from blobstreamx_tpu.circuits import fixtures as fx, witness as wit

        chain = fx.generate_chain(
            seed=5, n_headers=8, n_validators=3, sign_heights={6}
        )
        w = wit.build_skip_witness(chain, trusted_height=2, target_height=6)
        msgs, link_fields = skip_claims.skip_sha_messages(w)
        tv = [(pk, int(p)) for pk, p in zip(w.trusted_set.pubkeys, w.trusted_set.powers)]
        gv = [(pk, int(p)) for pk, p in zip(w.target_set.pubkeys, w.target_set.powers)]
        lengths = skip_claims.skip_message_lengths(tv, gv, link_fields)
        assert [len(m) for m in msgs] == lengths


def _audit_path(leaves, idx):
    """Reference sibling list for the RFC-6962 tree (test-local)."""
    import hashlib

    def node(lo, hi):
        if hi - lo == 1:
            return hashlib.sha256(b"\x00" + leaves[lo]).digest()
        k = gmerkle._split_point(hi - lo)
        return hashlib.sha256(b"\x01" + node(lo, lo + k) + node(lo + k, hi)).digest()

    sibs = []

    def walk(i, lo, hi):
        if hi - lo == 1:
            return
        k = gmerkle._split_point(hi - lo)
        if i < lo + k:
            walk(i, lo, lo + k)
            sibs.append(node(lo + k, hi))
        else:
            walk(i, lo + k, hi)
            sibs.append(node(lo, lo + k))

    walk(idx, 0, len(leaves))
    return sibs


class TestCursor:
    """The claim cursor's canonical-padding and layout checks, on fabricated
    aux streams (no STARK involved: these defend against a prover whose
    STARK is valid but whose claim stream is laid out adversarially)."""

    def _aux_for(self, messages):
        from blobstreamx_tpu import native

        aux, chain = [], []
        for m in messages:
            words = _pad_words(m)
            dig = native.sha256(m)
            out = [int.from_bytes(dig[4 * i : 4 * i + 4], "big") for i in range(8)]
            for i, w in enumerate(words):
                aux.append((w, out))  # out only read on the last block
                chain.append(i > 0)
        return aux, tuple(chain)

    def test_take_accepts_canonical(self):
        msg = b"hello world" * 3
        aux, chain = self._aux_for([msg])
        cur = skip_claims._Cursor(aux, chain)
        got = cur.take(len(msg))
        assert got is not None and got[0] == msg

    def test_take_rejects_noncanonical_padding(self):
        msg = b"hello world" * 3
        aux, chain = self._aux_for([msg])
        words = [list(w) for w, _ in aux]
        # flip a bit inside the padding region (after the 0x80 byte, before
        # the length words) — same message bytes, non-canonical block
        words[0][12] ^= 1
        aux = [(tuple(w), o) for w, (_, o) in zip(words, aux)]
        cur = skip_claims._Cursor(aux, chain)
        assert cur.take(len(msg)) is None

    def test_take_rejects_wrong_chain_layout(self):
        msg = b"x" * 100  # 2 blocks
        aux, chain = self._aux_for([msg])
        cur = skip_claims._Cursor(aux, (False, False))  # claims say 2 messages
        assert cur.take(len(msg)) is None

    def test_path_rejects_wrong_running_digest(self):
        sib = bytes(range(32))
        fake = bytes(32)
        msg = b"\x01" + sib + fake  # running digest should be on the RIGHT for dir=1
        aux, chain = self._aux_for([msg])
        cur = skip_claims._Cursor(aux, chain)
        assert cur.path(b"\xff" * 32, [1]) is None  # embedded half != leaf digest


@pytest.mark.slow
class TestFullCoverageSkipProof:
    def test_prove_verify_and_tampers(self):
        from subproc import run_py

        run_py(
            """
import dataclasses
from blobstreamx_tpu.circuits import fixtures as fx, witness as wit
from blobstreamx_tpu.prover import pipeline, skip_claims
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=4, final_poly_len=4)
# smallest shape that exercises every claim class: 2 validators and a
# 1-header range -> 64 SHA blocks -> a 4096-row STARK (execution on the
# CPU test backend scales linearly with rows; real scale runs on TPU via
# benches/configs.py 5 --sha-stark-full)
chain = fx.generate_chain(seed=11, n_headers=6, n_validators=2,
                          sign_fraction=1.0, sign_heights={5})
w = wit.build_skip_witness(chain, trusted_height=4, target_height=5)
p = pipeline.prove_skip(w, CFG, with_sha_stark="full")
claims = pipeline.claim_data_from_witness(w)
ok, detail = pipeline.verify_skip_proof_detailed(p, CFG, claims)
assert ok and detail["sha_stark"] == "ok: full coverage", detail

# --- tamper probes, one per claim class --------------------------------
def reject(claims2=None, proof2=None, why=""):
    ok2, d2 = pipeline.verify_skip_proof_detailed(
        proof2 or p, CFG, claims2 or claims)
    assert not ok2, (why, d2)

# wrong validator list (power tampered): valset tree walk must fail
tv = list(claims.trusted_vals); tv[0] = (tv[0][0], tv[0][1] + 1)
reject(dataclasses.replace(claims, trusted_vals=tv), why="validator power")
# wrong validator pubkey
gv = list(claims.target_vals); gv[0] = (bytes(32), gv[0][1])
reject(dataclasses.replace(claims, target_vals=gv), why="validator pubkey")
# tampered range data hash: data_hash inclusion walk must fail
rdh = list(claims.range_data_hashes)
rdh[0] = bytes([rdh[0][0] ^ 1]) + rdh[0][1:]
reject(dataclasses.replace(claims, range_data_hashes=rdh), why="range hash")
# broken chain link: claimed part-set fields changed -> leaf rebuild differs
lf = list(p.sha_stark.link_fields)
lf[0] = (lf[0][0] + 1, lf[0][1])
bad_sha = dataclasses.replace(p.sha_stark, link_fields=lf)
reject(proof2=dataclasses.replace(p, sha_stark=bad_sha), why="chain link")
# stripped aux STARK: digest binding must reject
reject(proof2=dataclasses.replace(p, sha_stark=None), why="stripped aux")
# cross-proof aux (claims from a different witness): digest binding must
# reject before any walking — simulate by tampering one aux word
aux = [(tuple(ws), tuple(os_)) for ws, os_ in p.sha_stark.aux]
ws0 = list(aux[0][0]); ws0[0] ^= 1
aux[0] = (tuple(ws0), aux[0][1])
bad_sha2 = dataclasses.replace(p.sha_stark, aux=aux)
bad2 = dataclasses.replace(p, sha_stark=bad_sha2)
ok2, d2 = pipeline.verify_skip_proof_detailed(bad2, CFG, claims)
assert not ok2 and "digest" in d2["sha_stark"], d2
print("full-coverage tamper probes ok")
"""
        )

    def test_signer_binding_probes(self):
        from subproc import run_py

        run_py(
            """
import dataclasses
from blobstreamx_tpu.circuits import fixtures as fx, witness as wit
from blobstreamx_tpu.prover import pipeline
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=4, final_poly_len=4)
chain = fx.generate_chain(seed=11, n_headers=12, n_validators=4,
                          rotate_every=4, sign_fraction=0.75, sign_heights={5})
w = wit.build_skip_witness(chain, trusted_height=2, target_height=5)
p = pipeline.prove_skip(w, CFG)
claims = pipeline.claim_data_from_witness(w)
ok, detail = pipeline.verify_skip_proof_detailed(p, CFG, claims)
assert ok and detail["binding"] == "ok", detail

# signer not in the claimed target set
si = list(claims.sign_items); si[0] = (bytes(32), si[0][1], si[0][2])
ok2, d2 = pipeline.verify_skip_proof_detailed(
    p, CFG, dataclasses.replace(claims, sign_items=si))
assert not ok2 and "failed" in d2["binding"], d2
# duplicate signer (double counting)
si = list(claims.sign_items); si.append(si[0])
ok2, d2 = pipeline.verify_skip_proof_detailed(
    p, CFG, dataclasses.replace(claims, sign_items=si))
assert not ok2, d2
# vote naming a different block: rebuild sign bytes for the wrong root
from blobstreamx_tpu.golden import encoding as enc
import hashlib
other = bytes(32)
bad_msg = enc.encode_canonical_vote(5, 0, other, 1,
                                    hashlib.sha256(other).digest(), "celestia")
si = [(pk, bad_msg, sig) for pk, _m, sig in claims.sign_items]
ok2, d2 = pipeline.verify_skip_proof_detailed(
    p, CFG, dataclasses.replace(claims, sign_items=si))
assert not ok2 and "target root" in d2["binding"], d2
# claimed powers inconsistent with the public sums
gv = [(pk, pw + 1) for pk, pw in claims.target_vals]
ok2, d2 = pipeline.verify_skip_proof_detailed(
    p, CFG, dataclasses.replace(claims, target_vals=gv))
assert not ok2 and "power sums" in d2["binding"], d2
print("signer binding probes ok")
"""
        )
