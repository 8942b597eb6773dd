"""Consensus-layer tests (C12-C16): device gadgets vs golden models, plus
skip/step end-to-end roundtrips with tamper probes (SURVEY.md §4.3)."""

import hashlib

import jax.numpy as jnp
import numpy as np
import pytest

from blobstreamx_tpu.circuits import data_commitment as dc
from blobstreamx_tpu.circuits import fixtures as fx
from blobstreamx_tpu.circuits import headers as hdr
from blobstreamx_tpu.circuits import skip as skip_mod
from blobstreamx_tpu.circuits import step as step_mod
from blobstreamx_tpu.circuits import validators as vals
from blobstreamx_tpu.circuits import witness as wit
from blobstreamx_tpu.golden import ed25519 as ed
from blobstreamx_tpu.golden import encoding as enc
from blobstreamx_tpu.golden import merkle as gold_merkle
from blobstreamx_tpu.ops import sha256 as sha_ops


def _rand_bytes(rng, n=32):
    return rng.bytes(n)


class TestValidatorGadgets:
    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13, 16, 33])
    def test_pair_promote_equals_rfc6962_split(self, n):
        rng = np.random.default_rng(n)
        leaves = [_rand_bytes(rng) for _ in range(n)]
        digests = sha_ops.bytes32_to_words([gold_merkle.leaf_hash(l) for l in leaves])
        device = sha_ops.digests_to_bytes(vals.simple_root_from_digests(jnp.asarray(digests)))[0]
        assert device == gold_merkle.simple_hash_from_byte_slices(leaves)

    @pytest.mark.parametrize("n", [1, 4, 7, 17])
    def test_validators_root_device(self, n):
        rng = np.random.default_rng(n)
        pairs = [(_rand_bytes(rng), int(rng.integers(1, 1 << 40))) for _ in range(n)]
        root = sha_ops.digests_to_bytes(vals.validators_root_device(pairs))[0]
        assert root == enc.validators_hash(pairs)

    def test_power_sums(self):
        rng = np.random.default_rng(0)
        powers = rng.integers(1, 1 << 62, size=37, dtype=np.uint64)
        mask = rng.integers(0, 2, size=37).astype(bool)
        lo, hi = vals.powers_to_u32(powers)
        s, t = vals.signed_power_sum(jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(mask))
        assert vals.limb_sums_to_int(s) == int(powers[mask].sum(dtype=object))
        assert vals.limb_sums_to_int(t) == int(powers.sum(dtype=object))

    def test_threshold(self):
        assert vals.threshold_gt(34, 100, 1, 3)
        assert not vals.threshold_gt(33, 100, 1, 3)
        assert vals.threshold_gt(67, 100, 2, 3)
        assert not vals.threshold_gt(66, 100, 2, 3)


class TestHeaderInclusions:
    def test_header_field_inclusion_batched(self):
        rng = np.random.default_rng(1)
        proofs = []
        for i in range(6):
            h = enc.Header(
                height=i + 1,
                data_hash=_rand_bytes(rng),
                validators_hash=_rand_bytes(rng),
                next_validators_hash=_rand_bytes(rng),
            )
            leaves = h.field_leaves()
            idx = [enc.DATA_HASH_INDEX, enc.VALIDATORS_HASH_INDEX, enc.NEXT_VALIDATORS_HASH_INDEX][i % 3]
            sibs, dirs = hdr.merkle_proof_with_dirs(leaves, idx)
            proofs.append((leaves[idx], sibs, dirs, h.hash()))
        values, sibs, dirs, roots = hdr.pack_proofs_host(proofs)
        ok = np.asarray(
            hdr.verify_inclusions(
                jnp.asarray(values), jnp.asarray(sibs), jnp.asarray(dirs), jnp.asarray(roots)
            )
        )
        assert ok.all()
        # golden cross-check of the proof structure itself
        h0 = enc.Header(height=1)
        sib0, _ = hdr.merkle_proof_with_dirs(h0.field_leaves(), enc.DATA_HASH_INDEX)
        assert gold_merkle.verify_merkle_proof(
            h0.hash(), h0.field_leaves()[enc.DATA_HASH_INDEX], enc.DATA_HASH_INDEX, 14, sib0
        )

    def test_tampered_value_rejected(self):
        h = enc.Header(height=9, data_hash=hashlib.sha256(b"real").digest())
        leaves = h.field_leaves()
        sibs, dirs = hdr.merkle_proof_with_dirs(leaves, enc.DATA_HASH_INDEX)
        bad_value = bytes(32)  # not the real data_hash
        values, s, d, roots = hdr.pack_proofs_host([(bad_value, sibs, dirs, h.hash())])
        ok = np.asarray(
            hdr.verify_inclusions(jnp.asarray(values), jnp.asarray(s), jnp.asarray(d), jnp.asarray(roots))
        )
        assert not ok.any()


class TestDataCommitment:
    @pytest.mark.parametrize("n", [1, 7, 64])
    def test_matches_golden(self, n):
        rng = np.random.default_rng(n)
        heights = list(range(100, 100 + n))
        hashes = [_rand_bytes(rng) for _ in range(n)]
        assert dc.data_commitment_device(heights, hashes) == gold_merkle.data_commitment(
            heights, hashes
        )


@pytest.fixture(scope="module")
def chain():
    # 16 headers, 4 validators, rotation every 5 heights; only the heights the
    # skip/step tests target get real signatures (signing is host bigint math)
    return fx.generate_chain(
        seed=7,
        n_headers=16,
        n_validators=4,
        rotate_every=5,
        sign_fraction=0.75,  # one non-signer, so the forged-mask probe runs
        sign_heights={9, 13, 4, 5},
    )


class TestFixtures:
    def test_chain_structure(self, chain):
        for k in range(1, len(chain.headers)):
            h = chain.headers[k]
            assert h.header.last_block_id_hash == chain.headers[k - 1].header_hash
            # validators_hash of header k = hash of the set that signs it
            assert h.header.validators_hash == chain.val_sets[k].hash()
            # next_validators link
            assert chain.headers[k - 1].header.next_validators_hash == chain.val_sets[k].hash()

    def test_signatures_verify(self, chain):
        target = chain.header_at(9)
        vset = chain.val_set_at(9)
        msg = target.sign_bytes()
        for v, s, sig in zip(vset.validators, target.signed, target.signatures):
            if s:
                assert ed.verify(v.pubkey, msg, sig)


class TestSkip:
    def test_roundtrip(self, chain):
        w = wit.build_skip_witness(chain, trusted_height=5, target_height=13)
        res = skip_mod.verify_skip(w)
        assert res.ok, res.reasons
        out = res.outputs
        assert out.data_commitment == gold_merkle.data_commitment(
            list(range(6, 14)), [chain.header_at(h).header.data_hash for h in range(6, 14)]
        )
        assert out.trusted_root == chain.header_at(5).header_hash
        assert out.target_root == chain.header_at(13).header_hash
        assert res.signed_target_power * 3 > res.total_target_power * 2

    def test_tampered_data_hash_rejected(self, chain):
        w = wit.build_skip_witness(chain, 5, 13)
        w.range_data_hashes[3] = bytes(32)
        # committed leaves disagree with the verified inclusion values
        assert not skip_mod.verify_skip(w).ok

    def test_tampered_chain_rejected(self, chain):
        w = wit.build_skip_witness(chain, 5, 13)
        cl = w.chain_links
        cl.blocks = cl.blocks.copy()
        cl.blocks[0, 1, 2] ^= 1  # corrupt an embedded prev-hash word
        assert not skip_mod.verify_skip(w).ok

    def test_forged_signature_mask_rejected(self, chain):
        w = wit.build_skip_witness(chain, 5, 13)
        # claim a validator signed who did not provide a valid signature
        w.target_signed = w.target_signed.copy()
        unsigned = int(np.argmin(w.target_signed)) if not w.target_signed.all() else None
        if unsigned is None:
            pytest.skip("all validators signed in this fixture")
        w.target_signed[unsigned] = True
        assert not skip_mod.verify_skip(w).ok

    def test_insufficient_power_rejected(self, chain):
        w = wit.build_skip_witness(chain, 5, 13)
        w.target_signed = np.zeros_like(w.target_signed)
        w.trusted_signed = np.zeros_like(w.trusted_signed)
        res = skip_mod.verify_skip(w)
        assert not res.ok


class TestStep:
    def test_roundtrip(self, chain):
        w = step_mod.build_step_witness(chain, prev_height=4)
        res = step_mod.verify_step(w)
        assert res.ok, res.reasons
        assert res.outputs.new_root == chain.header_at(5).header_hash

    def test_wrong_prev_root_rejected(self, chain):
        w = step_mod.build_step_witness(chain, prev_height=4)
        w.prev_root = bytes(32)
        assert not step_mod.verify_step(w).ok
