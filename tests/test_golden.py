"""Golden-model self-checks (SURVEY.md §4.3 items 1–2).

Where an independent oracle exists in the environment (hashlib for SHA-2, the
`cryptography` package for Ed25519) the golden model is checked against it, so
the spec derivations here are not merely self-consistent.
"""

import hashlib
import os
import random

import pytest

from blobstreamx_tpu.golden import ed25519, encoding, fri, goldilocks as gl, merkle, ntt
from blobstreamx_tpu.golden import poseidon, sha256 as gsha256, sha512 as gsha512
from blobstreamx_tpu.golden.challenger import Challenger


class TestGoldilocks:
    def test_constants(self):
        assert gl.P == 0xFFFFFFFF00000001
        # canonical 2^32 root of unity (plonky2's published POWER_OF_TWO_GENERATOR)
        assert gl.POWER_OF_TWO_GENERATOR == pow(7, (gl.P - 1) >> 32, gl.P)
        assert pow(gl.POWER_OF_TWO_GENERATOR, 1 << 32, gl.P) == 1
        assert pow(gl.POWER_OF_TWO_GENERATOR, 1 << 31, gl.P) != 1

    def test_field_axioms(self):
        rng = random.Random(0)
        for _ in range(200):
            a, b, c = (rng.randrange(gl.P) for _ in range(3))
            assert gl.mul(a, gl.add(b, c)) == gl.add(gl.mul(a, b), gl.mul(a, c))
            if a:
                assert gl.mul(a, gl.inv(a)) == 1

    def test_extension(self):
        rng = random.Random(1)
        for _ in range(50):
            a = (rng.randrange(gl.P), rng.randrange(gl.P))
            if a == (0, 0):
                continue
            assert gl.ext_mul(a, gl.ext_inv(a)) == (1, 0)
        # X^2 = W
        assert gl.ext_mul((0, 1), (0, 1)) == (gl.EXT_W, 0)


class TestNTT:
    @pytest.mark.parametrize("log_n", [0, 1, 3, 6])
    def test_ntt_matches_naive_eval(self, log_n):
        rng = random.Random(2)
        coeffs = [rng.randrange(gl.P) for _ in range(1 << log_n)]
        points = ntt.subgroup(log_n)
        assert ntt.ntt(coeffs) == ntt.naive_evaluate(coeffs, points)

    @pytest.mark.parametrize("log_n", [1, 4, 7])
    def test_roundtrip(self, log_n):
        rng = random.Random(3)
        coeffs = [rng.randrange(gl.P) for _ in range(1 << log_n)]
        assert ntt.intt(ntt.ntt(coeffs)) == coeffs
        assert ntt.coset_intt(ntt.coset_ntt(coeffs)) == coeffs

    def test_lde_agrees_on_coset(self):
        rng = random.Random(4)
        coeffs = [rng.randrange(gl.P) for _ in range(8)]
        ext = ntt.lde(coeffs, rate_bits=2)
        points = ntt.subgroup(5, shift=gl.COSET_SHIFT)
        assert ext == ntt.naive_evaluate(coeffs, points)


class TestSha2:
    @pytest.mark.parametrize("n", [0, 1, 55, 56, 64, 100, 1000])
    def test_sha256_matches_hashlib(self, n):
        # sha256_pure is the from-scratch spec model (the kernel oracle);
        # sha256() is the hashlib-backed fast path the witness builder uses.
        # Both must agree with each other and the library.
        msg = bytes(range(256)) * 4
        msg = msg[:n]
        assert gsha256.sha256_pure(msg) == hashlib.sha256(msg).digest()
        assert gsha256.sha256(msg) == gsha256.sha256_pure(msg)

    @pytest.mark.parametrize("n", [0, 1, 111, 112, 128, 300])
    def test_sha512_matches_hashlib(self, n):
        msg = os.urandom(n)
        assert gsha512.sha512(msg) == hashlib.sha512(msg).digest()


class TestPoseidon:
    def test_round_constants_deterministic(self):
        rc = poseidon.round_constants()
        assert len(rc) == 360
        assert all(0 <= c < gl.P for c in rc)
        assert len(set(rc)) > 350  # sanity: constants look random

    def test_permutation_changes_state(self):
        out = poseidon.permute([0] * 12)
        assert out != [0] * 12
        assert all(0 <= x < gl.P for x in out)
        # determinism
        assert poseidon.permute([0] * 12) == out

    def test_sponge_lengths(self):
        digest = poseidon.hash_no_pad(list(range(20)))
        assert len(digest) == 4
        left, right = digest, poseidon.hash_no_pad([5])
        assert len(poseidon.two_to_one(left, right)) == 4


class TestMerkle:
    def test_rfc6962_empty_and_single(self):
        assert merkle.simple_hash_from_byte_slices([]) == hashlib.sha256(b"").digest()
        leaf = b"hello"
        assert (
            merkle.simple_hash_from_byte_slices([leaf])
            == hashlib.sha256(b"\x00" + leaf).digest()
        )

    def test_rfc6962_two(self):
        a, b = b"a", b"b"
        la = hashlib.sha256(b"\x00" + a).digest()
        lb = hashlib.sha256(b"\x00" + b).digest()
        expect = hashlib.sha256(b"\x01" + la + lb).digest()
        assert merkle.simple_hash_from_byte_slices([a, b]) == expect

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 64])
    def test_inclusion_proofs(self, n):
        leaves = [bytes([i]) * 10 for i in range(n)]
        root = merkle.simple_hash_from_byte_slices(leaves)
        for i in range(n):
            path = merkle.merkle_proof(leaves, i)
            assert merkle.verify_merkle_proof(root, leaves[i], i, n, path)
        if n > 1:
            path = merkle.merkle_proof(leaves, 0)
            assert not merkle.verify_merkle_proof(root, b"evil", 0, n, path)

    def test_data_commitment_64_leaves(self):
        """Config 1 shape (/root/repo/BASELINE.json:7): 64 tuple leaves."""
        heights = list(range(100, 164))
        hashes = [hashlib.sha256(str(h).encode()).digest() for h in heights]
        root = merkle.data_commitment(heights, hashes)
        assert len(root) == 32
        # leaf layout: 32B BE height || 32B hash
        t = merkle.data_root_tuple(heights[0], hashes[0])
        assert len(t) == 64 and t[:32] == heights[0].to_bytes(32, "big")

    @pytest.mark.parametrize("cap_height", [0, 1, 2])
    def test_poseidon_tree_paths(self, cap_height):
        rng = random.Random(7)
        leaves = [[rng.randrange(gl.P) for _ in range(7)] for _ in range(8)]
        cap = merkle.poseidon_tree_cap(leaves, cap_height)
        assert len(cap) == 1 << cap_height
        for i in range(8):
            path, _ = merkle.poseidon_merkle_path(leaves, i, cap_height)
            assert merkle.poseidon_verify_path(cap, leaves[i], i, path)
        path, _ = merkle.poseidon_merkle_path(leaves, 0, cap_height)
        assert not merkle.poseidon_verify_path(cap, [1, 2, 3], 0, path)


class TestEd25519:
    def test_sign_verify_roundtrip(self):
        secret = bytes(range(32))
        pk = ed25519.public_key(secret)
        msg = b"tendermint vote"
        sig = ed25519.sign(secret, msg)
        assert ed25519.verify(pk, msg, sig)
        assert not ed25519.verify(pk, msg + b"!", sig)
        assert not ed25519.verify(pk, msg, sig[:32] + b"\x00" * 32)

    def test_against_cryptography_package(self):
        from cryptography.hazmat.primitives.asymmetric.ed25519 import Ed25519PrivateKey
        from cryptography.hazmat.primitives.serialization import (
            Encoding, NoEncryption, PrivateFormat, PublicFormat,
        )

        for i in range(4):
            key = Ed25519PrivateKey.generate()
            raw = key.private_bytes(Encoding.Raw, PrivateFormat.Raw, NoEncryption())
            pub = key.public_key().public_bytes(Encoding.Raw, PublicFormat.Raw)
            msg = os.urandom(40)
            lib_sig = key.sign(msg)
            # deterministic: our golden sign must produce identical bytes
            assert ed25519.public_key(raw) == pub
            assert ed25519.sign(raw, msg) == lib_sig
            assert ed25519.verify(pub, msg, lib_sig)

    def test_batch_equation(self):
        rng = random.Random(9)
        items = []
        for i in range(4):
            secret = bytes([i]) * 32
            pk = ed25519.public_key(secret)
            msg = f"header {i}".encode()
            items.append((pk, msg, ed25519.sign(secret, msg)))
        zs = [rng.getrandbits(128) | 1 for _ in items]
        assert ed25519.batch_verify_equation(items, zs)
        bad = items.copy()
        pk, msg, sig = bad[0]
        bad[0] = (pk, msg + b"x", sig)
        assert not ed25519.batch_verify_equation(bad, zs)


class TestEncoding:
    def test_varint(self):
        assert encoding.encode_varint(0) == b"\x00"
        assert encoding.encode_varint(1) == b"\x01"
        assert encoding.encode_varint(300) == b"\xac\x02"

    def test_simple_validator(self):
        pk = bytes(range(32))
        enc = encoding.encode_simple_validator(pk, 1000)
        # pub_key field: tag 0x0a, len 34, inner tag 0x0a len 32
        assert enc[0] == 0x0A and enc[1] == 34 and enc[2] == 0x0A and enc[3] == 32
        assert enc[4:36] == pk
        assert enc[36] == 0x10  # voting_power tag

    def test_header_hash_is_14_field_tree(self):
        h = encoding.Header(height=5, data_hash=b"\x11" * 32)
        leaves = h.field_leaves()
        assert len(leaves) == encoding.HEADER_NUM_FIELDS
        assert h.hash() == merkle.simple_hash_from_byte_slices(leaves)
        assert leaves[encoding.DATA_HASH_INDEX] == b"\x11" * 32

    def test_canonical_vote_roundtrippable_prefix(self):
        sb = encoding.encode_canonical_vote(10, 0, b"\xaa" * 32, 1, b"\xbb" * 32, "celestia")
        body_len, shift = 0, 0
        i = 0
        while True:
            b = sb[i]
            body_len |= (b & 0x7F) << shift
            shift += 7
            i += 1
            if not b & 0x80:
                break
        assert len(sb) - i == body_len


class TestChallenger:
    def test_deterministic_and_order_sensitive(self):
        c1, c2, c3 = Challenger(), Challenger(), Challenger()
        c1.observe_many([1, 2, 3])
        c2.observe_many([1, 2, 3])
        c3.observe_many([3, 2, 1])
        s1, s2, s3 = c1.sample(), c2.sample(), c3.sample()
        assert s1 == s2 != s3

    def test_indices_bounded(self):
        c = Challenger()
        c.observe(42)
        for idx in c.sample_indices(50, 64):
            assert 0 <= idx < 64


class TestFri:
    @pytest.mark.parametrize("log_n,rate_bits", [(3, 2), (4, 3)])
    def test_fold_preserves_low_degree(self, log_n, rate_bits):
        rng = random.Random(11)
        n_coeff = 1 << log_n
        coeffs = [rng.randrange(gl.P) for _ in range(n_coeff)]
        evals = ntt.lde(coeffs, rate_bits)
        beta = rng.randrange(gl.P)
        folded = fri.fold_codeword(evals, beta, gl.COSET_SHIFT)
        # folded codeword must itself be a codeword of half the degree on the
        # squared domain
        shift2 = gl.mul(gl.COSET_SHIFT, gl.COSET_SHIFT)
        fold_coeffs = ntt.coset_intt(folded, shift2)
        assert all(c == 0 for c in fold_coeffs[n_coeff // 2 :])

    def test_prove_verify_roundtrip(self):
        rng = random.Random(12)
        config = fri.FriConfig(rate_bits=2, cap_height=1, num_query_rounds=8,
                               proof_of_work_bits=4, final_poly_len=4)
        coeffs = [rng.randrange(gl.P) for _ in range(16)]
        evals = ntt.lde(coeffs, config.rate_bits)
        proof = fri.fri_prove(evals, config, Challenger(), gl.COSET_SHIFT)
        assert fri.fri_verify(proof, len(evals), config, Challenger(), gl.COSET_SHIFT)

    def test_verify_rejects_tampering(self):
        rng = random.Random(13)
        config = fri.FriConfig(rate_bits=2, cap_height=0, num_query_rounds=8,
                               proof_of_work_bits=2, final_poly_len=4)
        coeffs = [rng.randrange(gl.P) for _ in range(16)]
        evals = ntt.lde(coeffs, config.rate_bits)
        proof = fri.fri_prove(evals, config, Challenger(), gl.COSET_SHIFT)
        proof.final_poly[0] = gl.add(proof.final_poly[0], 1)
        assert not fri.fri_verify(proof, len(evals), config, Challenger(), gl.COSET_SHIFT)

    def test_verify_rejects_high_degree(self):
        rng = random.Random(14)
        config = fri.FriConfig(rate_bits=2, cap_height=0, num_query_rounds=16,
                               proof_of_work_bits=2, final_poly_len=4)
        # random vector is (whp) NOT a low-degree codeword; an honest prover
        # run on it must fail verification at the final-poly consistency check
        evals = [rng.randrange(gl.P) for _ in range(64)]
        proof = fri.fri_prove(evals, config, Challenger(), gl.COSET_SHIFT)
        assert not fri.fri_verify(proof, len(evals), config, Challenger(), gl.COSET_SHIFT)
