"""Bit-exactness of the bounded-memory streaming prover vs stark.prove.

The streaming path (prover.stark_stream) re-derives every committed value
through a different schedule (chunked sponge absorption, class-decomposed
quotient, streamed DEEP/query passes); these tests pin the ONLY acceptable
outcome: byte-identical proofs. Any drift — absorption order, alpha offsets,
divisor tables, roll direction — fails loudly here on tiny shapes.

The SHA/Ed AIR cases run in 1-device cached subprocesses (tests/subproc.py):
under the suite's 8-virtual-device conftest their standard-path quotient
compiles are ~10x slower, and the persistent cache makes reruns cheap."""

import numpy as np
import pytest

from blobstreamx_tpu.prover import stark, stark_stream
from blobstreamx_tpu.prover.config import StarkConfig
from blobstreamx_tpu.prover.pipeline import SkipAir, build_skip_trace
from blobstreamx_tpu.circuits.skip import SkipCheckResult


def test_stream_matches_standard_skip_air():
    """Publics path + n_stage2 == 0 + n_fixed == 0 (the consensus AIR);
    in-process — the 8-column AIR compiles in seconds."""
    from blobstreamx_tpu.prover import serialize

    rng = np.random.default_rng(7)
    n_val = 8
    powers = rng.integers(1, 1000, n_val).astype(np.uint64)
    signed = np.ones(n_val, bool)
    res = SkipCheckResult(
        ok=True,
        reasons=[],
        outputs=None,
        target_powers=powers,
        target_signed=signed,
        trusted_powers=powers,
        trusted_signed=signed,
        signed_target_power=int(powers.sum()),
        total_target_power=int(powers.sum()),
        signed_trusted_power=int(powers.sum()),
        total_trusted_power=int(powers.sum()),
    )
    trace = build_skip_trace(res)
    publics = [int(powers.sum())] * 4 + [0] * 42
    cfg = StarkConfig(rate_bits=2, num_query_rounds=4, proof_of_work_bits=2)
    p_std = stark.prove(SkipAir(), trace, publics, cfg)
    p_str = stark_stream.prove_streaming(SkipAir(), trace, publics, cfg, col_chunk=8)
    assert serialize.stark_proof_to_dict(p_std) == serialize.stark_proof_to_dict(p_str)
    assert stark.verify(SkipAir(), p_str, publics, cfg, trace.shape[0])


@pytest.mark.slow
def test_stream_matches_standard_sha_air():
    from subproc import run_py

    run_py(
        """
from blobstreamx_tpu.prover import serialize, sha_air, stark, stark_stream
from blobstreamx_tpu.prover.config import StarkConfig

msgs = [b"a", b"bc" * 40, b"", b"x" * 100]
chain, blocks = sha_air.plan_blocks(msgs)
trace, aux = sha_air.build_sha_trace(chain, blocks)
air = sha_air.Sha256Air(chain)
cfg = StarkConfig(rate_bits=2, num_query_rounds=4, proof_of_work_bits=2)
p_std = stark.prove(air, trace, [], cfg, aux=aux)
p_str = stark_stream.prove_streaming(air, trace, [], cfg, aux=aux, col_chunk=96)
assert serialize.stark_proof_to_dict(p_std) == serialize.stark_proof_to_dict(p_str)
assert stark.verify(air, p_str, [], cfg, trace.shape[0], aux=aux)
# uncached-coefficients mode (the giant-trace regime) is also identical
p_unc = stark_stream.prove_streaming(air, trace, [], cfg, aux=aux, coeff_cache_bytes=0)
assert serialize.stark_proof_to_dict(p_unc) == serialize.stark_proof_to_dict(p_std)
print("sha stream bit-exact ok")
"""
    )


@pytest.mark.slow
def test_stream_matches_standard_ed_air():
    from subproc import run_py

    run_py(
        """
from blobstreamx_tpu.golden import ed25519 as ged
from blobstreamx_tpu.prover import ed_air, serialize, stark, stark_stream
from blobstreamx_tpu.prover.config import StarkConfig

pairs = [(12345, (ged.BASE[0], ged.BASE[1]))]
trace, aux = ed_air.build_ed_trace(pairs)
air = ed_air.EdScalarMulAir(len(pairs))
cfg = StarkConfig(rate_bits=2, num_query_rounds=3, proof_of_work_bits=2)
p_std = stark.prove(air, trace, [], cfg, aux=aux)
p_str = stark_stream.prove_streaming(air, trace, [], cfg, aux=aux, col_chunk=64)
assert serialize.stark_proof_to_dict(p_std) == serialize.stark_proof_to_dict(p_str)
assert stark.verify(air, p_str, [], cfg, trace.shape[0], aux=aux)
print("ed stream bit-exact ok")
"""
    )


def test_shard_plan_deterministic_and_bounded():
    from blobstreamx_tpu.prover.skip_claims import _n_blocks, _shard_chain, plan_shards

    lengths = [65] * 100 + [33, 130, 65, 1]
    shards = plan_shards(lengths, 64)
    assert shards == plan_shards(lengths, 64)
    covered = []
    for lo, hi, padded in shards:
        covered += list(range(lo, hi))
        real = sum(_n_blocks(L) for L in lengths[lo:hi])
        assert real <= padded <= 64
        assert padded & (padded - 1) == 0
        chain = _shard_chain(lengths, lo, hi, padded)
        assert len(chain) == padded and not chain[0]
    assert covered == list(range(len(lengths)))


@pytest.mark.slow
def test_sharded_skip_sha_stark_roundtrip():
    """Force multiple shards on a small witness; the sharded proof must
    verify, and a tampered pad block must be rejected."""
    from subproc import run_py

    run_py(
        """
from blobstreamx_tpu.models import skip
from blobstreamx_tpu.prover import skip_claims
from blobstreamx_tpu.prover.config import StarkConfig

chain = skip.generate_chain(seed=3, n_headers=4, n_validators=4, sign_heights={4})
w = skip.build_witness(chain, trusted_height=1, target_height=4)
cfg = StarkConfig(rate_bits=2, num_query_rounds=4, proof_of_work_bits=2)
p = skip_claims.prove_skip_sha_stark(w, cfg, max_blocks=64)
assert len(p.starks) > 1, len(p.starks)
kw = dict(
    trusted_root=w.trusted_root,
    target_root=w.target_root,
    trusted_vals=[(pk, int(pw)) for pk, pw in zip(w.trusted_set.pubkeys, w.trusted_set.powers)],
    target_vals=[(pk, int(pw)) for pk, pw in zip(w.target_set.pubkeys, w.target_set.powers)],
    range_heights=[int(h) for h in w.range_heights],
    range_data_hashes=list(w.range_data_hashes),
    data_commitment=None,
    config=cfg,
)
from blobstreamx_tpu.golden import merkle as gmerkle
kw["data_commitment"] = gmerkle.data_commitment(kw["range_heights"], kw["range_data_hashes"])
assert skip_claims.verify_skip_sha_stark(p, **kw)
# tamper a pad block's claimed words -> walk rejects
import dataclasses
aux = [(tuple(ws), tuple(os_)) for ws, os_ in p.aux]
aux[-1] = (tuple([1] + list(aux[-1][0][1:])), aux[-1][1])
bad = dataclasses.replace(p, aux=aux)
assert not skip_claims.verify_skip_sha_stark(bad, **kw)
# wrong shard count -> rejected
bad2 = dataclasses.replace(p, starks=p.starks[:-1])
assert not skip_claims.verify_skip_sha_stark(bad2, **kw)
print("sharded sha stark ok")
"""
    )
