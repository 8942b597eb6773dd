"""SHA-256 auxiliary STARK (prover.sha_air): trace builder vs hashlib,
constraint-vanishing harness on the plain domain, and a full prove/verify
roundtrip with tamper probes (the roundtrip runs in a 1-device subprocess)."""

import pytest
import hashlib

import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.prover import sha_air
from blobstreamx_tpu.prover.air import DeviceAlgebra

P = gold.P

MESSAGES = [b"abc", b"x" * 77, b"", b"blobstream" * 20]


def _setup(messages):
    chain, blocks = sha_air.plan_blocks(messages)
    trace, aux = sha_air.build_sha_trace(chain, blocks)
    return chain, blocks, trace, aux


class TestTraceBuilder:
    def test_digests_match_hashlib(self):
        chain, blocks, trace, aux = _setup(MESSAGES)
        digests = sha_air.digests_from_aux(chain, aux)
        want = [hashlib.sha256(m).digest() for m in MESSAGES]
        # dummy pad blocks may append digests of b"" at the end
        assert digests[: len(want)] == want

    def test_bits_are_bits(self):
        _, _, trace, _ = _setup(MESSAGES)
        assert trace.max() <= 1

    def test_vectorized_matches_scalar_reference(self):
        chain, blocks = sha_air.plan_blocks(MESSAGES)
        t_fast, aux_fast = sha_air.build_sha_trace(chain, blocks)
        t_ref, aux_ref = sha_air.build_sha_trace_ref(chain, blocks)
        assert aux_fast == aux_ref
        assert np.array_equal(t_fast, t_ref)


class TestConstraintsVanish:
    """Evaluate every constraint on the PLAIN trace domain (nxt = roll by 1)
    and assert it vanishes on the rows its divisor covers. Much faster than
    the full prover and pinpoints the failing constraint index."""

    def test_vanishing(self):
        chain, blocks, trace, aux = _setup(MESSAGES)
        air = sha_air.Sha256Air(chain)
        n = trace.shape[0]

        ch = Challenger()
        air.observe_aux(ch, aux)
        chals = air.sample_challenges(ch, aux)
        s2 = air.build_stage2(trace, chals, aux)

        t_gl = gf64.from_u64(trace)
        s2_gl = gf64.from_u64(s2)
        fx_gl = gf64.from_u64(air.fixed_columns(n) % P)
        chal_gl = gf64.from_u64(np.array([v % P for v in chals], np.uint64))

        import jax.numpy as jnp

        def cols(m, k):
            cur = [(m[0][:, j], m[1][:, j]) for j in range(k)]
            nxt = [
                (jnp.roll(m[0][:, j], -1), jnp.roll(m[1][:, j], -1)) for j in range(k)
            ]
            return cur, nxt

        local, nxt = cols(t_gl, air.n_cols)
        stage2, stage2_next = cols(s2_gl, air.n_stage2)
        fixed, fixed_next = cols(fx_gl, air.n_fixed)
        chs = [(chal_gl[0][j : j + 1], chal_gl[1][j : j + 1]) for j in range(len(chals))]
        alg = DeviceAlgebra((n,))
        cs = air.eval_constraints(
            local,
            nxt,
            [],
            alg,
            fixed=fixed,
            fixed_next=fixed_next,
            challenges=chs,
            stage2=stage2,
            stage2_next=stage2_next,
        )
        for idx, (value, kind) in enumerate(cs):
            v = np.asarray(gf64.to_u64(value))
            if v.ndim == 1:
                v = v[:, None]
            if kind == "all":
                bad = np.argwhere(v != 0)
            elif kind == "transition":
                bad = np.argwhere(v[:-1] != 0)
            elif kind == "first":
                bad = np.argwhere(v[0:1] != 0)
            elif kind == "last":
                bad = np.argwhere(v[-1:] != 0)
            assert bad.size == 0, f"constraint {idx} ({kind}) nonzero at {bad[:5]}"


class TestConstraintGroups:
    def test_groups_concatenate_to_eval_constraints(self):
        """Chunked-quotient invariant (Air.eval_constraint_group contract):
        concatenating the groups reproduces eval_constraints exactly —
        values, kinds, order — on the host ext algebra."""
        import numpy as np

        from blobstreamx_tpu.prover.air import HostExtAlgebra

        air = sha_air.Sha256Air((False, True))
        alg = HostExtAlgebra()
        rng = np.random.default_rng(0)

        def rnd():
            return (int(rng.integers(0, 2**62)), int(rng.integers(0, 2**62)))

        local = [rnd() for _ in range(air.n_cols)]
        nxt = [rnd() for _ in range(air.n_cols)]
        kw = dict(
            fixed=[rnd() for _ in range(air.n_fixed)],
            fixed_next=[rnd() for _ in range(air.n_fixed)],
            challenges=[rnd() for _ in range(air.n_challenges)],
            stage2=[rnd()],
            stage2_next=[rnd()],
        )
        full = air.eval_constraints(local, nxt, [], alg, **kw)
        parts = []
        for g in range(air.n_constraint_groups):
            parts += air.eval_constraint_group(g, local, nxt, [], alg, **kw)
        assert [(v, k) for v, k in full] == [(v, k) for v, k in parts]


@pytest.mark.slow
class TestShaStark:
    def test_roundtrip_and_tampers(self):
        """Full prove/verify + tamper probes, in a 1-device subprocess (the
        1300-column quotient compile is pathological under the suite's
        8-virtual-device config — see tests/subproc.py)."""
        from subproc import run_py

        run_py(
            """
import hashlib
from blobstreamx_tpu.prover import sha_air, stark
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=6, final_poly_len=8)
chain, blocks = sha_air.plan_blocks([b"abc"])
trace, aux = sha_air.build_sha_trace(chain, blocks)
air = sha_air.Sha256Air(chain)
proof = stark.prove(air, trace, [], CFG, aux=aux)
n = trace.shape[0]
assert stark.verify(air, proof, [], CFG, n, aux=aux), "honest rejected"
assert sha_air.digests_from_aux(chain, aux)[0] == hashlib.sha256(b"abc").digest()
bad = [(w, tuple((d + 1) & 0xFFFFFFFF if j == 0 else d for j, d in enumerate(out)))
       for (w, out) in aux]
assert not stark.verify(air, proof, [], CFG, n, aux=bad), "digest tamper accepted"
bad2 = [(tuple(w ^ 1 if j == 3 else w for j, w in enumerate(ws)), out)
        for (ws, out) in aux]
assert not stark.verify(air, proof, [], CFG, n, aux=bad2), "message tamper accepted"
print("sha stark roundtrip ok")
"""
        )
