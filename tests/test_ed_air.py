"""Ed25519 scalar-mul auxiliary STARK (prover.ed_air): trace builder vs the
golden RFC 8032 ladder, constraint-vanishing harness on the plain domain, and
a full prove/verify roundtrip with claim-tamper probes (the roundtrip runs in
a 1-device subprocess, like the SHA-256 STARK's)."""

import pytest
import random

import numpy as np

from blobstreamx_tpu.fields import gf64
from blobstreamx_tpu.golden import ed25519 as ged
from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.golden.challenger import Challenger
from blobstreamx_tpu.prover import ed_air
from blobstreamx_tpu.prover.air import DeviceAlgebra, HostExtAlgebra

P = gold.P


class TestConstraintGroups:
    def test_groups_concatenate_to_eval_constraints(self):
        """Chunked-quotient invariant (Air.eval_constraint_group docstring):
        the concatenation of the groups must equal eval_constraints exactly —
        values, widths, kinds, order — else the grouped prover's alpha
        assignment diverges from the verifier's."""
        air = ed_air.EdScalarMulAir(1)
        rng = random.Random(1)

        def rv():
            return (rng.randrange(P), rng.randrange(P))

        local = [rv() for _ in range(air.n_cols)]
        nxt = [rv() for _ in range(air.n_cols)]
        kw = dict(
            fixed=[rv() for _ in range(air.n_fixed)],
            fixed_next=[rv() for _ in range(air.n_fixed)],
            challenges=[rv() for _ in range(air.n_challenges)],
            stage2=[rv() for _ in range(air.n_stage2)],
            stage2_next=[rv() for _ in range(air.n_stage2)],
        )
        alg = HostExtAlgebra()
        whole = air.eval_constraints(local, nxt, [], alg, **kw)
        parts = []
        for g in range(air.n_constraint_groups):
            parts += air.eval_constraint_group(g, local, nxt, [], alg, **kw)
        assert len(whole) == len(parts)
        for i, ((v1, k1), (v2, k2)) in enumerate(zip(whole, parts)):
            assert k1 == k2, f"kind mismatch at constraint {i}"
            assert v1 == v2, f"value mismatch at constraint {i}"


def _affine(p):
    zi = pow(p[2], ged.Q - 2, ged.Q)
    return (p[0] * zi % ged.Q, p[1] * zi % ged.Q)


def _point(seed: int):
    return _affine(ged.point_mul(seed, ged.BASE))


class TestTraceBuilder:
    def test_claims_match_golden(self):
        s = 0x5AF3107A4000F00D % ged.L
        trace, aux = ed_air.build_ed_trace([(s, _point(7))])
        assert trace.shape == (512, ed_air.EdScalarMulAir(1).n_cols)
        assert ed_air.claims_hold(aux)

    def test_edge_scalars(self):
        pt = _point(11)
        trace, aux = ed_air.build_ed_trace([(0, pt), (1, pt), (ged.L - 1, pt), (2, pt)])
        assert ed_air.claims_hold(aux)
        # s = 0 must land on the identity
        out = aux[0][2]
        assert ged.point_equal(out, (0, 1, 1, 0))

    def test_vectorized_matches_scalar_reference(self):
        pairs = [(0xF00DBA5E0 % ged.L, _point(21)), ((1 << 252) + 5, _point(22))]
        t_fast, aux_fast = ed_air.build_ed_trace(pairs)
        t_ref, aux_ref = ed_air.build_ed_trace_ref(pairs)
        assert aux_fast == aux_ref
        assert np.array_equal(t_fast, t_ref)

    def test_limbs_in_range(self):
        trace, _ = ed_air.build_ed_trace([(12345, _point(3))])
        vals = trace[:, ed_air.OFF_WIT : ed_air.OFF_WIT + ed_air.N_LOOKUP]
        assert int(vals.max()) < (1 << 16)


@pytest.mark.slow
class TestConstraintsVanish:
    def test_vanishing(self):
        s = (0xDEADBEEF << 200 | 0x12345) % (1 << ed_air.BITS)
        trace, aux = ed_air.build_ed_trace([(s, _point(5))])
        air = ed_air.EdScalarMulAir(1)
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


@pytest.mark.slow
class TestEdStark:
    def test_roundtrip_and_tampers(self):
        from subproc import run_py

        run_py(
            """
from blobstreamx_tpu.golden import ed25519 as ged
from blobstreamx_tpu.prover import ed_air, stark
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=6, final_poly_len=8)
zi = pow(ged.BASE[2], ged.Q - 2, ged.Q)
pt = (ged.BASE[0] * zi % ged.Q, ged.BASE[1] * zi % ged.Q)
s = 0x1234567890ABCDEF1234567890ABCDEF
trace, aux = ed_air.build_ed_trace([(s, pt)])
air = ed_air.EdScalarMulAir(1)
proof = stark.prove(air, trace, [], CFG, aux=aux)
n = trace.shape[0]
assert stark.verify(air, proof, [], CFG, n, aux=aux), "honest rejected"
assert ed_air.claims_hold(aux)
# tamper the claimed scalar
bad = [(aux[0][0] ^ 4, aux[0][1], aux[0][2])]
assert not stark.verify(air, proof, [], CFG, n, aux=bad), "scalar tamper accepted"
# tamper the claimed result point
out = aux[0][2]
bad2 = [(aux[0][0], aux[0][1], (out[0] + 1, out[1], out[2], out[3]))]
assert not stark.verify(air, proof, [], CFG, n, aux=bad2), "result tamper accepted"
print("ed25519 stark roundtrip ok")
""",
            timeout=5400,  # cold 1-dev compile of the 11-group Ed quotient
            # runs ~1 h on this image's 2 cores; the persistent cache makes
            # reruns minutes
        )
