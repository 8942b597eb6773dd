"""logUp lookup argument (prover.lookup) on the two-stage STARK: a range
check AIR whose witness column must take values in [0, n), proven via a
multiplicity-weighted rational identity under a post-commit challenge."""

import numpy as np

from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.prover import lookup, stark
from blobstreamx_tpu.prover.air import Air
from blobstreamx_tpu.prover.config import StarkConfig

P = gold.P
N = 64


class RangeAir(Air):
    """cols: [v, m]; fixed: [T = row index]; stage2: [w_v, w_m, A].
    Proves every v is in {0..n-1} via logUp."""

    n_cols = 2
    n_fixed = 1
    n_challenges = 1
    n_stage2 = lookup.n_stage2_cols(1)
    max_degree = 2

    def eval_constraints(self, local, nxt, publics, alg, fixed=None, fixed_next=None,
                         challenges=None, stage2=None, stage2_next=None):
        v, m = local
        v_n, m_n = nxt
        (beta,) = challenges
        return lookup.eval_logup_constraints(
            alg, beta, [v], [v_n], m, m_n, fixed[0], fixed_next[0], stage2, stage2_next
        )

    def fixed_columns(self, n):
        return np.arange(n, dtype=np.uint64)[:, None]

    def sample_challenges(self, challenger, aux):
        return [challenger.sample()]

    def build_stage2(self, trace, challenges, aux):
        table = np.arange(trace.shape[0], dtype=np.uint64)
        return lookup.build_logup_stage2(trace[:, :1], trace[:, 1], table, challenges[0])


CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12,
                  proof_of_work_bits=4, final_poly_len=4)


def _trace(values):
    v = np.asarray(values, dtype=np.uint64)
    m = lookup.multiplicities(v[:, None], np.arange(N, dtype=np.uint64))
    return np.stack([v, m], axis=1)


class TestLogUp:
    def test_roundtrip_and_out_of_range(self):
        """RangeAir prove probes in one 1-device subprocess (tests/subproc.py;
        the 8-device in-process config pays ~10x on the phase compiles)."""
        from subproc import run_py

        run_py(
            """
import sys; sys.path.insert(0, "tests")
import numpy as np
from test_lookup import RangeAir, _trace, CFG, N
from blobstreamx_tpu.prover import stark

rng = np.random.default_rng(2)
trace = _trace(rng.integers(0, N, size=N, dtype=np.uint64))
proof = stark.prove(RangeAir(), trace, [], CFG)
assert stark.verify(RangeAir(), proof, [], CFG, N)

# out-of-range witness: the honest stage-2 builder's self-check trips
vals = rng.integers(0, N, size=N, dtype=np.uint64)
vals[7] = N + 5
try:
    stark.prove(RangeAir(), _trace(vals), [], CFG)
    raise SystemExit("out-of-range witness must not prove")
except AssertionError:
    pass

# forged multiplicity: same closing assert
vals0 = np.zeros(N, dtype=np.uint64)
t2 = _trace(vals0)
t2[0, 1] = N - 1
try:
    stark.prove(RangeAir(), t2, [], CFG)
    raise SystemExit("forged multiplicity must not prove")
except AssertionError:
    pass
print("logup roundtrips ok")
"""
        )

    def test_multi_table_builder_and_vanishing(self):
        """Multi-column-table generalization: 8-bit range table spread over
        nt = 256/n fixed columns; stage-2 closes and the matrix constraints
        vanish on the plain domain."""
        from blobstreamx_tpu.fields import gf64
        from blobstreamx_tpu.prover.air import DeviceAlgebra

        n, k, bits = 32, 5, 8
        rng = np.random.default_rng(7)
        values = rng.integers(0, 1 << bits, size=(n, k), dtype=np.uint64)
        table = lookup.range_table_columns(n, bits)
        nt = table.shape[1]
        assert nt == (1 << bits) // n
        mult = lookup.multiplicities_multi(values, table)
        assert int(mult.sum()) == n * k
        beta = 0x1234567
        s2 = lookup.build_logup_stage2_multi(values, mult, table, beta)
        assert s2.shape == (n, k + nt + 1)
        assert int(s2[-1, -1]) == 0

        import jax.numpy as jnp

        def mat(x):
            g = gf64.from_u64(x % np.uint64(P))
            return g, (jnp.roll(g[0], -1, 0), jnp.roll(g[1], -1, 0))

        alg = DeviceAlgebra((n,))
        vm, vmn = mat(values)
        mm, mmn = mat(mult)
        tm, tmn = mat(table)
        s2m, s2mn = mat(s2)
        cols = lambda m: [(m[0][:, j], m[1][:, j]) for j in range(m[0].shape[1])]
        beta_el = (jnp.full((1,), beta, jnp.uint32) & 0, jnp.zeros((1,), jnp.uint32))
        beta_el = tuple(
            c[0:1] for c in gf64.from_u64(np.array([beta], np.uint64))
        )
        cs = lookup.eval_logup_multi(
            alg, beta_el, vm, mm, tm, vmn, mmn, tmn, cols(s2m), cols(s2mn), k, nt
        )
        for idx, (v, kind) in enumerate(cs):
            arr = np.asarray(gf64.to_u64(v))
            if arr.ndim == 1:
                arr = arr[:, None]
            sl = {"all": slice(None), "transition": slice(0, n - 1),
                  "first": slice(0, 1), "last": slice(n - 1, n)}[kind]
            assert not arr[sl].any(), f"constraint {idx} ({kind}) nonzero"


    def test_multi_table_ext_builder_and_vanishing(self):
        """GF(p²)-challenge variant (the production path, ~2^-101 soundness):
        stage-2 ext pairs close componentwise and the split constraints
        vanish on the plain domain."""
        from blobstreamx_tpu.fields import gf64
        from blobstreamx_tpu.prover.air import DeviceAlgebra

        n, k, bits = 32, 5, 8
        rng = np.random.default_rng(11)
        values = rng.integers(0, 1 << bits, size=(n, k), dtype=np.uint64)
        table = lookup.range_table_columns(n, bits)
        nt = table.shape[1]
        mult = lookup.multiplicities_multi(values, table)
        beta = (0xABCDEF12, 0x13572468)
        s2 = lookup.build_logup_stage2_multi_ext(values, mult, table, beta)
        assert s2.shape == (n, lookup.n_stage2_cols_multi_ext(k, nt))
        assert int(s2[-1, -2]) == 0 and int(s2[-1, -1]) == 0

        # spot-check one PAIRED well against golden GF(p²) arithmetic:
        # u_j = 1/(β−v_{2j}) + 1/(β−v_{2j+1})
        i, j = 3, 1
        q_wells = k // 2 + k % 2
        u = (int(s2[i, j]), int(s2[i, q_wells + j]))
        qa = gold.ext_sub(beta, (int(values[i, 2 * j]), 0))
        qb = gold.ext_sub(beta, (int(values[i, 2 * j + 1]), 0))
        assert gold.ext_mul(u, gold.ext_mul(qa, qb)) == gold.ext_add(qa, qb)

        import jax.numpy as jnp

        def mat(x):
            g = gf64.from_u64(x % np.uint64(P))
            return g, (jnp.roll(g[0], -1, 0), jnp.roll(g[1], -1, 0))

        alg = DeviceAlgebra((n,))
        vm, vmn = mat(values)
        mm, mmn = mat(mult)
        tm, tmn = mat(table)
        s2m, s2mn = mat(s2)
        cols = lambda m: [(m[0][:, j], m[1][:, j]) for j in range(m[0].shape[1])]
        b0 = tuple(c[0:1] for c in gf64.from_u64(np.array([beta[0]], np.uint64)))
        b1 = tuple(c[0:1] for c in gf64.from_u64(np.array([beta[1]], np.uint64)))
        cs = lookup.eval_logup_multi_ext(
            alg, b0, b1, vm, mm, tm, vmn, mmn, tmn, cols(s2m), cols(s2mn), k, nt
        )
        for idx, (v, kind) in enumerate(cs):
            arr = np.asarray(gf64.to_u64(v))
            if arr.ndim == 1:
                arr = arr[:, None]
            sl = {"all": slice(None), "transition": slice(0, n - 1),
                  "first": slice(0, 1), "last": slice(n - 1, n)}[kind]
            assert not arr[sl].any(), f"ext constraint {idx} ({kind}) nonzero"
