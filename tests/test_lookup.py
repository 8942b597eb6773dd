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
    def test_in_range_roundtrip(self):
        rng = np.random.default_rng(2)
        trace = _trace(rng.integers(0, N, size=N, dtype=np.uint64))
        proof = stark.prove(RangeAir(), trace, [], CFG)
        assert stark.verify(RangeAir(), proof, [], CFG, N)

    def test_out_of_range_witness_fails(self):
        """An out-of-range value cannot satisfy the identity: the honest
        stage-2 builder's self-check trips (the accumulator cannot close)."""
        rng = np.random.default_rng(3)
        vals = rng.integers(0, N, size=N, dtype=np.uint64)
        vals[7] = N + 5  # not in the table
        trace = _trace(vals)
        import pytest

        with pytest.raises(AssertionError):
            stark.prove(RangeAir(), trace, [], CFG)

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

    def test_forged_multiplicity_rejected(self):
        """Lie about multiplicities instead: build a trace where m claims a
        different multiset. build_stage2's closing assert fires — and if a
        malicious prover forced an A column anyway, the 'last' pin A = 0
        could only hold with probability ~n/|F| over beta."""
        vals = np.zeros(N, dtype=np.uint64)  # all zeros: m[0] should be N
        trace = _trace(vals)
        trace[0, 1] = N - 1  # forged count
        import pytest

        with pytest.raises(AssertionError):
            stark.prove(RangeAir(), trace, [], CFG)
