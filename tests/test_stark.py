"""End-to-end DEEP-ALI STARK: prove on device, verify on host, tamper probes."""

import dataclasses

import numpy as np
import pytest

from blobstreamx_tpu.golden import goldilocks as gold
from blobstreamx_tpu.prover.air import Air
from blobstreamx_tpu.prover.config import StarkConfig
from blobstreamx_tpu.prover import stark

P = gold.P


class FibAir(Air):
    """cols = (a, b); transition: a' = b, b' = a + b; first row pinned to
    publics[0:2]; last row's b pinned to publics[2]."""

    n_cols = 2
    max_degree = 2

    def eval_constraints(self, local, nxt, publics, alg):
        a, b = local
        an, bn = nxt
        c0, c1, c_last = publics
        return [
            (alg.sub(an, b), "transition"),
            (alg.sub(bn, alg.add(a, b)), "transition"),
            (alg.sub(a, c0), "first"),
            (alg.sub(b, c1), "first"),
            (alg.sub(b, c_last), "last"),
            # a degree-2 'all' constraint: (a+b)^2 - c2 where c2 := (a+b)^2
            # column — keep it trivial: b*0 == 0 exercises the 'all' divisor
            (alg.mul(b, alg.const(0)), "all"),
        ]


def fib_trace(n: int):
    trace = np.zeros((n, 2), dtype=np.uint64)
    a, b = 1, 1
    for i in range(n):
        trace[i] = (a, b)
        a, b = b, (a + b) % P
    publics = [1, 1, int(trace[-1, 1])]
    return trace, publics


CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=12, proof_of_work_bits=6, final_poly_len=8)


@pytest.fixture(scope="module")
def proven():
    n = 64
    trace, publics = fib_trace(n)
    proof = stark.prove(FibAir(), trace, publics, CFG)
    return n, trace, publics, proof


class TestStark:
    def test_roundtrip(self, proven):
        n, _, publics, proof = proven
        assert stark.verify(FibAir(), proof, publics, CFG, n)

    def test_wrong_public_rejected(self, proven):
        n, _, publics, proof = proven
        bad = [publics[0], publics[1], (publics[2] + 1) % P]
        assert not stark.verify(FibAir(), proof, bad, CFG, n)

    def test_tampered_opening_rejected(self, proven):
        n, _, publics, proof = proven
        bad = dataclasses.replace(
            proof, trace_zeta=[((v0 + 1) % P, v1) for v0, v1 in proof.trace_zeta]
        )
        assert not stark.verify(FibAir(), bad, publics, CFG, n)

    def test_tampered_query_row_rejected(self, proven):
        n, _, publics, proof = proven
        import copy

        bad = copy.deepcopy(proof)
        bad.openings[0].trace[0].row[0] = (bad.openings[0].trace[0].row[0] + 1) % P
        assert not stark.verify(FibAir(), bad, publics, CFG, n)

    def test_invalid_trace_rejected(self):
        # same n as the fixture so the compiled phase programs are reused
        n = 64
        trace, publics = fib_trace(n)
        trace[7, 1] = (trace[7, 1] + 1) % P  # break the recurrence mid-trace
        proof = stark.prove(FibAir(), trace, publics, CFG)
        assert not stark.verify(FibAir(), proof, publics, CFG, n)
