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

    def eval_constraints(self, local, nxt, publics, alg, **frame):
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


class TestStark:
    def test_roundtrip_and_tampers(self):
        """One 1-device subprocess (tests/subproc.py): prove once, run every
        accept/reject probe against that proof. Under the suite's 8-device
        config the FibAir phase compiles cost ~230 s (XLA:CPU splits its
        thread pools, VERDICT r3 weak #8); one device + the persistent
        compile cache makes this the smoke tier's shape."""
        from subproc import run_py

        run_py(
            """
import sys; sys.path.insert(0, "tests")
import copy, dataclasses
from test_stark import FibAir, GroupedFibAir, fib_trace, CFG, P
from blobstreamx_tpu.prover import serialize, stark

n = 64
trace, publics = fib_trace(n)
proof = stark.prove(FibAir(), trace, publics, CFG)
assert stark.verify(FibAir(), proof, publics, CFG, n)

bad_pub = [publics[0], publics[1], (publics[2] + 1) % P]
assert not stark.verify(FibAir(), proof, bad_pub, CFG, n)

bad = dataclasses.replace(
    proof, trace_zeta=[((v0 + 1) % P, v1) for v0, v1 in proof.trace_zeta]
)
assert not stark.verify(FibAir(), bad, publics, CFG, n)

bad2 = copy.deepcopy(proof)
bad2.openings[0].trace[0].row[0] = (bad2.openings[0].trace[0].row[0] + 1) % P
assert not stark.verify(FibAir(), bad2, publics, CFG, n)

trace[7, 1] = (trace[7, 1] + 1) % P  # break the recurrence mid-trace
proof_bad = stark.prove(FibAir(), trace, publics, CFG)
assert not stark.verify(FibAir(), proof_bad, publics, CFG, n)

# chunked-quotient path: byte-identical proof from the grouped prover
trace, publics = fib_trace(n)
mono = stark.prove(FibAir(), trace, publics, CFG)
grouped = stark.prove(GroupedFibAir(), trace, publics, CFG)
assert serialize.stark_proof_to_bytes(grouped) == serialize.stark_proof_to_bytes(mono)
assert stark.verify(GroupedFibAir(), grouped, publics, CFG, n)
print("stark roundtrips ok")
"""
        )


class GroupedFibAir(FibAir):
    """FibAir with its 6 constraints split across 3 compile groups —
    exercises the chunked-quotient path (per-group programs, global alpha
    offsets, shared shifted-LDE prelude) at a size that compiles fast."""

    n_constraint_groups = 3

    def eval_constraint_group(self, g, local, nxt, publics, alg, **frame):
        cons = self.eval_constraints(local, nxt, publics, alg, **frame)
        return cons[2 * g : 2 * g + 2]


class BusAir(Air):
    """Stage-2 exercise: a Horner bus accumulator over a witness column.

    aux = the claimed list of all n column values. Transcript: observe aux,
    sample r, derive C = Horner fold of aux with r. Stage-2 column acc is
    committed after r is known; constraints pin acc to the Horner recurrence
    and its last value to C, binding the committed column to the claim."""

    n_cols = 1
    n_stage2 = 1
    n_challenges = 2
    max_degree = 2

    def eval_constraints(self, local, nxt, publics, alg, fixed=None, fixed_next=None,
                         challenges=None, stage2=None, stage2_next=None):
        (v,) = local
        (vn,) = nxt
        (acc,) = stage2
        (accn,) = stage2_next
        r, c_final = challenges
        return [
            (alg.sub(acc, v), "first"),
            (alg.sub(accn, alg.add(alg.mul(acc, r), vn)), "transition"),
            (alg.sub(acc, c_final), "last"),
        ]

    def observe_aux(self, challenger, aux):
        challenger.observe_many([x % P for x in aux])

    def sample_challenges(self, challenger, aux):
        r = challenger.sample()
        c = 0
        for x in aux:
            c = (c * r + x) % P
        return [r, c]

    def build_stage2(self, trace, challenges, aux):
        r = challenges[0]
        acc = np.zeros((trace.shape[0], 1), dtype=np.uint64)
        cur = 0
        for i, x in enumerate(trace[:, 0]):
            cur = (cur * r + int(x)) % P
            acc[i, 0] = cur
        return acc


CFG2 = StarkConfig(
    rate_bits=2, cap_height=1, num_query_rounds=12, proof_of_work_bits=6, final_poly_len=8
)


class TestStage2:
    def test_roundtrip_and_tampers(self):
        """Stage-2 (post-challenge commitment) probes in one 1-device
        subprocess — one BusAir compile for all three probes."""
        from subproc import run_py

        run_py(
            """
import sys; sys.path.insert(0, "tests")
import dataclasses
import numpy as np
from test_stark import BusAir, CFG2, P
from blobstreamx_tpu.prover import stark

rng = np.random.default_rng(3)
values = rng.integers(0, P, size=32, dtype=np.uint64)
trace = np.array(values, dtype=np.uint64).reshape(32, 1)
aux = [int(v) for v in values]
proof = stark.prove(BusAir(), trace, [], CFG2, aux=aux)
assert proof.stage2_cap and len(proof.stage2_zeta) == 1
assert stark.verify(BusAir(), proof, [], CFG2, 32, aux=aux)

bad_aux = list(aux)
bad_aux[5] = (bad_aux[5] + 1) % P
assert not stark.verify(BusAir(), proof, [], CFG2, 32, aux=bad_aux)

bad = dataclasses.replace(
    proof, stage2_zeta=[((v0 + 1) % P, v1) for v0, v1 in proof.stage2_zeta]
)
assert not stark.verify(BusAir(), bad, [], CFG2, 32, aux=aux)
print("stage2 roundtrips ok")
"""
        )
