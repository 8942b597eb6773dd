"""Multi-chip STARK prove (SURVEY.md §2.2 C11's TPU equivalent): the row
(domain) axis sharded over an 8-virtual-device mesh must produce the exact
same proof as the single-device path — bit-exact transcript, caps, openings
and FRI layers."""

import dataclasses

import numpy as np

from blobstreamx_tpu.parallel.mesh import make_mesh
from blobstreamx_tpu.prover import stark
from blobstreamx_tpu.prover.config import StarkConfig

from test_stark import CFG, FibAir, fib_trace


def _as_plain(proof) -> dict:
    return dataclasses.asdict(proof)


class TestShardedStark:
    def test_sharded_proof_bit_exact(self):
        n = 64
        trace, publics = fib_trace(n)
        single = stark.prove(FibAir(), trace, publics, CFG)
        mesh = make_mesh(8)
        sharded = stark.prove(FibAir(), trace, publics, CFG, mesh=mesh)
        assert _as_plain(single) == _as_plain(sharded)
        assert stark.verify(FibAir(), sharded, publics, CFG, n)
