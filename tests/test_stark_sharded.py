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


import pytest


@pytest.mark.slow
class TestShardedShaAir:
    def test_sha_air_sharded_bit_exact(self):
        """Mesh prove at SHA-AIR scale (1300 columns, stage-2 digest bus,
        fixed columns) — where GSPMD partitioning decisions are actually
        stressed — must be bit-exact vs the single-device proof. Runs in a
        2-virtual-CPU-device subprocess (the 8-device config makes XLA:CPU
        compiles of the big quotient pathological; see tests/subproc.py)."""
        import os
        import subprocess
        import sys

        code = """
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

from blobstreamx_tpu.parallel.mesh import make_mesh
from blobstreamx_tpu.prover import sha_air, stark, serialize
from blobstreamx_tpu.prover.config import StarkConfig

CFG = StarkConfig(rate_bits=2, cap_height=1, num_query_rounds=8,
                  proof_of_work_bits=2, final_poly_len=4)
msgs = [b"abc", b"x" * 80]  # 1 + 2 blocks -> padded chain of 4 -> 256 rows
chain, blocks = sha_air.plan_blocks(msgs)
trace, aux = sha_air.build_sha_trace(chain, blocks)
air = sha_air.Sha256Air(chain)
single = stark.prove(air, trace, [], CFG, aux=aux)
mesh = make_mesh(2)
sharded = stark.prove(air, trace, [], CFG, aux=aux, mesh=mesh)
sb = serialize.stark_proof_to_bytes(sharded)
assert sb == serialize.stark_proof_to_bytes(single), "sharded proof differs"
assert stark.verify(air, sharded, [], CFG, trace.shape[0], aux=aux)
print("sha-air sharded bit-exact ok")
"""
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        # no persistent compile cache: multi-device cached executables have
        # segfaulted jax 0.9's deserializer on this image (see conftest)
        env.pop("JAX_COMPILATION_CACHE_DIR", None)
        env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            capture_output=True,
            text=True,
            timeout=5400,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert proc.returncode == 0, (
            f"--- stdout ---\n{proc.stdout[-3000:]}\n--- stderr ---\n{proc.stderr[-3000:]}"
        )
