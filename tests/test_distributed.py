"""Multi-PROCESS bring-up over loopback (SURVEY.md §5.8): two OS processes,
each owning one CPU device, joined by jax.distributed.initialize(); a psum
over the global 2-device mesh must see both processes' contributions. This
validates the exact code path a pod slice uses (coordinator + collectives),
with the CPU backend standing in for TPU chips."""

import os
import socket
import subprocess
import sys

WORKER = r"""
import sys
import numpy as np

from blobstreamx_tpu.parallel import distributed

coordinator, pid = sys.argv[1], int(sys.argv[2])
assert distributed.maybe_initialize(
    coordinator=coordinator, num_processes=2, process_id=pid
)

import jax
import jax.numpy as jnp
from jax.experimental.multihost_utils import process_allgather
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()

mesh = distributed.global_mesh()
# each process contributes its rank+1; psum over the global mesh sees both
local = jnp.array([float(pid + 1)])
fn = jax.jit(
    shard_map(
        lambda x: jax.lax.psum(x, "x"),
        mesh=mesh,
        in_specs=P("x"),
        out_specs=P("x"),
    )
)
from jax.experimental import multihost_utils
garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("x"))
out = fn(garr)
got = multihost_utils.global_array_to_host_local_array(out, mesh, P("x"))
assert float(np.asarray(got)[0]) == 3.0, np.asarray(got)
print(f"proc {pid}: psum ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestTwoProcessBringup:
    def test_psum_across_processes(self, tmp_path):
        port = _free_port()
        coord = f"127.0.0.1:{port}"
        procs = []
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no tunnel in workers
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = " ".join(
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f
        )
        cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for pid in range(2):
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", WORKER, coord, str(pid)],
                    env=env,
                    cwd=cwd,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                )
            )
        outs = [p.communicate(timeout=300) for p in procs]
        for pid, (p, (out, err)) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out}\n{err}"
            assert f"proc {pid}: psum ok" in out
