"""Device mesh helpers (SURVEY.md §2.3, §5.8).

One 1-D mesh axis ("x") covers the library's parallelism needs:
- data-parallel work items (headers, hashes, signatures, polynomial columns),
- the six-step NTT's all_to_all transpose,
- psum bucket reductions for the MSM,
- all_gather of Merkle subtree roots.

The same code runs on the 8-device CPU simulation (tests), 1 real chip, and a
multi-host pod slice (after jax.distributed.initialize)."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def col_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the last (lane/column) axis of a 2-D array."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
