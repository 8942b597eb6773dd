"""Multi-host bring-up (SURVEY.md §5.8: "jax.distributed for multi-host
bring-up; all data movement via XLA collectives compiled onto ICI
intra-slice and DCN across hosts").

The upstream stack has NO comm backend — single-process rayon, with
multi-machine work delegated to an out-of-band job queue (SURVEY.md §5.8
[R]). The TPU-native replacement is jax.distributed.initialize(): after it,
jax.devices() spans every host's chips and the SAME mesh/shard_map programs
used single-host run across the slice — no code changes above this module.

Launch recipe (one process per host; see docs/parallelism.md):

    # host 0 (the coordinator):
    python -m blobstreamx_tpu --coordinator 10.0.0.1:9955 --num-processes 2 \
        --process-id 0 prove-skip ...
    # host 1:
    python -m blobstreamx_tpu --coordinator 10.0.0.1:9955 --num-processes 2 \
        --process-id 1 prove-skip ...

Environment-variable alternative (BSX_COORDINATOR / BSX_NUM_PROCESSES /
BSX_PROCESS_ID) for launchers that cannot edit argv. The CPU backend
supports the same flow over loopback, which is how the two-process test
validates this path without a pod (tests/test_distributed.py).
"""

from __future__ import annotations

import os


def add_distributed_args(parser) -> None:
    parser.add_argument(
        "--coordinator",
        default=os.environ.get("BSX_COORDINATOR"),
        help="coordinator address host:port (enables jax.distributed)",
    )
    parser.add_argument(
        "--num-processes",
        type=int,
        default=int(os.environ.get("BSX_NUM_PROCESSES", "0")) or None,
        help="total number of processes in the job",
    )
    parser.add_argument(
        "--process-id",
        type=int,
        default=int(os.environ.get("BSX_PROCESS_ID", "-1")),
        help="this process's rank in [0, num_processes)",
    )


def maybe_initialize(args=None, *, coordinator=None, num_processes=None, process_id=None):
    """Call jax.distributed.initialize() when a coordinator is configured.

    Returns True if distributed mode was initialized. Must run BEFORE any
    backend use (jax backends are lazy; the image's sitecustomize only
    registers platforms, it does not initialize them)."""
    if args is not None:
        coordinator = coordinator or getattr(args, "coordinator", None)
        num_processes = num_processes or getattr(args, "num_processes", None)
        if process_id is None:
            pid = getattr(args, "process_id", -1)
            process_id = None if pid is None or pid < 0 else pid
    if not coordinator:
        return False
    assert num_processes and process_id is not None, (
        "--coordinator requires --num-processes and --process-id"
    )
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    return True


def global_mesh(axis_name: str = "x"):
    """1-D mesh over every device of every process (call after
    maybe_initialize on all hosts)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (axis_name,))
