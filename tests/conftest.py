"""Test configuration: run everything on the CPU backend with 8 virtual
devices so multi-chip shard_map programs are testable without a pod
(SURVEY.md §4.3 item 4). Must run before JAX is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
