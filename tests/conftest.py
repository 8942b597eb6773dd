"""Test configuration: run everything on the CPU backend with 8 virtual
devices so multi-chip shard_map programs are testable without a pod
(SURVEY.md §4.3 item 4).

NB: the image's sitecustomize imports jax at interpreter start and registers
the tunneled TPU ('axon') platform, so setting JAX_PLATFORMS via os.environ
here is too late — jax captured the env at import. jax.config.update still
works because backends are not initialized until first use. Running tests on
the tunneled TPU would pay remote-compile + tunnel latency on every call
(observed: 30-130 s for a single device->host transfer).
"""

import os

# For any subprocesses the tests spawn:
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import hashlib

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# NO persistent compile cache for the multi-device suite: reading back
# certain cached multi-device executables (e.g. the sharded-MSM shard_map
# program) SEGFAULTS jax 0.9's cache deserializer on this image — reproduced
# twice on a freshly written cache, crash in
# compilation_cache.get_executable_and_time. Single-device subprocesses
# (tests/subproc.py) keep their own cache dir, which has been reliable.
jax.config.update("jax_enable_compilation_cache", False)
_ = hashlib  # (fingerprint helper retained for subproc.py's convention)
