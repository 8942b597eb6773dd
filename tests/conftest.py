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
# Persistent compile cache: the suite re-jits many identical programs.
# Key the directory by the host's CPU feature set — XLA:CPU stores AOT
# machine code, and entries compiled on a different machine are rejected
# with per-load errors (observed when the workspace migrates between hosts),
# re-paying every compile while spamming the log.
try:
    with open("/proc/cpuinfo") as f:
        _flags = next((l for l in f if l.startswith("flags")), "")
    _fp = hashlib.sha1(_flags.encode()).hexdigest()[:10]
except OSError:
    _fp = "nofp"
jax.config.update("jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{_fp}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
