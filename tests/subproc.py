"""Run compile-heavy prover roundtrips in a SINGLE-device CPU subprocess.

The suite's conftest configures 8 virtual CPU devices for collective tests,
which splits XLA:CPU's compile/execute thread pools and makes the big STARK
quotient compiles ~10x slower (measured: the 1300-column SHA AIR quotient
compiles in ~160 s on one device, >30 min under the 8-device config). Tests
that only need one device therefore shell out with a scrubbed environment;
the persistent compile cache (machine-fingerprinted, shared with conftest's
convention) makes repeat runs fast.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys


def _fingerprint() -> str:
    """Cache-dir fingerprint. Must change whenever cached AOT code could be
    invalid for this host: /proc/cpuinfo flags alone proved insufficient
    (round-2 observation: a cache written by a different machine with
    identical flags carried XLA target features like +prefer-no-gather that
    this host lacks — loads logged SIGILL warnings and hung). Include the
    hostname and jaxlib version."""
    import socket

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.readlines()
        # flags ALONE are insufficient twice over (round 2: cross-machine
        # poisoning; round 4: a cache written earlier on this VM loaded with
        # "Target machine feature +prefer-no-gather..." SIGILL warnings after
        # the underlying physical host changed) — pin the microarchitecture
        keys = ("flags", "model name", "model\t", "stepping", "microcode")
        flags = "|".join(
            l.strip() for l in lines if l.startswith(keys)
        )[:4000] or "nofp"
    except OSError:
        flags = "nofp"
    try:
        import jaxlib

        ver = jaxlib.__version__
    except Exception:
        ver = "nojaxlib"
    key = f"{flags}|{socket.gethostname()}|{ver}"
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def run_py(code: str, timeout: int = 5400) -> None:
    """Execute `code` with python in a 1-device CPU JAX environment; raises
    on nonzero exit with the captured output."""
    env = dict(os.environ)
    # Drop the axon-tunnel trigger: this image's sitecustomize registers the
    # tunneled TPU platform at interpreter start when PALLAS_AXON_POOL_IPS is
    # set, and a dead/unresponsive tunnel then hangs `import jax` in every
    # subprocess (observed: indefinite futex wait before main() runs). CPU
    # subprocesses never want the tunnel.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split() if "xla_force_host_platform_device_count" not in f
    )
    env["JAX_COMPILATION_CACHE_DIR"] = f"/root/.cache/jax_test_cache_{_fingerprint()}_1dev"
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.3"
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"subprocess failed (exit {proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}"
        )
