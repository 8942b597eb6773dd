"""jax.profiler integration (SURVEY.md §5.1: "jax.profiler traces
(TensorBoard/Perfetto), plus a lightweight phase-timer" — the phase timer is
utils.timing.TimingTree; this module is the trace half).

Usage:
    with maybe_trace("/tmp/trace"):     # no-op when dir is None/empty
        proof = skip.prove(w)

The trace directory can be opened with TensorBoard's profile plugin or
converted to Perfetto. Device-side annotations come for free from XLA;
host phases show up via TraceAnnotation scopes that TimingTree users can
nest with annotate().
"""

from __future__ import annotations

from contextlib import contextmanager, nullcontext


@contextmanager
def _trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def maybe_trace(log_dir: str | None):
    """Context manager: a jax.profiler trace when log_dir is set, else no-op."""
    return _trace(log_dir) if log_dir else nullcontext()


def annotate(name: str):
    """Named host-side region, visible on the profiler timeline."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:  # profiling unavailable: stay a no-op
        return nullcontext()


def device_memory_stats() -> dict:
    """Per-device memory stats (bytes_in_use / peak) where the backend
    exposes them; {} on backends without memory_stats (e.g. CPU)."""
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
