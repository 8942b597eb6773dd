"""Structured JSONL metrics (SURVEY.md §5.5: "phase, chips, hosts,
butterflies/s, hashes/s, wall-clock, scaling efficiency ... written by rank 0;
this file is the artifact the benchmark harness and BASELINE table consume").
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    """Append-only JSONL; every record carries run id, process index, device
    count, and a monotonic timestamp. Non-rank-0 processes no-op."""

    def __init__(self, path: str | None, run_id: str = "", rank: int | None = None):
        if rank is None:
            try:
                import jax

                rank = jax.process_index()
            except Exception:
                rank = 0
        self.rank = rank
        self.run_id = run_id or f"run-{int(time.time())}-{os.getpid()}"
        self.path = path if rank == 0 and path else None

    def emit(self, event: str, **fields) -> dict:
        rec = {"event": event, "run_id": self.run_id, "t": time.time(), **fields}
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        return rec

    def emit_timing(self, tree, **fields) -> dict:
        return self.emit("timing", phases=tree.flat(), **fields)
