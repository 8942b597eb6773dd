"""Phase-granular checkpoint/resume (SURVEY.md §5.4: "after wire-commit /
Z-commit / quotient / each FRI layer, the Merkle caps + challenger state are
tiny and serializable; persist ... so a killed multi-host run resumes at the
last phase").

Format: one .npz per phase under <dir>/<run_id>/, holding named uint64/uint32
arrays plus a JSON sidecar for scalars. Integers only — bit-exactness is the
invariant (SURVEY.md §5.2), so there is nothing lossy to round-trip.
"""

from __future__ import annotations

import json
import os

import numpy as np


class PhaseCheckpointer:
    def __init__(self, root: str | None, run_id: str):
        self.dir = os.path.join(root, run_id) if root else None
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    def _paths(self, phase: str):
        return os.path.join(self.dir, f"{phase}.npz"), os.path.join(self.dir, f"{phase}.json")

    def save(self, phase: str, arrays: dict[str, np.ndarray] | None = None, scalars: dict | None = None):
        if not self.dir:
            return
        npz, js = self._paths(phase)
        tmp = npz + ".tmp"
        with open(tmp, "wb") as f:  # file handle: savez won't append .npz
            np.savez(f, **{k: np.asarray(v) for k, v in (arrays or {}).items()})
        os.replace(tmp, npz)
        with open(js, "w") as f:
            json.dump(scalars or {}, f)

    def load(self, phase: str):
        """Returns (arrays, scalars) or None if the phase was not saved."""
        if not self.dir:
            return None
        npz, js = self._paths(phase)
        if not (os.path.exists(npz) and os.path.exists(js)):
            return None
        with np.load(npz) as data:
            arrays = {k: data[k] for k in data.files}
        with open(js) as f:
            scalars = json.load(f)
        return arrays, scalars

    def last_phase(self, order: list[str]) -> str | None:
        done = None
        for p in order:
            if self.dir and os.path.exists(self._paths(p)[0]):
                done = p
            else:
                break
        return done
