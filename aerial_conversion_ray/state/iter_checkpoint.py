"""Per-iteration checkpoints for long iterative jobs.

A 100 TB k-means / PageRank / LPA run is hours of power iterations;
losing the driver at iteration 40 of 50 must not restart from zero.
The iterative-state analog of ``state/lineage``: the (tiny) iteration
state commits atomically after every round, keyed by a job
fingerprint, and a restart resumes from the latest committed round —
exactly-once per ITERATION instead of per partition.

The state is the small side by construction (centroid matrices, rank
vectors — the broadcastable object each round already ships), so the
checkpoint is one JSON per round; the corpus is never re-written.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np


class IterCheckpoint:
    """Atomic per-iteration state store under ``ckpt_dir``.

    ``fingerprint`` names the job (inputs + hyperparameters); rounds
    committed by a DIFFERENT fingerprint are ignored on resume, so a
    changed input restarts cleanly instead of resuming into garbage.
    """

    def __init__(self, ckpt_dir: str, fingerprint: str):
        self.dir = ckpt_dir
        self.fp = fingerprint
        os.makedirs(ckpt_dir, exist_ok=True)

    def _path(self, i: int) -> str:
        return os.path.join(self.dir, f"iter={i:06d}.json")

    def latest(self) -> tuple[int, np.ndarray] | None:
        """(iteration, state) of the newest committed round with a
        matching fingerprint, or None."""
        best = None
        for name in sorted(os.listdir(self.dir)):
            if not (name.startswith("iter=") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue  # torn write never committed (non-atomic FS)
            if rec.get("fingerprint") != self.fp:
                continue
            if best is None or rec["iter"] > best["iter"]:
                best = rec
        if best is None:
            return None
        return int(best["iter"]), np.array(best["state"], dtype=np.float64)

    def commit(self, i: int, state: np.ndarray) -> None:
        rec = {
            "iter": int(i),
            "fingerprint": self.fp,
            "state": np.asarray(state, dtype=np.float64).tolist(),
        }
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, self._path(i))
