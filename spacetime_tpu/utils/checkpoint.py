"""Checkpoint/resume of solver state (SURVEY.md §5).

The reference has no checkpointing (solves are minutes); long 10^8-DoF runs
here can save the current iterate and resume with a warm-started PCG
(restart semantics: fresh residual and search directions, same converged
answer). Plain
``np.savez`` — the state is one array plus metadata, orbax would be ceremony.
"""

from __future__ import annotations

import numpy as np


def save_solution(path: str, U: np.ndarray, meta: dict | None = None) -> None:
    """Save a space-time iterate (plus optional metadata) to ``path``.npz."""
    np.savez_compressed(path, U=np.asarray(U), **(meta or {}))


def load_solution(path: str) -> tuple[np.ndarray, dict]:
    """Load an iterate saved by ``save_solution``; returns (U, metadata).

    Accepts the same path that was passed to ``save_solution`` —
    ``np.savez`` appends ``.npz``, so the extension is added here too when
    the bare path does not exist."""
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        U = z["U"]
        meta = {k: z[k] for k in z.files if k != "U"}
    return U, meta
