"""Checkpoint/resume of solver state (SURVEY.md §5).

The reference has no checkpointing (solves are minutes); long 10^8-DoF runs
here can save either the current iterate (resume = warm-started PCG restart:
fresh residual and search directions, same converged answer) or the FULL
PCG state (u, r, p, rz, histories, iteration — SURVEY.md §5's serialization
list), whose resume continues the exact Krylov sequence. Plain ``np.savez``
— the state is a handful of arrays plus metadata, orbax would be ceremony.
"""

from __future__ import annotations

import numpy as np

_STATE_KEYS = ("U", "R", "P", "rz", "res", "pres", "it", "done", "fnorm")


def save_solution(path: str, U: np.ndarray, meta: dict | None = None) -> None:
    """Save a space-time iterate (plus optional metadata) to ``path``.npz."""
    np.savez_compressed(path, U=np.asarray(U), **(meta or {}))


def save_pcg_state(path: str, state, meta: dict | None = None) -> None:
    """Save a full solver.pcg.PCGState (device or host arrays) to
    ``path``.npz — the exact-resume checkpoint. U/R/P are stored in
    whatever iterate layout the caller passes (HeatSolver saves flat
    (N_t+1, m))."""
    arrays = {k: np.asarray(getattr(state, k)) for k in _STATE_KEYS}
    np.savez_compressed(path, **arrays, **(meta or {}))


def load_pcg_state(path: str) -> tuple[dict, dict]:
    """Load a full-state checkpoint; returns ({state arrays}, metadata).
    Raises KeyError if ``path`` holds an iterate-only checkpoint."""
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        missing = [k for k in _STATE_KEYS if k not in z.files]
        if missing:
            raise KeyError(f"not a full PCG-state checkpoint (missing {missing})")
        state = {k: z[k] for k in _STATE_KEYS}
        meta = {k: z[k] for k in z.files if k not in _STATE_KEYS}
    return state, meta


def has_pcg_state(path: str) -> bool:
    """True when ``path`` is a full-state checkpoint (vs iterate-only)."""
    import os

    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    with np.load(path) as z:
        return all(k in z.files for k in _STATE_KEYS)


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
