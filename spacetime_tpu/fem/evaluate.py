"""Point evaluation of computed space-time solutions.

The reference inherited point evaluation from NGSolve's GridFunction
machinery (SURVEY.md §2, L0); here it is a small host-side utility: locate
each query point's containing simplex (KD-tree on element centroids with
barycentric verification — exact, no tolerance-snapping to grid lines),
interpolate P1 in space and linearly (the trial hat functions) in time.
Diagnostics-grade: runs on the host from the returned coefficient array,
complementing the VTK export (utils/vtk.py) for full-field output.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh


def _barycentric(mesh: Mesh, elems: np.ndarray, X: np.ndarray) -> np.ndarray:
    """Barycentric coordinates of points X (n, d) in simplices ``elems``
    (n,) — vectorized batched solve; returns (n, d+1)."""
    verts = mesh.vertices[mesh.elements[elems]]  # (n, d+1, d)
    E = verts[:, 1:] - verts[:, :1]  # rows: edge vectors
    rhs = (X - verts[:, 0])[..., None]  # (n, d, 1)
    lam = np.linalg.solve(np.transpose(E, (0, 2, 1)), rhs)[..., 0]  # (n, d)
    return np.concatenate([1.0 - lam.sum(axis=1, keepdims=True), lam], axis=1)


def locate_points(
    mesh: Mesh, X: np.ndarray, tol: float = 1e-10
) -> tuple[np.ndarray, np.ndarray]:
    """Containing element and barycentric coordinates for each point.

    ``X``: (nq, dim). Returns (elem_ids (nq,), bary (nq, dim+1)). KD-tree
    nearest-centroid candidates with barycentric acceptance, widening the
    candidate set geometrically; raises for points in no element (outside
    the domain — including inside the notch of the L-shape)."""
    from scipy.spatial import cKDTree

    X = np.ascontiguousarray(np.atleast_2d(X), np.float64)
    if X.shape[1] != mesh.dim:
        raise ValueError(f"points are {X.shape[1]}D, mesh is {mesh.dim}D")
    cents = mesh.vertices[mesh.elements].mean(axis=1)
    tree = cKDTree(cents)
    nq = X.shape[0]
    ne = cents.shape[0]
    elem = np.full(nq, -1, np.int64)
    bary = np.zeros((nq, mesh.dim + 1))
    remaining = np.arange(nq)
    k = min(8, ne)
    while remaining.size:
        _, cand = tree.query(X[remaining], k=k)
        cand = cand.reshape(remaining.size, -1)
        found = np.zeros(remaining.size, bool)
        for c in range(cand.shape[1]):
            todo = ~found
            if not todo.any():
                break
            e = cand[todo, c]
            lam = _barycentric(mesh, e, X[remaining[todo]])
            ok = lam.min(axis=1) >= -tol
            idx = remaining[todo][ok]
            elem[idx] = e[ok]
            bary[idx] = np.clip(lam[ok], 0.0, None)
            found[np.flatnonzero(todo)[ok]] = True
        remaining = remaining[~found]
        if k >= ne:
            break
        k = min(4 * k, ne)
    if remaining.size:
        raise ValueError(
            f"{remaining.size} point(s) lie outside the mesh, e.g. "
            f"{X[remaining[:3]].tolist()}"
        )
    return elem, bary


def evaluate_solution(
    mesh: Mesh, grid, U: np.ndarray, times, points
) -> np.ndarray:
    """Evaluate the space-time solution at arbitrary (t, x).

    ``U``: (N_t+1, m) interior coefficient array (SolveResult.U);
    ``times``: scalar or (nt,) in [0, T]; ``points``: (dim,) or (nq, dim).
    Returns values shaped (nt, nq), squeezed over scalar inputs. Piecewise
    linear in time (the trial hats), P1 in space, zero on the Dirichlet
    boundary by construction."""
    U = np.asarray(U, np.float64)
    N = grid.num_intervals
    m = mesh.num_interior
    if U.shape != (N + 1, m):
        raise ValueError(f"U has shape {U.shape}, expected {(N + 1, m)}")
    t = np.atleast_1d(np.asarray(times, np.float64))
    scalar_t = np.ndim(times) == 0
    X = np.atleast_2d(np.asarray(points, np.float64))
    scalar_x = np.ndim(points) == 1
    eps = 1e-12 * max(grid.t[-1], 1.0)
    if t.min() < grid.t[0] - eps or t.max() > grid.t[-1] + eps:
        raise ValueError(
            f"times must lie in [{grid.t[0]}, {grid.t[-1]}]"
        )

    elem, bary = locate_points(mesh, X)
    conn = mesh.elements[elem]  # (nq, d+1)
    inv = np.full(mesh.num_vertices, -1, np.int64)
    inv[mesh.interior] = np.arange(m)
    cid = inv[conn]
    w = np.where(cid >= 0, bary, 0.0)  # Dirichlet vertices contribute zero
    cid = np.where(cid >= 0, cid, 0)

    j = np.clip(np.searchsorted(grid.t, t, side="right") - 1, 0, N - 1)
    theta = (t - grid.t[j]) / (grid.t[j + 1] - grid.t[j])
    rows = (1.0 - theta)[:, None] * U[j] + theta[:, None] * U[j + 1]  # (nt, m)
    vals = np.einsum("tqa,qa->tq", rows[:, cid], w)
    if scalar_t:
        vals = vals[0]
    if scalar_x:
        vals = vals[..., 0]
    return vals
