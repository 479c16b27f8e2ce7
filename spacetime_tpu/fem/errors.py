"""Space-time error norms (host-side analysis, shared by oracle and TPU paths)."""

from __future__ import annotations

import numpy as np

from .assembly import _quad_rule, _tet_geometry, _tri_geometry
from .mesh import Mesh
from .timegrid import TimeGrid


def l2_error_spacetime(problem, mesh: Mesh, grid: TimeGrid, U: np.ndarray) -> float:
    """L2(I×Ω) error of the discrete solution vs ``problem.exact``.

    ``U`` holds interior-vertex coefficients, shape (N_t+1, m). Quadrature:
    2-point Gauss per time interval × degree-2 rule per element.
    """
    bary, w = _quad_rule(mesh.dim)
    measure = _tri_geometry(mesh)[0] if mesh.dim == 2 else _tet_geometry(mesh)[0]
    v = mesh.vertices[mesh.elements]
    pts = np.einsum("qi,eid->eqd", bary, v)
    flat = pts.reshape(-1, mesh.dim)

    N = grid.num_intervals
    Ufull = np.zeros((N + 1, mesh.num_vertices))
    Ufull[:, mesh.interior] = U
    nodal = Ufull[:, mesh.elements]  # (N+1, ne, nloc)
    uq = np.einsum("tei,qi->teq", nodal, bary)

    t = grid.t
    h = grid.h
    gq = 0.5 / np.sqrt(3.0)
    total = 0.0
    for j in range(N):
        mid = 0.5 * (t[j] + t[j + 1])
        for tq in (mid - gq * h[j], mid + gq * h[j]):
            lam = (tq - t[j]) / h[j]
            uh = (1 - lam) * uq[j] + lam * uq[j + 1]
            ue = problem.exact_np(tq, flat).reshape(uh.shape)
            total += 0.5 * h[j] * np.einsum("eq,q,e->", (uh - ue) ** 2, w, measure)
    return float(np.sqrt(total))
