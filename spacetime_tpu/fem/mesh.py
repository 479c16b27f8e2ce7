"""Structured simplicial meshes of the unit square / unit cube.

The reference delegated meshing to NGSolve (SURVEY.md §2, L0); here meshes are
generated directly as structured triangulations — uniform refinement is just
regeneration at twice the resolution, and the structured node ordering is what
lets the spatial operators be stored as a handful of diagonals (DIA format)
for the TPU SpMV path.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Mesh:
    """A simplicial mesh with Dirichlet boundary bookkeeping.

    Attributes:
      vertices: (nv, d) float64 vertex coordinates.
      elements: (ne, d+1) int32 vertex indices per simplex.
      boundary: (nv,) bool mask of Dirichlet-boundary vertices.
      interior: (m,) int32 indices of interior (free) vertices.
      grid_shape: per-axis interior node counts for structured meshes
        (used to derive DIA diagonal offsets), or None for unstructured.
    """

    vertices: np.ndarray
    elements: np.ndarray
    boundary: np.ndarray
    interior: np.ndarray
    grid_shape: tuple[int, ...] | None = None

    @property
    def dim(self) -> int:
        return self.vertices.shape[1]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @property
    def num_interior(self) -> int:
        return self.interior.shape[0]


def unit_square_mesh(n: int) -> Mesh:
    """Structured triangulation of (0,1)^2 with n×n cells, SW–NE diagonals.

    Vertices are ordered lexicographically (y-major, x-fastest); interior
    vertices form an (n-1)×(n-1) grid, so the P1 stiffness/mass matrices have
    nonzeros only on diagonals {0, ±1, ±(n-1), ±n} of the interior block.
    """
    if n < 2:
        raise ValueError("need n >= 2 for a nonempty interior")
    xs = np.linspace(0.0, 1.0, n + 1)
    X, Y = np.meshgrid(xs, xs, indexing="xy")  # X[iy, ix]
    vertices = np.stack([X.ravel(), Y.ravel()], axis=1)

    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing="xy")
    v00 = (iy * (n + 1) + ix).ravel()
    v10 = v00 + 1
    v01 = v00 + (n + 1)
    v11 = v01 + 1
    # Split every cell along the SW–NE diagonal (v00–v11).
    tris = np.concatenate(
        [
            np.stack([v00, v10, v11], axis=1),
            np.stack([v00, v11, v01], axis=1),
        ],
        axis=0,
    ).astype(np.int32)

    on_bdry = (
        np.isclose(vertices[:, 0], 0.0)
        | np.isclose(vertices[:, 0], 1.0)
        | np.isclose(vertices[:, 1], 0.0)
        | np.isclose(vertices[:, 1], 1.0)
    )
    interior = np.flatnonzero(~on_bdry).astype(np.int32)
    return Mesh(vertices, tris, on_bdry, interior, grid_shape=(n - 1, n - 1))


_KUHN_PERMS = [
    (0, 1, 2),
    (0, 2, 1),
    (1, 0, 2),
    (1, 2, 0),
    (2, 0, 1),
    (2, 1, 0),
]


def unit_cube_mesh(n: int) -> Mesh:
    """Kuhn triangulation of (0,1)^3: each of the n^3 cells splits into 6 tets.

    Every tet walks from the cell's origin corner to the opposite corner along
    one of the 6 axis orderings, giving a conforming simplicial mesh whose
    interior P1 operators live on ≤15 diagonals.
    """
    if n < 2:
        raise ValueError("need n >= 2 for a nonempty interior")
    xs = np.linspace(0.0, 1.0, n + 1)
    Z, Y, X = np.meshgrid(xs, xs, xs, indexing="ij")
    vertices = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):  # x-index i, y-index j, z-index k
        return (k * (n + 1) + j) * (n + 1) + i

    i, j, k = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    i, j, k = i.ravel(), j.ravel(), k.ravel()
    strides = np.array([1, n + 1, (n + 1) ** 2], dtype=np.int64)
    base = vid(i, j, k)
    tets = []
    for perm in _KUHN_PERMS:
        p0 = base
        p1 = p0 + strides[perm[0]]
        p2 = p1 + strides[perm[1]]
        p3 = p2 + strides[perm[2]]
        tets.append(np.stack([p0, p1, p2, p3], axis=1))
    tets = np.concatenate(tets, axis=0).astype(np.int32)

    on_bdry = np.zeros(vertices.shape[0], dtype=bool)
    for d in range(3):
        on_bdry |= np.isclose(vertices[:, d], 0.0) | np.isclose(vertices[:, d], 1.0)
    interior = np.flatnonzero(~on_bdry).astype(np.int32)
    return Mesh(vertices, tets, on_bdry, interior, grid_shape=(n - 1, n - 1, n - 1))
