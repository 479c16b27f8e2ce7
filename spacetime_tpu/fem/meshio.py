"""Mesh file I/O: import/export of simplicial meshes in common formats.

The reference reached arbitrary (externally generated) meshes through
NGSolve's loaders (SURVEY.md §2, L0); this module is the equivalent entry
point for user-supplied geometry. Two dependency-free ASCII formats cover
the common mesh generators:

- **Gmsh MSH 2.2** (``.msh``): ``$Nodes``/``$Elements`` sections; element
  types 2 (3-node triangle) and 4 (4-node tetrahedron) become the simplices,
  lower-dimensional elements (boundary lines/surfaces Gmsh also emits) are
  skipped — the Dirichlet boundary is detected topologically, matching the
  framework's whole-boundary-Dirichlet convention (fem/mesh.py).
- **Triangle / TetGen** (``.node`` + ``.ele`` pairs): Shewchuk's Triangle and
  Si's TetGen output, 0- or 1-indexed.

Loaded meshes carry ``grid_shape=None`` and therefore run through the
generic spatial path (DIA / blocked-ELL SpMV, dense or Chebyshev inner
solves) — the same route as the built-in L-shape benchmark.
"""

from __future__ import annotations

import os

import numpy as np

from .mesh import Mesh, _boundary_vertex_mask


def _mesh_from_arrays(vertices: np.ndarray, elements: np.ndarray) -> Mesh:
    vertices = np.ascontiguousarray(vertices, dtype=np.float64)
    elements = np.ascontiguousarray(elements, dtype=np.int32)
    if vertices.ndim != 2 or vertices.shape[1] not in (2, 3):
        raise ValueError(f"vertices must be (nv, 2|3), got {vertices.shape}")
    d = vertices.shape[1]
    if elements.ndim != 2 or elements.shape[1] != d + 1:
        raise ValueError(
            f"elements must be (ne, {d + 1}) for {d}D vertices, "
            f"got {elements.shape}"
        )
    if elements.size == 0:
        raise ValueError("mesh has no volume elements")
    if elements.min() < 0 or elements.max() >= vertices.shape[0]:
        raise ValueError("element indices out of vertex range")
    # Duplicate elements double-count operator entries AND make exterior
    # facets look shared (count 2), so topological boundary detection would
    # silently drop the Dirichlet condition there — reject loudly.
    sorted_conn = np.sort(elements, axis=1)
    if np.unique(sorted_conn, axis=0).shape[0] != elements.shape[0]:
        raise ValueError("mesh contains duplicate elements")
    # Vertices referenced by no element (Triangle without -j keeps them;
    # Gmsh point entities) would become interior DoFs with all-zero
    # operator rows (a singular system) — compact them away, like the
    # built-in generators do.
    used = np.unique(elements)
    if used.size < vertices.shape[0]:
        remap = np.full(vertices.shape[0], -1, dtype=np.int64)
        remap[used] = np.arange(used.size)
        vertices = vertices[used]
        elements = remap[elements].astype(np.int32)
    on_bdry = _boundary_vertex_mask(vertices.shape[0], elements)
    interior = np.flatnonzero(~on_bdry).astype(np.int32)
    if interior.size == 0:
        raise ValueError("mesh has no interior (free) vertices")
    return Mesh(vertices, elements, on_bdry, interior, grid_shape=None)


# ------------------------------------------------------------------ gmsh 2.2

_GMSH_SIMPLEX = {2: 3, 4: 4}  # elm-type -> nodes per element (tri, tet)


def _load_gmsh(path: str) -> Mesh:
    # errors="replace": a binary MSH body must reach the $MeshFormat check
    # below (clear message) instead of dying in a UnicodeDecodeError here.
    with open(path, errors="replace") as f:
        lines = [ln.strip() for ln in f]
    if "$MeshFormat" in lines:
        fmt = lines[lines.index("$MeshFormat") + 1].split()
        ver = fmt[0]
        if not ver.startswith("2"):
            raise ValueError(
                f"{path}: MSH version {ver} unsupported — re-export as "
                "version 2.2 ASCII (gmsh -format msh2)"
            )
        if len(fmt) > 1 and fmt[1] != "0":
            raise ValueError(
                f"{path}: binary MSH unsupported — re-export as ASCII "
                "(gmsh -format msh2, without -bin)"
            )
    try:
        n0 = lines.index("$Nodes")
        e0 = lines.index("$Elements")
    except ValueError as exc:
        raise ValueError(f"{path}: missing $Nodes/$Elements (MSH 2.x ASCII "
                         "expected; export with gmsh -format msh2)") from exc

    nv = int(lines[n0 + 1])
    node_rows = [ln.split() for ln in lines[n0 + 2 : n0 + 2 + nv]]
    tags = np.array([int(r[0]) for r in node_rows])
    xyz = np.array([[float(v) for v in r[1:4]] for r in node_rows])
    # Gmsh node tags may be sparse; remap to dense 0-based ids.
    remap = {t: i for i, t in enumerate(tags)}

    ne = int(lines[e0 + 1])
    simplices: dict[int, list[list[int]]] = {3: [], 4: []}
    nonsimplex: set[int] = set()
    for ln in lines[e0 + 2 : e0 + 2 + ne]:
        r = ln.split()
        etype = int(r[1])
        k = _GMSH_SIMPLEX.get(etype)
        if k is None:
            # Points (15) and lines (1/8) are boundary data: skip. Volume
            # non-simplices would silently mutilate the domain — collect and
            # reject below (quads are only tolerable as tet-mesh surface
            # data, which requires prisms/hexes we reject anyway).
            if etype not in (1, 8, 15):
                nonsimplex.add(etype)
            continue
        ntags = int(r[2])
        conn = [remap[int(t)] for t in r[3 + ntags : 3 + ntags + k]]
        simplices[k].append(conn)
    if nonsimplex:
        raise ValueError(
            f"{path}: non-simplex elements (gmsh types {sorted(nonsimplex)}) "
            "— only linear triangle/tetrahedron meshes are supported"
        )
    if simplices[4]:
        # Any surface triangles alongside tets are boundary data: skip them.
        elements = np.array(simplices[4], dtype=np.int32)
        d = 3
    elif simplices[3]:
        elements = np.array(simplices[3], dtype=np.int32)
        d = 2
    else:
        raise ValueError(f"{path}: no triangles or tetrahedra found")
    vertices = xyz[:, :d]
    if d == 2 and np.abs(xyz[:, 2]).max() > 1e-12:
        raise ValueError(f"{path}: triangle mesh with non-zero z coordinates")
    return _mesh_from_arrays(vertices, elements)


def _save_gmsh(mesh: Mesh, path: str) -> None:
    d = mesh.dim
    etype = 2 if d == 2 else 4
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write(f"$Nodes\n{mesh.num_vertices}\n")
        for i, v in enumerate(mesh.vertices, start=1):
            x, y = float(v[0]), float(v[1])
            z = float(v[2]) if d == 3 else 0.0
            f.write(f"{i} {x!r} {y!r} {z!r}\n")
        f.write("$EndNodes\n")
        f.write(f"$Elements\n{mesh.elements.shape[0]}\n")
        for i, e in enumerate(mesh.elements, start=1):
            conn = " ".join(str(int(t) + 1) for t in e)
            f.write(f"{i} {etype} 2 0 0 {conn}\n")
        f.write("$EndElements\n")


# ---------------------------------------------------------- triangle / tetgen


def _triangle_base(path: str) -> str:
    """Strip a .node/.ele extension (case-insensitive) to the pair's base."""
    root, ext = os.path.splitext(path)
    if ext.lower() in (".node", ".ele"):
        return root
    raise ValueError(
        f"triangle-format path must end in .node or .ele, got {path!r}"
    )


def _load_triangle(node_path: str) -> Mesh:
    base = _triangle_base(node_path)
    ele_path = base + ".ele"
    if not os.path.exists(ele_path):
        raise FileNotFoundError(f"{ele_path} (needed alongside {node_path})")

    def rows(p):
        out = []
        with open(p) as f:
            for ln in f:
                ln = ln.split("#", 1)[0].strip()
                if ln:
                    out.append(ln.split())
        return out

    nrows = rows(node_path)
    nv, d = int(nrows[0][0]), int(nrows[0][1])
    if d not in (2, 3):
        raise ValueError(f"{node_path}: dimension {d} unsupported")
    ids = np.array([int(r[0]) for r in nrows[1 : 1 + nv]])
    verts = np.array([[float(v) for v in r[1 : 1 + d]] for r in nrows[1 : 1 + nv]])
    first = ids.min()  # Triangle/TetGen are 0- or 1-indexed; honor the file

    erows = rows(ele_path)
    ne, nper = int(erows[0][0]), int(erows[0][1])
    if nper != d + 1:
        raise ValueError(
            f"{ele_path}: {nper} nodes per element (only linear simplices "
            f"supported, expected {d + 1})"
        )
    conn = np.array(
        [[int(v) - first for v in r[1 : 1 + nper]] for r in erows[1 : 1 + ne]],
        dtype=np.int32,
    )
    order = np.argsort(ids)
    if not np.array_equal(ids[order] - first, np.arange(nv)):
        raise ValueError(f"{node_path}: non-contiguous node numbering")
    return _mesh_from_arrays(verts[order], conn)


def _save_triangle(mesh: Mesh, node_path: str) -> None:
    base = _triangle_base(node_path)
    node_path = base + ".node"
    d = mesh.dim
    with open(node_path, "w") as f:
        f.write(f"{mesh.num_vertices} {d} 0 0\n")
        for i, v in enumerate(mesh.vertices):
            coords = " ".join(repr(float(c)) for c in v)
            f.write(f"{i} {coords}\n")
    with open(base + ".ele", "w") as f:
        f.write(f"{mesh.elements.shape[0]} {d + 1} 0\n")
        for i, e in enumerate(mesh.elements):
            conn = " ".join(str(int(t)) for t in e)
            f.write(f"{i} {conn}\n")


# ------------------------------------------------------------------- dispatch


def load_mesh(path: str, fmt: str = "auto") -> Mesh:
    """Load a simplicial mesh from ``path``.

    ``fmt``: 'gmsh' (MSH 2.2 ASCII), 'triangle' (.node/.ele pair — pass the
    .node file), or 'auto' (by extension). The Dirichlet boundary is every
    topological boundary vertex (the framework's convention); the mesh runs
    through the generic (non-stencil) spatial path.
    """
    if fmt == "auto":
        ext = os.path.splitext(path)[1].lower()
        if ext == ".msh":
            fmt = "gmsh"
        elif ext in (".node", ".ele"):
            fmt = "triangle"
        else:
            raise ValueError(
                f"cannot infer mesh format from {path!r} (expected .msh or "
                ".node/.ele); pass fmt='gmsh' or 'triangle'"
            )
    if fmt == "gmsh":
        return _load_gmsh(path)
    if fmt == "triangle":
        return _load_triangle(_triangle_base(path) + ".node")
    raise ValueError(f"unknown mesh format {fmt!r}")


def save_mesh(mesh: Mesh, path: str, fmt: str = "auto") -> None:
    """Write ``mesh`` to ``path`` (formats as in :func:`load_mesh`)."""
    if fmt == "auto":
        ext = os.path.splitext(path)[1].lower()
        if ext == ".msh":
            fmt = "gmsh"
        elif ext in (".node", ".ele"):
            fmt = "triangle"
        else:
            raise ValueError(f"cannot infer mesh format from {path!r}")
    if fmt == "gmsh":
        _save_gmsh(mesh, path)
    elif fmt == "triangle":
        _save_triangle(mesh, path)
    else:
        raise ValueError(f"unknown mesh format {fmt!r}")
