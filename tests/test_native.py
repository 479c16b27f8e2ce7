"""Native C++ assembly core vs NumPy reference (exactness + availability)."""

import numpy as np
import pytest

from spacetime_tpu import native
from spacetime_tpu.fem import unit_cube_mesh, unit_square_mesh
from spacetime_tpu.fem.assembly import assemble_p1


requires_native = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


@requires_native
@pytest.mark.parametrize("mesh", [unit_square_mesh(16), unit_cube_mesh(6)],
                         ids=["2d", "3d"])
def test_native_matches_numpy(mesh):
    M0, A0 = assemble_p1(mesh, engine="numpy")
    M1, A1 = assemble_p1(mesh, engine="native")
    assert abs(M1 - M0).max() < 1e-16
    assert abs(A1 - A0).max() < 1e-13


@requires_native
@pytest.mark.parametrize("mesh", [unit_square_mesh(16), unit_cube_mesh(6)],
                         ids=["2d", "3d"])
def test_native_weighted_matches_numpy(mesh):
    kap = lambda X: 1.0 + X[:, 0] + 0.5 * np.sin(np.pi * X[:, 1])
    rea = lambda X: 2.0 + X[:, -1]
    M0, A0 = assemble_p1(mesh, engine="numpy", kappa=kap, reaction=rea)
    M1, A1 = assemble_p1(mesh, engine="native", kappa=kap, reaction=rea)
    assert abs(M1 - M0).max() < 1e-16
    assert abs(A1 - A0).max() < 1e-13
    # The weighted form differs from the plain one (sanity of the wiring).
    _, Aplain = assemble_p1(mesh, engine="native")
    assert abs(A1 - Aplain).max() > 1e-3
