"""Blocked-ELL format + Pallas SpMM tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from spacetime_tpu.fem import P1System, unit_cube_mesh, unit_square_mesh
from spacetime_tpu.ops.blocked_ell import BlockedEll
from spacetime_tpu.ops.spmv_pallas import EllOperator


@pytest.mark.parametrize("mesh,nt", [(unit_square_mesh(24), 5), (unit_cube_mesh(6), 3)])
def test_numpy_matches_csr(mesh, nt):
    system = P1System.from_mesh(mesh)
    rng = np.random.default_rng(0)
    X = rng.standard_normal((nt, system.m))
    for A in (system.M, system.A):
        ell = BlockedEll.from_csr(A)
        ref = (A @ X.T).T
        np.testing.assert_allclose(ell.matvec_np(X), ref, atol=1e-12)


def test_pallas_interpret_matches_csr():
    system = P1System.from_mesh(unit_square_mesh(24))
    ell = BlockedEll.from_csr(system.A)
    op = EllOperator(ell, dtype=jnp.float64, interpret=True)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((8, system.m))
    ref = (system.A @ X.T).T
    got = np.asarray(op.apply(jnp.asarray(X)))
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_small_block_sizes():
    system = P1System.from_mesh(unit_square_mesh(12))
    ell = BlockedEll.from_csr(system.A, br=32, bc=32)
    rng = np.random.default_rng(2)
    X = rng.standard_normal((3, system.m))
    ref = (system.A @ X.T).T
    np.testing.assert_allclose(ell.matvec_np(X), ref, atol=1e-12)
    op = EllOperator(ell, dtype=jnp.float64, interpret=True)
    np.testing.assert_allclose(np.asarray(op.apply(jnp.asarray(X))), ref, atol=1e-12)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
