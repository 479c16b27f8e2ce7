"""Oracle solver tests (SURVEY.md §4): operator identities, SPD structure,
flat PCG iteration counts, and convergence rates."""

import numpy as np
import pytest

from spacetime_tpu.fem import P1System, unit_square_mesh
from spacetime_tpu.fem.timegrid import uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.oracle import solve_heat_equation
from spacetime_tpu.oracle.solver import OracleSolver


@pytest.fixture(scope="module")
def small_solver():
    problem = get_problem("smooth2d")
    system = P1System.from_mesh(unit_square_mesh(8))
    grid = uniform_time_grid(3)
    return OracleSolver(problem, system, grid)


class TestOperators:
    def test_adjoint_consistency(self, small_solver):
        s = small_solver
        rng = np.random.default_rng(1)
        U = rng.standard_normal((s.N + 1, s.m))
        V = rng.standard_normal((s.N, s.m))
        assert np.isclose(
            np.vdot(s.apply_B(U), V), np.vdot(U, s.apply_BT(V)), rtol=1e-12
        )

    def test_S_symmetric_positive(self, small_solver):
        s = small_solver
        rng = np.random.default_rng(2)
        U = rng.standard_normal((s.N + 1, s.m))
        V = rng.standard_normal((s.N + 1, s.m))
        assert np.isclose(
            np.vdot(s.apply_S(U), V), np.vdot(U, s.apply_S(V)), rtol=1e-10
        )
        assert np.vdot(U, s.apply_S(U)) > 0

    def test_KX_symmetric_positive(self, small_solver):
        s = small_solver
        rng = np.random.default_rng(3)
        U = rng.standard_normal((s.N + 1, s.m))
        V = rng.standard_normal((s.N + 1, s.m))
        assert np.isclose(
            np.vdot(s.apply_KX(U), V), np.vdot(U, s.apply_KX(V)), rtol=1e-10
        )
        assert np.vdot(U, s.apply_KX(U)) > 0

    def test_kron_vs_dense(self, small_solver):
        # B matvec against explicit scipy.sparse.kron on the tiny grid,
        # including the half-grid condensation identity.
        import scipy.sparse as sp
        from spacetime_tpu.fem import time_matrices

        s = small_solver
        mats = time_matrices(s.grid)
        B = sp.kron(mats["A_t"], s.M_x) + sp.kron(mats["M_t"], s.A_x)
        rng = np.random.default_rng(4)
        U = rng.standard_normal((s.N + 1, s.m))
        assert np.allclose(s.apply_B(U).ravel(), B @ U.ravel())


class TestSolve:
    def test_flat_iterations_and_rates(self):
        errs, iters = [], []
        for n, J in [(8, 3), (16, 4), (32, 5)]:
            r = solve_heat_equation("smooth2d", space_n=n, time_levels=J, tol=1e-6)
            assert r.converged
            errs.append(r.l2_error)
            iters.append(r.iterations)
        # Flat iteration counts: the paper's headline property.
        assert max(iters) - min(iters) <= 4
        assert max(iters) <= 20
        # Second-order convergence in (h, k).
        rate1 = errs[0] / errs[1]
        rate2 = errs[1] / errs[2]
        assert 3.3 < rate1 < 4.7
        assert 3.3 < rate2 < 4.7

    def test_residual_monotone_decrease(self):
        r = solve_heat_equation(
            "smooth2d", space_n=8, time_levels=3, tol=1e-10, maxiter=40,
            compute_error=False,
        )
        # preconditioned residual norm should be (weakly) decreasing
        d = np.diff(np.log10(r.residuals + 1e-300))
        assert (d < 0.35).all()  # no blow-ups; small plateaus tolerated
        assert r.residuals[-1] < 1e-8 * r.residuals[0]

    def test_3d(self):
        r = solve_heat_equation("smooth3d", space_n=4, time_levels=2, tol=1e-6)
        assert r.converged and r.iterations <= 15
        assert r.l2_error < 0.08

    def test_graded_grid_solver(self):
        r = solve_heat_equation(
            "singular2d", space_n=8, time_levels=3, extra_time_levels=3, tol=1e-6
        )
        assert r.converged and r.iterations <= 18


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))


def test_graded_grid_beats_uniform_on_singular_problem():
    # cfg4 (BASELINE.md): u ~ t^0.75 has a time singularity at t=0; grading
    # toward 0 restores the convergence the uniform grid loses. At similar
    # step counts (8 uniform vs 11 graded) the graded error must be well
    # below the uniform one, at flat iteration counts.
    r_u = solve_heat_equation("singular2d", space_n=32, time_levels=3, tol=1e-6)
    r_g = solve_heat_equation(
        "singular2d", space_n=32, time_levels=3, extra_time_levels=3, tol=1e-6
    )
    assert r_g.l2_error < 0.65 * r_u.l2_error
    assert abs(r_g.iterations - r_u.iterations) <= 3
