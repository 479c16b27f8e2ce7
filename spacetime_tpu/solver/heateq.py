"""End-to-end jitted heat-equation solver (single device).

The TPU-native counterpart of ``oracle.solver.OracleSolver``: identical
mathematics (stabilized minimal-residual formulation, see the oracle module
docstring), but every per-iteration operation is a device op:

- spatial SpMV: DIA diagonals of M_x/A_x (7 in 2D, 15 in 3D) applied as
  static-shifted multiply-adds over the (N_t+1, m) coefficient array — one
  fused bandwidth-bound XLA pass per operator;
- per-timestep / per-level inner solves: exact inverses precomputed on the
  host once (parity phase; m ≤ a few thousand) and applied as batched GEMMs
  on the MXU;
- wavelet transform: unrolled levelwise gathers/scatter-adds (J ≈ log2 N_t
  stages);
- PCG: one ``lax.while_loop`` under jit (solver.pcg).

The operation order mirrors the oracle exactly, so float64 runs match the
recorded BASELINE.md residual histories to rounding and iteration counts
exactly.
"""

from __future__ import annotations

import dataclasses
import time as _time

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import (
    P1System,
    TimeGrid,
    spacetime_loads,
    time_matrices,
    unit_cube_mesh,
    unit_square_mesh,
)
from ..fem.errors import l2_error_spacetime
from ..fem.timegrid import graded_time_grid, uniform_time_grid
from ..models import Problem, get_problem
from ..ops.sparse import DiaMatrix, dia_matvec
from ..ops.wavelets import build_wavelet_transform
from .pcg import pcg


@dataclasses.dataclass
class SolveResult:
    U: np.ndarray
    iterations: int
    residuals: np.ndarray
    precond_residuals: np.ndarray
    converged: bool
    l2_error: float | None = None
    solve_seconds: float = 0.0
    setup_seconds: float = 0.0


class HeatSolver:
    """Jitted single-device solver. Setup (assembly, factorizations, wavelet
    structure) runs once on the host; ``solve`` dispatches one fused device
    computation."""

    def __init__(
        self,
        problem: Problem,
        system: P1System,
        grid: TimeGrid,
        dtype=jnp.float64,
    ):
        t0 = _time.perf_counter()
        self.problem = problem
        self.system = system
        self.grid = grid
        self.dtype = dtype
        self.N = grid.num_intervals
        self.m = system.m
        self.wt = build_wavelet_transform(grid)

        # --- host-side precompute -----------------------------------------
        M_csr, A_csr = system.M, system.A
        self.M_dia = DiaMatrix.from_csr(M_csr)
        self.A_dia = DiaMatrix.from_csr(A_csr)
        A_dense = A_csr.toarray()
        M_dense = M_csr.toarray()
        Kx_inv = np.linalg.inv(A_dense)
        Minv = np.linalg.inv(M_dense)
        sandwiches = []
        for j in range(self.wt.num_levels + 1):
            omega = float(self.wt.level_shift[j])
            Sj = np.linalg.inv(A_dense + omega * M_dense)
            sandwiches.append(Sj @ A_dense @ Sj)

        # --- device arrays -------------------------------------------------
        cast = lambda x: jnp.asarray(x, dtype)
        self.h_d = cast(time_matrices(grid)["h"])
        self.Mv = cast(self.M_dia.vals)
        self.Av = cast(self.A_dia.vals)
        self.Moff = self.M_dia.offsets
        self.Aoff = self.A_dia.offsets
        self.Kx_inv = cast(Kx_inv)
        self.Minv = cast(Minv)
        self.sandwich = [cast(S) for S in sandwiches]
        self.perm = jnp.asarray(self.wt.perm_by_level)
        inv_perm = np.empty_like(self.wt.perm_by_level)
        inv_perm[self.wt.perm_by_level] = np.arange(self.N + 1)
        self.inv_perm = jnp.asarray(inv_perm)
        counts = np.asarray(self.wt.level_counts)
        self.level_bounds = np.concatenate([[0], np.cumsum(counts)]).astype(int)

        self._solve_jit_cache = {}
        self.setup_seconds = _time.perf_counter() - t0

    # ---------------------------------------------------------- operators

    def _spmv_M(self, U):
        return dia_matvec(self.Mv, self.Moff, U)

    def _spmv_A(self, U):
        return dia_matvec(self.Av, self.Aoff, U)

    def apply_B(self, U):
        DU = U[1:] - U[:-1]
        SU = U[1:] + U[:-1]
        return self._spmv_M(DU) + (0.5 * self.h_d)[:, None] * self._spmv_A(SU)

    def apply_BT(self, V):
        VM = self._spmv_M(V)
        VA = (0.5 * self.h_d)[:, None] * self._spmv_A(V)
        z = jnp.zeros((1, self.m), self.dtype)
        return jnp.concatenate([-VM + VA, z]) + jnp.concatenate([z, VM + VA])

    def apply_KY(self, V):
        return (V @ self.Kx_inv) / self.h_d[:, None]

    def apply_stab(self, U):
        D = U[1:] - U[:-1]
        W = (self.h_d / 16.0)[:, None] * self._spmv_A(D)
        z = jnp.zeros((1, self.m), self.dtype)
        return jnp.concatenate([z, W]) - jnp.concatenate([W, z])

    def apply_trace(self, U):
        row0 = self._spmv_M((self._spmv_M(U[0:1]) @ self.Minv))
        return jnp.concatenate([row0, jnp.zeros((self.N, self.m), self.dtype)])

    def apply_S(self, U):
        return (
            self.apply_BT(self.apply_KY(self.apply_B(U)))
            + self.apply_stab(U)
            + self.apply_trace(U)
        )

    def apply_KX(self, R):
        C = self.wt.adjoint(R)
        Cs = C[self.perm]
        pieces = []
        for j in range(len(self.sandwich)):
            a, b = self.level_bounds[j], self.level_bounds[j + 1]
            if a == b:
                continue
            pieces.append(Cs[a:b] @ self.sandwich[j])
        Cs = jnp.concatenate(pieces)
        return self.wt.forward(Cs[self.inv_perm])

    # ---------------------------------------------------------------- rhs

    def assemble_rhs_host(self):
        """Host-side load quadrature; returns device-ready (gL, gR, u0_vec)."""
        gL, gR, u0_vec = spacetime_loads(self.problem, self.system.mesh, self.grid)
        return (
            jnp.asarray(gL, self.dtype),
            jnp.asarray(gR, self.dtype),
            jnp.asarray(u0_vec, self.dtype),
        )

    def rhs_device(self, gL, gR, u0_vec):
        f = self.apply_BT(self.apply_KY(gL + gR))
        corr = 0.25 * (gL - gR)
        z = jnp.zeros((1, self.m), self.dtype)
        f = f - jnp.concatenate([z, corr]) + jnp.concatenate([corr, z])
        f0 = self._spmv_M((u0_vec[None, :] @ self.Minv))[0]
        return f.at[0].add(f0)

    # -------------------------------------------------------------- solve

    def _build_solve(self, tol: float, maxiter: int):
        def run(gL, gR, u0_vec):
            f = self.rhs_device(gL, gR, u0_vec)
            return pcg(self.apply_S, self.apply_KX, f, tol, maxiter)

        return jax.jit(run)

    def solve(
        self, tol: float = 1e-6, maxiter: int = 200, compute_error: bool = True
    ) -> SolveResult:
        key = (tol, maxiter)
        if key not in self._solve_jit_cache:
            self._solve_jit_cache[key] = self._build_solve(tol, maxiter)
        gL, gR, u0_vec = self.assemble_rhs_host()
        t0 = _time.perf_counter()
        out = self._solve_jit_cache[key](gL, gR, u0_vec)
        out = jax.tree.map(np.asarray, jax.device_get(out))
        solve_seconds = _time.perf_counter() - t0

        it = int(out.iterations)
        err = None
        if compute_error and self.problem.exact is not None:
            err = l2_error_spacetime(
                self.problem, self.system.mesh, self.grid, np.asarray(out.U, np.float64)
            )
        return SolveResult(
            U=np.asarray(out.U),
            iterations=it,
            residuals=out.residuals[: it + 1],
            precond_residuals=out.precond_residuals[: it + 1],
            converged=bool(out.converged),
            l2_error=err,
            solve_seconds=solve_seconds,
            setup_seconds=self.setup_seconds,
        )


def solve_heat_equation_tpu(
    problem_name: str = "smooth2d",
    space_n: int = 16,
    time_levels: int = 4,
    extra_time_levels: int = 0,
    tol: float = 1e-6,
    maxiter: int = 200,
    dtype=jnp.float64,
    compute_error: bool = True,
) -> SolveResult:
    """One-call driver for the jitted single-device path (mirrors
    ``oracle.solve_heat_equation``)."""
    problem = get_problem(problem_name)
    mesh = unit_square_mesh(space_n) if problem.dim == 2 else unit_cube_mesh(space_n)
    system = P1System.from_mesh(mesh)
    if extra_time_levels > 0:
        grid = graded_time_grid(time_levels, extra_time_levels, T=problem.T)
    else:
        grid = uniform_time_grid(time_levels, T=problem.T)
    solver = HeatSolver(problem, system, grid, dtype=dtype)
    return solver.solve(tol=tol, maxiter=maxiter, compute_error=compute_error)
