"""Fused Pallas B/Bᵀ kernels vs the XLA stencil path (interpret mode).

The pallas kernels must reproduce the stencil-path Kronecker applications
exactly (same weight grouping, same arithmetic order per element) across
2D/3D grids, graded (ragged) time grids, and both blocking modes.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spacetime_tpu.fem import (
    P1System,
    unit_cube_mesh,
    unit_square_mesh,
    uniform_time_grid,
)
from spacetime_tpu.fem.timegrid import graded_time_grid, time_matrices
from spacetime_tpu.ops.sparse import DiaMatrix
from spacetime_tpu.ops.stencil import StencilOperator, row_scale
from spacetime_tpu.ops import kron_pallas
from spacetime_tpu.ops.kron_pallas import KronPallas


def _reference(system, grid, U, V, dtype):
    gs = tuple(system.mesh.grid_shape)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    hh = row_scale(0.5 * h, gs, dtype)
    z = jnp.zeros((1,) + gs, dtype)
    DU, SU = U[1:] - U[:-1], U[1:] + U[:-1]
    refB = M_st.apply(DU) + hh * A_st.apply(SU)
    VM, VA = M_st.apply(V), hh * A_st.apply(V)
    refBT = jnp.concatenate([-VM + VA, z]) + jnp.concatenate([z, VM + VA])
    return (M_st, A_st, h), refB, refBT


def _check(mk_mesh, n, grid, budget=None, monkeypatch=None):
    if budget is not None:
        monkeypatch.setattr(kron_pallas, "_VMEM_BUDGET", budget)
    system = P1System.from_mesh(mk_mesh(n))
    gs = tuple(system.mesh.grid_shape)
    T = grid.num_intervals
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), jnp.float32)
    V = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    (M_st, A_st, h), refB, refBT = _reference(system, grid, U, V, jnp.float32)
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True)
    # f32: identical up to rounding (graded h weights reassociate slightly)
    refB, refBT = np.asarray(refB), np.asarray(refBT)
    np.testing.assert_allclose(
        np.asarray(kp.apply_B(U)), refB, rtol=1e-5, atol=1e-6 * np.abs(refB).max()
    )
    np.testing.assert_allclose(
        np.asarray(kp.apply_BT(V)), refBT, rtol=1e-5, atol=1e-6 * np.abs(refBT).max()
    )
    return kp


def test_2d_uniform():
    kp = _check(unit_square_mesh, 16, uniform_time_grid(4))
    assert kp.YB == 15  # unblocked


def test_2d_graded_ragged_time():
    _check(unit_square_mesh, 16, graded_time_grid(3, 2))


def test_3d():
    _check(unit_cube_mesh, 8, uniform_time_grid(3))


def test_2d_blocked_y(monkeypatch):
    kp = _check(
        unit_square_mesh, 32, uniform_time_grid(4), budget=16 * 1024,
        monkeypatch=monkeypatch,
    )
    assert kp.YB < 31  # y-blocking engaged


def test_3d_blocked_y(monkeypatch):
    _check(
        unit_cube_mesh, 10, uniform_time_grid(3), budget=16 * 1024,
        monkeypatch=monkeypatch,
    )


def test_3d_blocked_measured_point(monkeypatch):
    """The hardware-enabled blocked-3D configuration (TB=4, YB=16) — forced
    here on a small grid via the budget monkeypatch — must be exact in
    interpret mode, and supported() must admit exactly the probed family
    (f32, rows ≤ the 127³ probe's, T divisible by 4; probe_kron3d.jsonl)."""
    kp = _check(
        unit_cube_mesh, 18, uniform_time_grid(4), budget=16 * 1024,
        monkeypatch=monkeypatch,
    )
    assert (kp.TB, kp.YB) == (4, 16)  # the probed block, blocking engaged
    assert not kp.stab_ok  # stab-fused (4,16) failed Mosaic compile
    # 129³-mesh × 64ts (the big-3D config): picked on real hardware.
    assert KronPallas.supported((127, 127, 127), 64, jnp.float32)
    # Unmeasured variants keep the XLA fallback:
    assert not KronPallas.supported((127, 127, 127), 64, jnp.bfloat16)
    assert not KronPallas.supported((127, 127, 127), 2, jnp.float32)  # TB=2
    assert not KronPallas.supported((127, 255, 255), 64, jnp.float32)


def test_scale_is_fused():
    system = P1System.from_mesh(unit_square_mesh(12))
    grid = uniform_time_grid(3)
    gs = tuple(system.mesh.grid_shape)
    T = grid.num_intervals
    rng = np.random.default_rng(1)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), jnp.float32)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True)
    a = np.asarray(kp.apply_B(U, scale=0.5))
    b = 0.5 * np.asarray(kp.apply_B(U))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def _stab_reference(system, grid, U, V, dtype):
    """XLA composition of (B·U, W) and Bᵀ·V + stab-combine(W)."""
    gs = tuple(system.mesh.grid_shape)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    hs = row_scale(h / 16.0, gs, dtype)
    _, refB, refBT = _reference(system, grid, U, V, dtype)
    W = hs * A_st.apply(U[1:] - U[:-1])
    z = jnp.zeros((1,) + gs, dtype)
    stab = jnp.concatenate([z, W]) - jnp.concatenate([W, z])
    return refB, W, refBT + stab


@pytest.mark.parametrize(
    "mk_mesh,n,grid",
    [
        (unit_square_mesh, 16, uniform_time_grid(4)),
        (unit_square_mesh, 16, graded_time_grid(3, 2)),
        (unit_cube_mesh, 8, uniform_time_grid(3)),
    ],
)
def test_stab_fused(mk_mesh, n, grid):
    system = P1System.from_mesh(mk_mesh(n))
    gs = tuple(system.mesh.grid_shape)
    T = grid.num_intervals
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), jnp.float32)
    V = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    refB, refW, refOut = _stab_reference(system, grid, U, V, jnp.float32)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True)
    B, W = kp.apply_B_stab(U)
    out = kp.apply_BT_stab(V, W)
    for got, ref in ((B, refB), (W, refW)):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5,
            atol=1e-6 * float(np.abs(np.asarray(ref)).max()),
        )
    # out uses the pallas W (identical rounding to refW within tolerance)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(refOut), rtol=1e-4,
        atol=1e-5 * float(np.abs(np.asarray(refOut)).max()),
    )


def test_stab_fused_blocked_y(monkeypatch):
    monkeypatch.setattr(kron_pallas, "_VMEM_BUDGET", 16 * 1024)
    system = P1System.from_mesh(unit_square_mesh(32))
    gs = tuple(system.mesh.grid_shape)
    grid = uniform_time_grid(4)
    T = grid.num_intervals
    rng = np.random.default_rng(4)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), jnp.float32)
    V = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    refB, refW, refOut = _stab_reference(system, grid, U, V, jnp.float32)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True)
    assert kp.YBs < 31  # blocked mode engaged for the stab variants
    B, W = kp.apply_B_stab(U)
    out = kp.apply_BT_stab(V, W)
    np.testing.assert_allclose(
        np.asarray(B), np.asarray(refB), rtol=1e-5,
        atol=1e-6 * float(np.abs(np.asarray(refB)).max()),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(refOut), rtol=1e-4,
        atol=1e-5 * float(np.abs(np.asarray(refOut)).max()),
    )


def test_i32_specs_preserve_maps():
    """The x64 legalization workaround must preserve index-map semantics
    exactly (literals become program-index-derived values of the same int
    value; traced components pass through)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    spec = pl.BlockSpec(
        (8, 16, 128),
        lambda ti, yi: (ti * 4 + 4, yi, 3),
        memory_space=pltpu.VMEM,
    )
    [fixed] = kron_pallas._i32_specs([spec])
    assert fixed.block_shape == spec.block_shape
    out = jax.eval_shape(
        lambda a, b: jnp.stack(jnp.broadcast_arrays(*fixed.index_map(a, b))),
        jnp.int32(0), jnp.int32(0),
    )
    assert out.dtype == jnp.int32
    got = fixed.index_map(jnp.int32(2), jnp.int32(5))
    assert tuple(int(v) for v in got) == (12, 5, 3)
    assert not KronPallas.supported((15, 15), 8, jnp.float64)
    assert not KronPallas.supported(None, 8, jnp.float32)
    assert not KronPallas.supported((15,), 8, jnp.float32)
    assert KronPallas.supported((15, 15), 8, jnp.float32)
    assert KronPallas.supported((7, 7, 7), 8, jnp.bfloat16)


def test_solver_fused_apply_S_matches_xla():
    """End-to-end: HeatSolver's stab-fused pallas apply_S branch (interpret
    mode on CPU) must match the XLA branch, and a full solve must keep the
    oracle iteration count."""
    from spacetime_tpu.models import get_problem
    from spacetime_tpu.solver.heateq import HeatSolver

    problem = get_problem("smooth2d")
    system = P1System.from_mesh(unit_square_mesh(16))
    grid = uniform_time_grid(4)
    mk = lambda pk: HeatSolver(
        problem, system, grid, dtype=jnp.float32, pallas_kron=pk
    )
    s_pl, s_xla = mk(True), mk(False)
    assert s_pl.pallas_kron and not s_xla.pallas_kron
    rng = np.random.default_rng(5)
    U = jnp.asarray(
        rng.standard_normal((s_pl.N + 1,) + s_pl.gs), jnp.float32
    )
    a = np.asarray(s_pl.apply_S(U))
    b = np.asarray(s_xla.apply_S(U))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5 * np.abs(b).max())
    r = s_pl.solve(tol=1e-6, compute_error=False)
    assert r.converged
    # BASELINE.md: smooth2d 17x17x16ts = 11 iters (f64 oracle); f32
    # reassociation is allowed the documented ±1 drift.
    assert abs(r.iterations - 11) <= 1


def test_solver_gate_off_on_cpu():
    """On the CPU test backend the solver must auto-disable pallas."""
    from spacetime_tpu.models import get_problem
    from spacetime_tpu.solver.heateq import HeatSolver

    problem = get_problem("smooth2d")
    system = P1System.from_mesh(unit_square_mesh(8))
    solver = HeatSolver(problem, system, uniform_time_grid(3))
    assert not solver.pallas_kron
    assert "kron" not in solver.params


def test_tb1():
    """TB=1 (3D configs hit this): no zero-size time slices in the kernel."""
    system = P1System.from_mesh(unit_square_mesh(12))
    grid = uniform_time_grid(3)
    gs = tuple(system.mesh.grid_shape)
    T = grid.num_intervals
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), jnp.float32)
    V = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    _, refB, refBT = _reference(system, grid, U, V, jnp.float32)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True)
    kp.TB = 1
    np.testing.assert_allclose(
        np.asarray(kp.apply_B(U)), np.asarray(refB), rtol=1e-5,
        atol=1e-6 * float(np.abs(np.asarray(refB)).max()))
    np.testing.assert_allclose(
        np.asarray(kp.apply_BT(V)), np.asarray(refBT), rtol=1e-5,
        atol=1e-6 * float(np.abs(np.asarray(refBT)).max()))


def test_blocks_override_validation():
    import jax.numpy as jnp
    import pytest

    from spacetime_tpu.fem import P1System, unit_square_mesh
    from spacetime_tpu.fem.timegrid import time_matrices, uniform_time_grid
    from spacetime_tpu.ops.kron_pallas import KronPallas
    from spacetime_tpu.ops.sparse import DiaMatrix
    from spacetime_tpu.ops.stencil import StencilOperator

    system = P1System.from_mesh(unit_square_mesh(16))
    gs = tuple(system.mesh.grid_shape)
    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(uniform_time_grid(3))["h"]  # T = 8
    with pytest.raises(ValueError, match="must divide T"):
        KronPallas(M_st, A_st, h, jnp.float32, blocks=(3, 8))
    with pytest.raises(ValueError, match="multiple of 8"):
        KronPallas(M_st, A_st, h, jnp.float32, blocks=(2, 5))
    kp = KronPallas(M_st, A_st, h, jnp.float32, interpret=True, blocks=(2, 8))
    assert (kp.TB, kp.YB) == (2, 8)
