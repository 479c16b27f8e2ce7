"""Banded-DIA Pallas smoother kernels (ops/dia_pallas.py) — the flat-dof
twin of the structured MSPallasLevel kernels, for the unstructured
nested-refinement / SA multigrid levels (VERDICT round-2 item 2: the
L-shape iteration is measured ~93% V-cycles on XLA DIA passes).

Interpret mode on CPU: kernels must match the XLA smoother/residual to f32
roundoff in both the whole-axis and the lane-blocked layouts, and the
end-to-end solves must reproduce the XLA path's histories.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spacetime_tpu.fem import P1System, l_shape_mesh, refine_hierarchy
from spacetime_tpu.fem.timegrid import uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.ops.dia_pallas import DiaPallasLevel
from spacetime_tpu.ops.multigrid import NestedMultiShiftMultigrid
from spacetime_tpu.solver.heateq import HeatSolver


@pytest.fixture(scope="module")
def level():
    mesh = refine_hierarchy(l_shape_mesh(8), 2)
    sys_ = P1System.from_mesh(mesh)
    ms, _ = NestedMultiShiftMultigrid.build(
        mesh, sys_.A, sys_.M, nu=2, m_coarse=64
    )
    lev = ms.levels[0]
    T = 8
    omega = np.abs(np.random.default_rng(0).standard_normal(T)) * 3.0
    lps = ms.row_params(omega, jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((T, lev.dA.shape[0])), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T, lev.dA.shape[0])), jnp.float32)
    return ms, lev, omega, lps, x, b


def _mk(lev, T, blocked):
    pj = DiaPallasLevel(lev, T, jnp.float32, nu=2, interpret=True)
    if blocked:
        pj.MB = 2 * pj.HS  # force the halo-slab layout on the tiny mesh
        assert pj.MB < pj.m
    return pj


@pytest.mark.parametrize("blocked", [False, True])
class TestKernels:
    def _parts(self, level, blocked):
        ms, lev, omega, lps, x, b = level
        pj = _mk(lev, x.shape[0], blocked)
        cols = DiaPallasLevel.columns(lev, omega, jnp.float32)
        vals = pj.values(lev, jnp.float32)
        return ms, lev, lps, x, b, pj, cols, vals

    def _close(self, out, ref):
        scale = float(jnp.abs(ref).max())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-6 * scale
        )

    def test_presmooth(self, level, blocked):
        ms, lev, lps, x, b, pj, cols, vals = self._parts(level, blocked)
        self._close(
            pj.smooth(None, b, cols, vals, zero_init=True),
            ms._smooth(lev, lps[0], None, b, zero_init=True),
        )

    def test_postsmooth(self, level, blocked):
        ms, lev, lps, x, b, pj, cols, vals = self._parts(level, blocked)
        self._close(
            pj.smooth(x, b, cols, vals), ms._smooth(lev, lps[0], x, b)
        )

    def test_residual(self, level, blocked):
        ms, lev, lps, x, b, pj, cols, vals = self._parts(level, blocked)
        self._close(
            pj.residual(x, b, cols, vals), b - ms._op(lev, lps[0], x)
        )

    def test_apply_A(self, level, blocked):
        from spacetime_tpu.ops.sparse import dia_matvec

        ms, lev, lps, x, b, pj, cols, vals = self._parts(level, blocked)
        ref = dia_matvec(lps[0]["Av"], lev.offA, x)
        self._close(pj.apply_A(x, vals), ref)


def _solve_pair(problem_name, system, grid, **kw):
    problem = get_problem(problem_name)
    r0 = HeatSolver(
        problem, system, grid, pallas_kron=False, dtype=jnp.float32, **kw
    ).solve(tol=1e-5, compute_error=False)
    s = HeatSolver(
        problem, system, grid, pallas_kron=True, dtype=jnp.float32, **kw
    )
    s.mg_pallas_min_points = 1
    s._params_cache.clear()
    s.params = s.params_for(s.dtype)
    r1 = s.solve(tol=1e-5, compute_error=False)
    pls = s._ms_pl.get("float32")
    assert pls is not None and any(p is not None for p in pls), (
        "dia kernels not built"
    )
    assert r1.iterations == r0.iterations
    k = r0.iterations + 1
    np.testing.assert_allclose(r1.residuals[:k], r0.residuals[:k], rtol=1e-3)


def test_nested_solve_matches_xla():
    mesh = refine_hierarchy(l_shape_mesh(8), 2)
    _solve_pair(
        "lshape2d", P1System.from_mesh(mesh), uniform_time_grid(4),
        inner="mg",
    )


def test_small_time_axis_clamps_tb(level):
    # The solver constructs DiaPallasLevel with T=N+1, but K_Y smoother
    # arrays carry N time rows: with N+1 < 8 the cached TB=N+1 is neither
    # sublane-aligned nor equal to the actual time dim (the measured
    # Mosaic lowering rule). The per-call TB must come from the array
    # actually tiled.
    ms, lev, omega, lps, x, b = level
    pj = _mk(lev, 5, blocked=False)  # N=4 -> constructor T=N+1=5
    assert pj.TB == 5
    assert pj._tb_for(4) == 4        # K_Y arrays: N=4 rows
    assert pj._tb_for(5) == 5
    assert pj._tb_for(129) == 8      # large T stays sublane-aligned
    cols = DiaPallasLevel.columns(lev, omega[:4], jnp.float32)
    vals = pj.values(lev, jnp.float32)
    lps4 = ms.row_params(omega[:4], jnp.float32)
    out = pj.smooth(None, b[:4], cols, vals, zero_init=True)
    ref = ms._smooth(lev, lps4[0], None, b[:4], zero_init=True)
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-6 * scale
    )


def test_amg_solve_matches_xla():
    # SA hierarchy: the banded fine level takes the kernels; aggregated
    # (ELL) coarse levels stay XLA.
    mesh = l_shape_mesh(16)
    _solve_pair(
        "lshape2d", P1System.from_mesh(mesh), uniform_time_grid(4),
        inner="amg", mg_coarse=64,
    )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))


def test_dia_hardware_gate():
    """The worker-fault gate, round-5 form (r5_fault_sweep.jsonl): rule 1
    blocks wide-band families (step >= 640) below the measured-stable
    size m >= 1049025 per LEVEL; rule 2 keeps the round-4 multi-level
    restriction (one engaged level when any engaged level is wide-band).
    Narrow-band hierarchies and interpret mode are untouched."""
    from spacetime_tpu.ops.dia_pallas import (
        DIA_WIDE_STABLE_M,
        dia_hardware_gate,
    )

    BIG = DIA_WIDE_STABLE_M  # 1_049_025: the measured-stable island

    class _P:
        def __init__(self, step, m=BIG):
            self.step = step
            self.m = m

    wide = [_P(1280), _P(640), None, _P(384)]
    out = dia_hardware_gate(wide, interpret=False)
    assert out[0] is wide[0] and out[1:] == [None, None, None]
    # interpret mode: unchanged
    assert dia_hardware_gate(wide, interpret=True) == wide
    # narrow-band: unchanged on hardware (round-3 proven multi-level)
    narrow = [_P(512), _P(256), None]
    assert dia_hardware_gate(narrow, interpret=False) == narrow
    # all-None / empty lists pass through
    assert dia_hardware_gate([None, None], interpret=False) == [None, None]
    assert dia_hardware_gate([], interpret=False) == []
    # rule 1: a wide-band family BELOW the stable size is dropped even
    # alone — the r5 sweep's fault set (m=261665/523329, any MB,
    # steps 640 and 1280)
    assert dia_hardware_gate([_P(640, 261665)], interpret=False) == [None]
    assert dia_hardware_gate([_P(1280, 261665)], interpret=False) == [None]
    assert dia_hardware_gate([_P(640, 523329)], interpret=False) == [None]
    # ... which in a hierarchy leaves the narrow partner engaged alone
    out = dia_hardware_gate([_P(640, 261665), _P(320, 65000)],
                            interpret=False)
    assert out[0] is None and out[1] is not None
    # at the stable size the wide family stays (measured: m=1049025 is
    # solve-stable for both step families)
    assert dia_hardware_gate([_P(640, BIG)], interpret=False)[0] is not None
    # the blocklist keys on max(step) over ENGAGED levels, not the first:
    # a fine level excluded by the size gate must not let a coarser
    # wide-band multi-level engagement through (round-4 advisor finding)
    skipfine = [None, _P(1280), _P(640)]
    out = dia_hardware_gate(skipfine, interpret=False)
    assert out == [None, skipfine[1], None]
    mixed = [_P(512), _P(1280)]  # wide-band anywhere disables multi-level
    out = dia_hardware_gate(mixed, interpret=False)
    assert out == [mixed[0], None]
    # single-level engagement stays, even wide-band (the proven-stable
    # round-4 production configuration)
    solo = [_P(1280), None]
    assert dia_hardware_gate(solo, interpret=False) == solo
