"""Variable-coefficient Pallas smoother/residual kernels vs the XLA forms
(interpret mode). Same Chebyshev–Jacobi recurrence as the constant-stencil
kernels (tests/test_mg_pallas.py), with per-node A tap weights and an
in-kernel node-dependent Jacobi diagonal."""

import numpy as np
import jax.numpy as jnp
import pytest

import spacetime_tpu.ops.kron_pallas as kron_pallas
from spacetime_tpu.fem import P1System, unit_cube_mesh, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.ops.mg_pallas import VarMSPallasLevel
from spacetime_tpu.ops.multigrid import GalerkinMultiShiftMultigrid

KAPPA = lambda X: 1.0 + X[:, 0] + 0.5 * np.sin(np.pi * X[:, 1])
REACT = lambda X: 1.0 + X[:, -1]


def _build(dim, n, nu=2):
    make = unit_square_mesh if dim == 2 else unit_cube_mesh
    sys_w = P1System.from_mesh(make(n), kappa=KAPPA, reaction=REACT)
    return GalerkinMultiShiftMultigrid.build(
        dim, n, sys_w.A, sys_w.M, nu=nu, n_coarse=max(n // 2, 4)
    )


def _check(dim, n, T, nu, monkeypatch=None, budget=None):
    if budget is not None:
        monkeypatch.setattr(kron_pallas, "_VMEM_BUDGET", budget)
    msmg, _ = _build(dim, n, nu)
    lev = msmg.levels[0]
    rng = np.random.default_rng(0)
    omega_rows = np.abs(rng.standard_normal(T)) * 10
    lp = msmg.row_params(omega_rows, jnp.float32)[0]
    gs = lev.gs
    x = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    ref_s = np.asarray(msmg._smooth(lev, lp, x, b))
    ref_s0 = np.asarray(msmg._smooth(lev, lp, None, b, zero_init=True))
    ref_r = np.asarray(b - msmg._op(lev, lp, x))

    pj = VarMSPallasLevel(lev, T, jnp.float32, nu, interpret=True)
    cols = VarMSPallasLevel.columns(lev, omega_rows, jnp.float32)
    W = lp["Aw"]
    sc = np.abs(ref_s).max()
    np.testing.assert_allclose(
        np.asarray(pj.smooth(x, b, cols, W)), ref_s,
        rtol=1e-5, atol=1e-6 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pj.smooth(None, b, cols, W, zero_init=True)), ref_s0,
        rtol=1e-5, atol=1e-6 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pj.residual(x, b, cols, W)), ref_r,
        rtol=1e-5, atol=1e-6 * np.abs(ref_r).max(),
    )
    ref_a = np.asarray(lev.A_vs.apply(x, W))
    np.testing.assert_allclose(
        np.asarray(pj.apply_A(x, W)), ref_a,
        rtol=1e-5, atol=1e-6 * np.abs(ref_a).max(),
    )
    # Pallas columns must be numerically identical to the XLA row params
    # (same smoothing scalars on both paths).
    np.testing.assert_allclose(
        np.asarray(cols["invT"][:, 0, 0]),
        np.asarray(lp["inv_theta"]).reshape(T, -1)[:, 0], rtol=1e-6,
    )
    return pj


def test_2d_nu2():
    _check(2, 16, 8, 2)


def test_2d_nu3():
    _check(2, 16, 8, 3)


def test_3d():
    _check(3, 8, 4, 2)


def test_ragged_time():
    _check(2, 16, 7, 2)


def test_2d_blocked(monkeypatch):
    pj = _check(2, 32, 8, 2, monkeypatch, budget=16 * 1024)
    assert pj.YB < pj.gs[-2]  # the shrunk budget actually forced blocking


def test_2d_blocked_nu3(monkeypatch):
    _check(2, 32, 8, 3, monkeypatch, budget=16 * 1024)


def test_3d_blocked(monkeypatch):
    pj = _check(3, 16, 4, 2, monkeypatch, budget=16 * 1024)
    assert pj.YB < pj.gs[-2]


@pytest.mark.parametrize("nu", [2, 3])
@pytest.mark.parametrize("force_blocked", [False, True])
def test_var_fused_pre_post_match_unfused(nu, force_blocked):
    """Weighted fused_pre == (zero-smooth, residual, restrict) and weighted
    fused_post == (prolong, correct, smooth), blocked and unblocked, in
    interpret mode (cf. the constant-path test in test_mg_pallas.py)."""
    from spacetime_tpu.ops.multigrid import _transfer_fast

    n, T = 32, 5
    msmg, _ = _build(2, n, nu)
    rng = np.random.default_rng(0)
    omega = np.abs(rng.standard_normal(T)) * 20
    lps = msmg.row_params(omega, jnp.float32)
    lev = msmg.levels[0]
    lp = lps[0]
    cols = VarMSPallasLevel.columns(lev, omega, jnp.float32)
    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)), jnp.float32)

    x_ref = msmg._smooth(lev, lp, None, b, zero_init=True)
    r_ref = b - msmg._op(lev, lp, x_ref)
    rc_ref = _transfer_fast(r_ref, 2, restrict=True)
    ec = jnp.asarray(rng.standard_normal(np.asarray(rc_ref).shape), jnp.float32)
    post_ref = msmg._smooth(
        lev, lp, x_ref + _transfer_fast(ec, 2, restrict=False), b
    )

    pj = VarMSPallasLevel(lev, T, jnp.float32, nu, interpret=True)
    if force_blocked:
        pj.YB = 16
    assert pj.fused_ok
    tx = pj.transfers(jnp.float32)
    W = lp["Aw"]
    x, rc = pj.fused_pre(b, cols, tx, W)
    post = pj.fused_post(x_ref, b, ec, cols, tx, W)
    scale = float(np.abs(np.asarray(rc_ref)).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-5,
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref), rtol=1e-4,
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(post), np.asarray(post_ref),
                               rtol=1e-4, atol=3e-5 * float(
                                   np.abs(np.asarray(post_ref)).max()))


def test_var_fused_pre_post_3d_matches_unfused():
    """3D weighted fused stages (z-axis pairsums/repeats) vs the XLA forms."""
    from spacetime_tpu.ops.multigrid import _transfer_fast

    n, T, nu = 16, 3, 2
    msmg, _ = _build(3, n, nu)
    rng = np.random.default_rng(3)
    omega = np.abs(rng.standard_normal(T)) * 10
    lps = msmg.row_params(omega, jnp.float32)
    lev = msmg.levels[0]
    lp = lps[0]
    cols = VarMSPallasLevel.columns(lev, omega, jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + lev.gs), jnp.float32)

    x_ref = msmg._smooth(lev, lp, None, b, zero_init=True)
    r_ref = b - msmg._op(lev, lp, x_ref)
    rc_ref = _transfer_fast(r_ref, 3, restrict=True)
    ec = jnp.asarray(rng.standard_normal(np.asarray(rc_ref).shape), jnp.float32)
    post_ref = msmg._smooth(
        lev, lp, x_ref + _transfer_fast(ec, 3, restrict=False), b
    )

    pj = VarMSPallasLevel(lev, T, jnp.float32, nu, interpret=True)
    assert pj.fused_ok
    tx = pj.transfers(jnp.float32)
    W = lp["Aw"]
    x, rc = pj.fused_pre(b, cols, tx, W)
    post = pj.fused_post(x_ref, b, ec, cols, tx, W)
    scale = float(np.abs(np.asarray(rc_ref)).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-5,
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref), rtol=1e-4,
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(post), np.asarray(post_ref),
                               rtol=1e-4, atol=3e-5 * float(
                                   np.abs(np.asarray(post_ref)).max()))


def test_weighted_vcycle_fused_matches_xla():
    """The Galerkin vcycle's fused branch (exercised via lp['tx']) matches
    the unfused XLA vcycle."""
    msmg, (A_c, M_c) = _build(2, 16)
    T = 6
    rng = np.random.default_rng(1)
    omega_rows = np.abs(rng.standard_normal(T)) * 4
    lps = msmg.row_params(omega_rows, jnp.float32)
    cinvs = np.stack([np.linalg.inv(A_c + w * M_c) for w in omega_rows])

    def coarse(bc):
        flat = bc.reshape(bc.shape[0], -1)
        out = jnp.einsum(
            "tm,tmk->tk", flat, jnp.asarray(cinvs, jnp.float32)
        )
        return out.reshape(bc.shape)

    b = jnp.asarray(
        rng.standard_normal((T,) + msmg.levels[0].gs), jnp.float32
    )
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))
    pls = [
        VarMSPallasLevel(lev, T, jnp.float32, msmg.nu, interpret=True)
        for lev in msmg.levels
    ]
    for lp, lev, pj in zip(lps, msmg.levels, pls):
        lp["cols"] = VarMSPallasLevel.columns(lev, omega_rows, jnp.float32)
        if pj.fused_ok:
            lp["tx"] = pj.transfers(jnp.float32)
    assert any("tx" in lp for lp in lps)
    out = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pls))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5 * np.abs(ref).max())


def test_weighted_vcycle_with_pallas_matches_xla():
    msmg, (A_c, M_c) = _build(2, 16)
    T = 6
    rng = np.random.default_rng(1)
    omega_rows = np.abs(rng.standard_normal(T)) * 4
    lps = msmg.row_params(omega_rows, jnp.float32)
    cinvs = np.stack([np.linalg.inv(A_c + w * M_c) for w in omega_rows])

    def coarse(bc):
        flat = bc.reshape(bc.shape[0], -1)
        out = jnp.einsum(
            "tm,tmk->tk", flat, jnp.asarray(cinvs, jnp.float32)
        )
        return out.reshape(bc.shape)

    b = jnp.asarray(
        rng.standard_normal((T,) + msmg.levels[0].gs), jnp.float32
    )
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))
    pls = [
        VarMSPallasLevel(lev, T, jnp.float32, msmg.nu, interpret=True)
        for lev in msmg.levels
    ]
    for lp, lev in zip(lps, msmg.levels):
        lp["cols"] = VarMSPallasLevel.columns(lev, omega_rows, jnp.float32)
    out = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pls))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=1e-5 * np.abs(ref).max())


@pytest.mark.slow
def test_varcoef_solve_with_forced_kernels_matches_xla():
    """End-to-end weighted solve with the Pallas V-cycle kernels forced on
    (interpret mode) reproduces the XLA path's iteration count and
    solution quality."""
    prob = get_problem("varcoef2d")
    system = P1System.from_problem(prob, unit_square_mesh(16))
    grid = uniform_time_grid(3)
    kw = dict(dtype=jnp.float32, inner="mg", mg_coarse=8)
    s_x = __import__("spacetime_tpu.solver.heateq", fromlist=["HeatSolver"])
    HeatSolver = s_x.HeatSolver
    ref = HeatSolver(prob, system, grid, **kw).solve(
        tol=1e-5, compute_error=False
    )
    forced = HeatSolver(prob, system, grid, pallas_kron=True, **kw)
    assert forced.pallas_mg
    # params were built at init with the production size gate; rebuild with
    # the gate lowered so the tiny test levels get kernels.
    forced.mg_pallas_min_points = 1
    forced._params_cache.clear()
    forced._ms_pl.clear()
    forced.params = forced.params_for(jnp.float32)
    assert any(pj is not None for pj in forced._ms_pl["float32"])
    out = forced.solve(tol=1e-5, compute_error=False)
    assert out.converged
    assert abs(out.iterations - ref.iterations) <= 1
    np.testing.assert_allclose(
        out.U, ref.U, rtol=1e-3, atol=1e-5 * np.abs(ref.U).max()
    )


@pytest.mark.parametrize(
    "dim,blocked", [(2, False), (2, True), (3, False), (3, True)]
)
def test_var_semi_fused_match_unfused(dim, blocked):
    """Weighted residual_restrict == (residual, restrict); prolong_correct
    is shared with the constant path — f64 is exact (HIGHEST dots)."""
    from spacetime_tpu.ops.multigrid import _transfer_fast

    n = 32
    T = 3
    msmg, _ = _build(dim, n)
    lev = msmg.levels[0]
    rng = np.random.default_rng(7)
    omega_rows = np.abs(rng.standard_normal(T)) * 10
    lp = msmg.row_params(omega_rows, jnp.float64)[0]
    gs = lev.gs
    x = jnp.asarray(rng.standard_normal((T,) + gs))
    b = jnp.asarray(rng.standard_normal((T,) + gs))
    rc_ref = np.asarray(
        _transfer_fast(b - msmg._op(lev, lp, x), dim, restrict=True)
    )
    ec = jnp.asarray(rng.standard_normal(rc_ref.shape))
    pc_ref = np.asarray(x + _transfer_fast(ec, dim, restrict=False))

    pj = VarMSPallasLevel(lev, T, jnp.float64, msmg.nu, interpret=True)
    pj.TBt = 2
    pj.YBt = 16 if blocked else gs[-2]
    assert pj.semi_ok
    tx = pj.transfers(jnp.float64)
    cols = VarMSPallasLevel.columns(lev, omega_rows, jnp.float64)
    rc = pj.residual_restrict(x, b, cols, tx, lp["Aw"])
    pc = pj.prolong_correct(x, ec, tx)
    np.testing.assert_allclose(np.asarray(rc), rc_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pc), pc_ref, atol=1e-12)


def test_var_semi_vcycle_matches_xla():
    """The weighted vcycle's semi-fused branch (fused_ok off via a
    non-16-aligned smoother YB — the blocked-3D varcoef situation) matches
    the XLA vcycle and actually executes."""
    from spacetime_tpu.ops import mg_pallas

    msmg, (A_c, M_c) = _build(2, 32)
    T = 4
    rng = np.random.default_rng(8)
    omega_rows = np.abs(rng.standard_normal(T)) * 4
    lps = msmg.row_params(omega_rows, jnp.float64)
    cinvs = np.stack([np.linalg.inv(A_c + w * M_c) for w in omega_rows])

    def coarse(bc):
        flat = bc.reshape(bc.shape[0], -1)
        out = jnp.einsum("tm,tmk->tk", flat, jnp.asarray(cinvs))
        return out.reshape(bc.shape)

    b = jnp.asarray(rng.standard_normal((T,) + msmg.levels[0].gs))
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))
    pls = [
        VarMSPallasLevel(lev, T, jnp.float64, msmg.nu, interpret=True)
        for lev in msmg.levels
    ]
    pls[0].YB = 8  # fused_ok False (YB % 16) -> semi path
    pls[0].TBt, pls[0].YBt = 2, 16
    assert not pls[0].fused_ok and pls[0].semi_ok
    for pj, lp, lev in zip(pls, lps, msmg.levels):
        lp["cols"] = VarMSPallasLevel.columns(lev, omega_rows, jnp.float64)
        if pj.fused_ok or pj.semi_ok:
            lp["tx"] = pj.transfers(jnp.float64)
    calls = []
    orig = VarMSPallasLevel.residual_restrict
    VarMSPallasLevel.residual_restrict = (
        lambda self, *a, **k: (calls.append(1), orig(self, *a, **k))[1]
    )
    try:
        got = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pls))
    finally:
        VarMSPallasLevel.residual_restrict = orig
    assert calls, "semi-fused branch was not taken"
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
