"""Pallas multi-shift smoother/residual kernels vs the XLA forms
(interpret mode). The kernels implement the identical Chebyshev–Jacobi
recurrence, so agreement is exact up to f32 reassociation inside the fused
stencil sums."""

import numpy as np
import jax.numpy as jnp
import pytest

import spacetime_tpu.ops.kron_pallas as kron_pallas
from spacetime_tpu.ops.mg_pallas import MSPallasLevel
from spacetime_tpu.ops.multigrid import MultiShiftMultigrid


def _check(dim, n, T, nu, monkeypatch=None, budget=None):
    if budget is not None:
        monkeypatch.setattr(kron_pallas, "_VMEM_BUDGET", budget)
    msmg, _ = MultiShiftMultigrid.build(dim, n, nu=nu)
    lev = msmg.levels[0]
    rng = np.random.default_rng(0)
    omega_rows = np.abs(rng.standard_normal(T)) * 10
    lp = msmg.row_params(omega_rows, jnp.float32)[0]
    gs = (n - 1,) * dim
    x = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    ref_s = np.asarray(msmg._smooth(lev, lp, x, b))
    ref_s0 = np.asarray(msmg._smooth(lev, lp, x * 0.0, b))
    ref_r = np.asarray(b - msmg._op(lev, lp, x))

    pj = MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float32, nu, interpret=True)
    cols = MSPallasLevel.columns(lev, omega_rows, jnp.float32)
    sc = np.abs(ref_s).max()
    np.testing.assert_allclose(
        np.asarray(pj.smooth(x, b, cols)), ref_s, rtol=1e-5, atol=1e-6 * sc
    )
    np.testing.assert_allclose(
        np.asarray(pj.smooth(None, b, cols, zero_init=True)), ref_s0,
        rtol=1e-5, atol=1e-6 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pj.residual(x, b, cols)), ref_r,
        rtol=1e-5, atol=1e-6 * np.abs(ref_r).max(),
    )
    ref_a = np.asarray(lev.A_st.apply(x))
    np.testing.assert_allclose(
        np.asarray(pj.apply_A(x)), ref_a,
        rtol=1e-5, atol=1e-6 * np.abs(ref_a).max(),
    )
    return pj


def test_2d_nu2():
    _check(2, 16, 8, 2)


def test_2d_nu3():
    _check(2, 16, 8, 3)


def test_3d():
    _check(3, 16, 4, 2)


def test_ragged_time():
    _check(2, 16, 7, 2)  # T=7: ragged tail time block


def test_2d_blocked(monkeypatch):
    pj = _check(2, 32, 8, 2, monkeypatch, budget=16 * 1024)
    assert pj.YB < 31


def test_2d_blocked_nu3(monkeypatch):
    _check(2, 32, 8, 3, monkeypatch, budget=16 * 1024)


def test_3d_blocked(monkeypatch):
    _check(3, 16, 4, 2, monkeypatch, budget=16 * 1024)


def test_pick_blocks_live_set_cap():
    """Blocked-mode picks at the measured shapes: the big-3D flagship must
    NOT get the old fixed TB=8 (whose smoother requested 117.89 MB scoped
    VMEM vs the 110 MB limit — measured compile OOM); 2D blocked shapes
    keep their previous choices."""
    from spacetime_tpu.ops.mg_pallas import _pick_blocks_mg

    assert _pick_blocks_mg(64, (127, 127, 127), 4) == (4, 8)
    # 2D shapes are unblocked here (the solver's constructor override
    # blocks them later) — unchanged by the cap.
    TB, YB = _pick_blocks_mg(128, (1023, 1023), 4)
    assert YB == 1023
    # estimate stays under the cap for whatever the chooser returns
    lf = 24 - 2
    TB, YB = _pick_blocks_mg(17, (127, 127, 127), 4)
    assert TB * (YB + 2) * 127 * 127 * 4 * lf <= 64 * 1024 * 1024


def test_vcycle_with_pallas_matches_xla():
    """A full multi-shift V-cycle with pallas smoothers at every level must
    match the XLA V-cycle."""
    msmg, (A_c, M_c) = MultiShiftMultigrid.build(2, 32, nu=2)
    T = 8
    rng = np.random.default_rng(1)
    omega_rows = np.abs(rng.standard_normal(T)) * 5
    lps = msmg.row_params(omega_rows, jnp.float32)
    coarse_inv = jnp.asarray(
        np.linalg.inv(A_c + omega_rows.mean() * M_c), jnp.float32
    )

    def coarse(bc):
        lead = bc.shape[0]
        return jnp.dot(bc.reshape(lead, -1), coarse_inv).reshape(bc.shape)

    b = jnp.asarray(rng.standard_normal((T, 31, 31)), jnp.float32)
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))

    pallas = [
        MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float32, 2, interpret=True)
        for lev in msmg.levels
    ]
    for pj, lp, lev in zip(pallas, lps, msmg.levels):
        lp["cols"] = MSPallasLevel.columns(lev, omega_rows, jnp.float32)
    got = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pallas))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6 * np.abs(ref).max())


@pytest.mark.parametrize("nu,force_blocked", [(2, False), (2, True), (3, True)])
def test_fused_pre_post_match_unfused(nu, force_blocked):
    """fused_pre == (zero-smooth, residual, restrict) and fused_post ==
    (prolong, correct, smooth), blocked and unblocked, in interpret mode.
    f32 exercises the bf16x2 transfer-matmul split (tolerance ~2^-16)."""
    n, T = 32, 5
    msmg, _ = MultiShiftMultigrid.build(2, n, nu=nu, n_coarse=8)
    rng = np.random.default_rng(0)
    omega = np.abs(rng.standard_normal(T)) * 20
    lps = msmg.row_params(omega, jnp.float32)
    lev = msmg.levels[0]
    cols = MSPallasLevel.columns(lev, omega, jnp.float32)
    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)), jnp.float32)

    x_ref = msmg._smooth(lev, lps[0], b * 0.0, b)
    r_ref = b - msmg._op(lev, lps[0], x_ref)
    rc_ref = msmg._restrict(r_ref, lev.n // 2)
    ec = jnp.asarray(rng.standard_normal(np.asarray(rc_ref).shape), jnp.float32)
    post_ref = msmg._smooth(
        lev, lps[0], x_ref + msmg._interp(ec, lev.n // 2), b
    )

    pj = MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float32, nu, interpret=True)
    if force_blocked:
        pj.YB = 16
    assert pj.fused_ok
    tx = pj.transfers(jnp.float32)
    x, rc = pj.fused_pre(b, cols, tx)
    post = pj.fused_post(x_ref, b, ec, cols, tx)
    scale = float(np.abs(np.asarray(rc_ref)).max())
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-5,
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref), rtol=1e-4,
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(post), np.asarray(post_ref),
                               rtol=1e-4, atol=3e-5)


def test_fused_vcycle_matches_unfused_f64():
    """The vcycle fused path (exercised via lp['tx']) is exact in f64."""
    n, T, nu = 32, 4, 2
    msmg, (A_c, M_c) = MultiShiftMultigrid.build(2, n, nu=nu, n_coarse=8)
    rng = np.random.default_rng(2)
    omega = np.abs(rng.standard_normal(T)) * 10
    lps = msmg.row_params(omega, jnp.float64)
    coarse_inv = jnp.asarray(np.linalg.inv(A_c + omega.mean() * M_c))

    def coarse(bc):
        lead = bc.shape[0]
        return jnp.dot(bc.reshape(lead, -1), coarse_inv).reshape(bc.shape)

    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)))
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))
    pallas = [
        MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float64, nu, interpret=True)
        for lev in msmg.levels
    ]
    for pj, lp, lev in zip(pallas, lps, msmg.levels):
        lp["cols"] = MSPallasLevel.columns(lev, omega, jnp.float64)
        if pj.fused_ok:
            lp["tx"] = pj.transfers(jnp.float64)
    got = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pallas))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)


@pytest.mark.parametrize(
    "dim,blocked", [(2, False), (2, True), (3, False), (3, True)]
)
def test_semi_fused_match_unfused(dim, blocked):
    """residual_restrict == (residual, restrict) and prolong_correct ==
    (prolong, correct) — f64 is exact (HIGHEST in-kernel dots)."""
    n = 32
    T = 3 if dim == 3 else 5
    msmg, _ = MultiShiftMultigrid.build(dim, n, nu=2, n_coarse=8)
    rng = np.random.default_rng(4)
    omega = np.abs(rng.standard_normal(T)) * 20
    lps = msmg.row_params(omega, jnp.float64)
    lev = msmg.levels[0]
    cols = MSPallasLevel.columns(lev, omega, jnp.float64)
    gs = (n - 1,) * dim
    x = jnp.asarray(rng.standard_normal((T,) + gs))
    b = jnp.asarray(rng.standard_normal((T,) + gs))
    rc_ref = msmg._restrict(b - msmg._op(lev, lps[0], x), lev.n // 2)
    ec = jnp.asarray(rng.standard_normal(np.asarray(rc_ref).shape))
    pc_ref = x + msmg._interp(ec, lev.n // 2)

    pj = MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float64, 2, interpret=True)
    pj.TBt = 2
    pj.YBt = 16 if blocked else n - 1
    assert pj.semi_ok
    tx = pj.transfers(jnp.float64)
    rc = pj.residual_restrict(x, b, cols, tx)
    pc = pj.prolong_correct(x, ec, tx)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref), atol=1e-12)
    np.testing.assert_allclose(np.asarray(pc), np.asarray(pc_ref), atol=1e-12)


def test_semi_fused_f32_blocked():
    """f32 exercises the bf16x2 transfer-matmul split (~2^-16 relative)."""
    n, T = 32, 4
    msmg, _ = MultiShiftMultigrid.build(2, n, nu=2, n_coarse=8)
    rng = np.random.default_rng(5)
    omega = np.abs(rng.standard_normal(T)) * 10
    lps = msmg.row_params(omega, jnp.float32)
    lev = msmg.levels[0]
    cols = MSPallasLevel.columns(lev, omega, jnp.float32)
    x = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)), jnp.float32)
    rc_ref = np.asarray(msmg._restrict(b - msmg._op(lev, lps[0], x), lev.n // 2))
    ec = jnp.asarray(rng.standard_normal(rc_ref.shape), jnp.float32)
    pc_ref = np.asarray(x + msmg._interp(ec, lev.n // 2))

    pj = MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float32, 2, interpret=True)
    pj.TBt, pj.YBt = 2, 16
    tx = pj.transfers(jnp.float32)
    sc = np.abs(rc_ref).max()
    np.testing.assert_allclose(
        np.asarray(pj.residual_restrict(x, b, cols, tx)), rc_ref,
        rtol=1e-4, atol=3e-5 * sc,
    )
    np.testing.assert_allclose(
        np.asarray(pj.prolong_correct(x, ec, tx)), pc_ref,
        rtol=1e-4, atol=3e-5 * np.abs(pc_ref).max(),
    )


def test_semi_vcycle_matches_xla_f64():
    """The vcycle semi-fused branch (fused_ok False via a non-16-aligned
    smoother YB — the blocked-3D flagship situation) is exact in f64."""
    n, T, nu = 32, 4, 2
    msmg, (A_c, M_c) = MultiShiftMultigrid.build(2, n, nu=nu, n_coarse=8)
    rng = np.random.default_rng(6)
    omega = np.abs(rng.standard_normal(T)) * 10
    lps = msmg.row_params(omega, jnp.float64)
    coarse_inv = jnp.asarray(np.linalg.inv(A_c + omega.mean() * M_c))

    def coarse(bc):
        lead = bc.shape[0]
        return jnp.dot(bc.reshape(lead, -1), coarse_inv).reshape(bc.shape)

    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1)))
    ref = np.asarray(msmg.solve(b, lps, coarse, cycles=2))
    pallas = [
        MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float64, nu, interpret=True)
        for lev in msmg.levels
    ]
    pallas[0].YB = 8  # fused_ok False (YB % 16) -> semi path
    pallas[0].TBt, pallas[0].YBt = 2, 16
    assert not pallas[0].fused_ok and pallas[0].semi_ok
    for pj, lp, lev in zip(pallas, lps, msmg.levels):
        lp["cols"] = MSPallasLevel.columns(lev, omega, jnp.float64)
        if pj.fused_ok or pj.semi_ok:
            lp["tx"] = pj.transfers(jnp.float64)
    calls = []
    orig = MSPallasLevel.residual_restrict
    MSPallasLevel.residual_restrict = (
        lambda self, *a, **k: (calls.append(1), orig(self, *a, **k))[1]
    )
    try:
        got = np.asarray(msmg.solve(b, lps, coarse, cycles=2, pallas=pallas))
    finally:
        MSPallasLevel.residual_restrict = orig
    assert calls, "semi-fused branch was not taken"
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-13)


def test_fused_pre_post_3d_matches_unfused():
    """3D fused stages (z pair-sum/repeat + y sublane + x matmul) match the
    unfused path in interpret mode, blocked and unblocked."""
    n, T = 32, 2
    msmg, _ = MultiShiftMultigrid.build(3, n, nu=2, n_coarse=8)
    rng = np.random.default_rng(3)
    omega = np.abs(rng.standard_normal(T)) * 10
    lps = msmg.row_params(omega, jnp.float64)
    lev = msmg.levels[0]
    cols = MSPallasLevel.columns(lev, omega, jnp.float64)
    b = jnp.asarray(rng.standard_normal((T, n - 1, n - 1, n - 1)))
    x_ref = msmg._smooth(lev, lps[0], b * 0.0, b)
    rc_ref = msmg._restrict(b - msmg._op(lev, lps[0], x_ref), lev.n // 2)
    ec = jnp.asarray(rng.standard_normal(np.asarray(rc_ref).shape))
    post_ref = msmg._smooth(
        lev, lps[0], x_ref + msmg._interp(ec, lev.n // 2), b
    )
    for YB in (n - 1, 16):
        pj = MSPallasLevel(lev.A_st, lev.M_st, T, jnp.float64, 2, interpret=True)
        pj.YB = YB
        tx = pj.transfers(jnp.float64)
        x, rc = pj.fused_pre(b, cols, tx)
        post = pj.fused_post(x_ref, b, ec, cols, tx)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-13)
        np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_ref), atol=1e-13)
        np.testing.assert_allclose(np.asarray(post), np.asarray(post_ref), atol=1e-13)


# ---------------------------------------------- sharded-slab transfer stages


def _sh_setup(dim, own=6, h=3, T=3, seed=1, ny=7):
    """Even-extent halo-slab scenario for the explicit2d lead=(own, h)
    kernel layout: constant A/M stencil pair on the extended slab."""
    from spacetime_tpu.ops.stencil import StencilOperator

    nx = 7
    gs_e = (own + 2 * h, nx) if dim == 2 else (own + 2 * h, ny, nx)
    if dim == 2:
        disps = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
    else:
        disps = ((0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, 1), (0, 0, -1))
    wA = tuple([4.0] + [-1.0] * (len(disps) - 1))
    wM = tuple([0.5] + [0.1] * (len(disps) - 1))
    pj = MSPallasLevel(
        StencilOperator(disps, wA, gs_e), StencilOperator(disps, wM, gs_e),
        T, jnp.float32, 2, interpret=True,
    )
    rng = np.random.default_rng(seed)
    omr = np.linspace(0.5, 1.5, T)
    cols = MSPallasLevel.columns(
        type("L", (), {"cA": 4.0, "cM": 0.5, "gA": 8.0, "gM": 1.0})(),
        omr, jnp.float32,
    )
    vm = np.ones((1,) + gs_e, np.float32)
    vm[:, :2] = 0.0
    vm[:, -1] = 0.0
    return pj, gs_e, omr, cols, pj.transfers(jnp.float32), jnp.asarray(vm), rng


def _op_np(X, gs_e, omr, dim):
    if dim == 2:
        disps = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
    else:
        disps = ((0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, 1), (0, 0, -1))
    wA = [4.0] + [-1.0] * (len(disps) - 1)
    wM = [0.5] + [0.1] * (len(disps) - 1)
    out = np.zeros_like(X)
    Xp = np.pad(X, [(0, 0)] + [(1, 1)] * dim)
    om = omr.reshape((X.shape[0],) + (1,) * dim)
    for d, wa, wm in zip(disps, wA, wM):
        sl = tuple([slice(None)] + [
            slice(1 + di, 1 + di + n) for di, n in zip(d, gs_e)
        ])
        out += (wa + om * wm) * Xp[sl]
    return out


def _pairs_np(M, st, n, ax):
    sl = [slice(None)] * M.ndim
    sl[ax] = slice(st, st + 2 * n)
    W = M[tuple(sl)]
    sh = W.shape[:ax] + (n, 2) + W.shape[ax + 1:]
    return W.reshape(sh).sum(ax + 1)


@pytest.mark.parametrize("dim", [2, 3])
def test_sh_residual_restrict(dim):
    from spacetime_tpu.ops.mg_pallas import _transfer_mats_np

    own, h = 6, 3
    pj, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim)
    T = 3
    x = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    assert pj.sh_transfer_ok(own)
    rc = pj.sh_residual_restrict(x, b, cols, tx, own, h)
    rr = np.asarray(b) - _op_np(np.asarray(x), gs_e, omr, dim)
    Ux, Wx = _transfer_mats_np(gs_e[-1])
    A, B = rr @ Ux, rr @ Wx
    if dim == 3:
        nyc = (gs_e[1] - 1) // 2
        A, B = _pairs_np(A, 0, nyc, 2), _pairs_np(B, 1, nyc, 2)
    A, B = _pairs_np(A, h, own // 2, 1), _pairs_np(B, h + 1, own // 2, 1)
    ref = 0.5 * (A + B)
    rel = np.abs(np.asarray(rc) - ref).max() / np.abs(ref).max()
    assert rel < 5e-5  # bf16-split transfer dot (~2^-16 relative)


@pytest.mark.parametrize("dim", [2, 3])
def test_sh_prolong_correct(dim):
    from spacetime_tpu.ops.mg_pallas import _transfer_mats_np

    own, hc = 6, 1
    pj, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim)
    T, nx = 3, gs_e[-1]
    nxc, nc = (nx - 1) // 2, own // 2
    xo_s = (T, own) + gs_e[1:]
    ec_s = (T, nc + 2 * hc, nxc) if dim == 2 else (T, nc + 2 * hc, 3, nxc)
    xo = jnp.asarray(rng.standard_normal(xo_s), jnp.float32)
    ec = jnp.asarray(rng.standard_normal(ec_s), jnp.float32)
    out = pj.sh_prolong_correct(xo, ec, tx, own, hc)
    Ux, Wx = _transfer_mats_np(nx)
    Af, Bf = np.asarray(ec) @ Ux.T, np.asarray(ec) @ Wx.T
    P = np.zeros(xo_s, np.float32)
    for f in range(own):
        cu, cw = f // 2 + hc, (f - 1) // 2 + hc
        if dim == 2:
            P[:, f] = 0.5 * (Af[:, cu] + Bf[:, cw])
        else:
            ny, nyc = gs_e[1], (gs_e[1] - 1) // 2
            for fy in range(ny):
                cuy, cwy = fy // 2, (fy - 1) // 2
                a = Af[:, cu, cuy] if 0 <= cuy < nyc else 0.0
                w_ = Bf[:, cw, cwy] if 0 <= cwy < nyc else 0.0
                P[:, f, fy] = 0.5 * (a + w_)
    ref = np.asarray(xo) + P
    rel = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
    assert rel < 5e-5


# Round-5 BLOCKED sharded transfer variants: same operator as the
# unblocked (round-4, parity-proven above) layout — 2-D via the
# crop / pad-and-crop lattice tricks, 3-D via sharded-z ⊥ blocked-y
# composition (ops/mg_pallas lead docstrings). The blocked layout is the
# hardware-engageable family (SH_BLOCKED_HW).


@pytest.mark.parametrize(
    "dim,h", [(2, 3), (2, 4), (2, 5), (3, 3), (3, 4)]
)
def test_sh_residual_restrict_blocked_matches_unblocked(dim, h):
    own = 20
    ny3 = 31  # serial blocked family (2^k - 1) for the unsharded 3-D y
    pj_u, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim, own=own, h=h, ny=ny3)
    pj_u.YBt = gs_e[-2]  # force unblocked (the proven reference)
    pj_b, *_ = _sh_setup(dim, own=own, h=h, ny=ny3)
    pj_b.YBt = 16
    assert pj_b._sh_blocked() and not pj_u._sh_blocked()
    assert pj_b.sh_transfer_ok(own, h)
    if dim == 2:
        # the one illegal 2-D halo: bare odd h=1 (effective even halo 0)
        assert not pj_b.sh_transfer_ok(own, 1)
    T = 3
    x = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    rc_u = pj_u.sh_residual_restrict(x, b, cols, tx, own, h)
    rc_b = pj_b.sh_residual_restrict(x, b, cols, tx, own, h)
    assert rc_b.shape == rc_u.shape
    np.testing.assert_allclose(
        np.asarray(rc_b), np.asarray(rc_u), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("dim,hc", [(2, 1), (2, 2), (3, 1), (3, 2)])
def test_sh_prolong_correct_blocked_matches_unblocked(dim, hc):
    own = 20
    ny3 = 31
    pj_u, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim, own=own, ny=ny3)
    pj_u.YBt = max(gs_e[-2], own + 4 * hc)
    pj_b, *_ = _sh_setup(dim, own=own, ny=ny3)
    pj_b.YBt = 16
    T, nx = 3, gs_e[-1]
    nxc, nc = (nx - 1) // 2, own // 2
    xo_s = (T, own) + gs_e[1:]
    ec_s = (
        (T, nc + 2 * hc, nxc) if dim == 2
        else (T, nc + 2 * hc, (ny3 - 1) // 2, nxc)
    )
    xo = jnp.asarray(rng.standard_normal(xo_s), jnp.float32)
    ec = jnp.asarray(rng.standard_normal(ec_s), jnp.float32)
    out_u = pj_u.sh_prolong_correct(xo, ec, tx, own, hc)
    out_b = pj_b.sh_prolong_correct(xo, ec, tx, own, hc)
    assert out_b.shape == out_u.shape
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_u), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_sh_fused_pre_matches_parts(dim):
    # The fused kernel's zero-init sweep is the same unblocked recurrence
    # as _smooth_call — bitwise — and its restrict tail the same chains as
    # sh_residual_restrict on that x.
    own, h = 6, 3
    pj, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim)
    b = jnp.asarray(rng.standard_normal((3,) + gs_e), jnp.float32)
    xe, rc = pj.sh_fused_pre(b, cols, tx, vm, own, h)
    x_ref = pj.smooth(None, b, cols, zero_init=True, vmask=vm)
    np.testing.assert_array_equal(np.asarray(xe), np.asarray(x_ref))
    rc_ref = pj.sh_residual_restrict(x_ref, b, cols, tx, own, h)
    np.testing.assert_array_equal(np.asarray(rc), np.asarray(rc_ref))


@pytest.mark.parametrize("dim", [2, 3])
def test_sh_fused_post_matches_parts(dim):
    from spacetime_tpu.ops.mg_pallas import _transfer_mats_np

    own, h = 6, 3
    hc = (h + 2) // 2
    pj, gs_e, omr, cols, tx, vm, rng = _sh_setup(dim)
    T, nx = 3, gs_e[-1]
    nxc, nc = (nx - 1) // 2, own // 2
    x = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    b = jnp.asarray(rng.standard_normal((T,) + gs_e), jnp.float32)
    ec_s = (T, nc + 2 * hc, nxc) if dim == 2 else (T, nc + 2 * hc, 3, nxc)
    ec = jnp.asarray(rng.standard_normal(ec_s), jnp.float32)
    out = pj.sh_fused_post(x, b, ec, cols, tx, vm, own, h, hc)
    Ux, Wx = _transfer_mats_np(nx)
    Af, Bf = np.asarray(ec) @ Ux.T, np.asarray(ec) @ Wx.T
    ny_e = gs_e[0]
    P = np.zeros((T,) + gs_e, np.float32)
    for j in range(ny_e):
        f = j - h
        cu, cw = f // 2 + hc, (f - 1) // 2 + hc
        if dim == 2:
            a = Af[:, cu] if 0 <= cu < Af.shape[1] else 0.0
            w_ = Bf[:, cw] if 0 <= cw < Bf.shape[1] else 0.0
            P[:, j] = 0.5 * (a + w_)
        else:
            ny, nyc = gs_e[1], (gs_e[1] - 1) // 2
            for fy in range(ny):
                cuy, cwy = fy // 2, (fy - 1) // 2
                a = (Af[:, cu, cuy]
                     if (0 <= cu < Af.shape[1] and 0 <= cuy < nyc) else 0.0)
                w_ = (Bf[:, cw, cwy]
                      if (0 <= cw < Bf.shape[1] and 0 <= cwy < nyc) else 0.0)
                P[:, j, fy] = 0.5 * (a + w_)
    ref = pj.smooth(x + jnp.asarray(P), b, cols, post=True, vmask=vm)
    # compare on the rows the halo contract keeps (edge rows contaminated
    # by design — the caller crops kw >= nu planes)
    nu = 2
    d = np.abs(np.asarray(out) - np.asarray(ref))[:, nu:-nu]
    rel = d.max() / np.abs(np.asarray(ref)).max()
    assert rel < 5e-5
