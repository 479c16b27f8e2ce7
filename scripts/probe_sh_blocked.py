"""Single-chip hardware probe of the BLOCKED sharded semi-fused transfer
kernels (round-5 verdict task 5): the blocked `lead=(own, h)` layouts of
ops/mg_pallas._residual_restrict_call / _prolong_correct_call at
production slab shapes, plus the blocked vmask smoother they compose with.

The sharded kernels are ordinary pallas_calls on local arrays — a 1-chip
probe exercises exactly the kernel family a real space-sharded mesh would
dispatch (the mesh only changes who produces the halo planes). The
round-3/4 fault class was the UNBLOCKED fused layout (faults at 255²+,
mg_pallas.MSPallasLevel.__init__) — this probe clears (or flags) the
blocked family so MSPallasLevel.sh_transfer_ok can key hardware
engagement on SH_BLOCKED_HW instead of interpret mode.

    timeout 3000 python scripts/lockrun.py --tag sh_probe -- \
        timeout 2900 python scripts/probe_sh_blocked.py

One JSON line per case: parity vs an XLA reference composition + steady
timing (3 dispatches). A worker fault kills the process — run last in a
queue.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spacetime_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spacetime_tpu.ops.mg_pallas import (  # noqa: E402
    MSPallasLevel, _transfer_mats_np,
)
from spacetime_tpu.ops.stencil import StencilOperator  # noqa: E402

DTYPE = jnp.float32


def _stencils(dim, gs_e):
    if dim == 2:
        disps = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
    else:
        disps = ((0, 0, 0), (1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                 (0, 0, 1), (0, 0, -1))
    wA = tuple([4.0] + [-1.0] * (len(disps) - 1))
    wM = tuple([0.5] + [0.1] * (len(disps) - 1))
    return (StencilOperator(disps, wA, gs_e),
            StencilOperator(disps, wM, gs_e))


def _op_ref(A_st, M_st, om, X):
    return A_st.apply(X) + om * M_st.apply(X)


def _pairs(M, st, n, ax):
    sl = [slice(None)] * M.ndim
    sl[ax] = slice(st, st + 2 * n)
    W = M[tuple(sl)]
    sh = W.shape[:ax] + (n, 2) + W.shape[ax + 1 :]
    return W.reshape(sh).sum(ax + 1)


def run_case(dim, own, h, nxy, T):
    rec = {"dim": dim, "own": own, "h": h, "nxy": nxy, "T": T}
    gs_e = (own + 2 * h, nxy) if dim == 2 else (own + 2 * h, nxy, nxy)
    A_st, M_st = _stencils(dim, gs_e)
    pj = MSPallasLevel(A_st, M_st, T, DTYPE, 2, interpret=False)
    rec.update(YB=pj.YB, YBt=pj.YBt, TBt=pj.TBt,
               blocked=bool(pj._sh_blocked()))
    if not pj._sh_blocked():
        rec["skip"] = "instance not blocked at this shape"
        print(json.dumps(rec), flush=True)
        return
    rng = np.random.default_rng(0)
    omr = np.linspace(0.5, 1.5, T)
    cols = MSPallasLevel.columns(
        type("L", (), {"cA": 4.0, "cM": 0.5, "gA": 8.0, "gM": 1.0})(),
        omr, DTYPE,
    )
    tx = pj.transfers(DTYPE)
    x = jnp.asarray(rng.standard_normal((T,) + gs_e), DTYPE)
    b = jnp.asarray(rng.standard_normal((T,) + gs_e), DTYPE)
    om = jnp.asarray(omr, DTYPE).reshape((T,) + (1,) * dim)

    # --- residual+restrict
    f_rr = jax.jit(
        lambda x, b: pj.sh_residual_restrict(x, b, cols, tx, own, h)
    )
    t0 = time.time()
    rc = jax.block_until_ready(f_rr(x, b))
    rec["rr_compile_s"] = round(time.time() - t0, 1)
    Ux, Wx = _transfer_mats_np(gs_e[-1])
    rr = np.asarray(b) - np.asarray(_op_ref(A_st, M_st, om, x))
    A_, B_ = rr @ Ux, rr @ Wx
    if dim == 3:
        nyc = (gs_e[1] - 1) // 2
        A_, B_ = _pairs(A_, 0, nyc, 2), _pairs(B_, 1, nyc, 2)
    A_, B_ = _pairs(A_, h, own // 2, 1), _pairs(B_, h + 1, own // 2, 1)
    ref = 0.5 * (A_ + B_)
    rec["rr_rel"] = float(
        np.abs(np.asarray(rc) - ref).max() / np.abs(ref).max()
    )
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_rr(x, b))
        ts.append(time.time() - t0)
    rec["rr_steady_s"] = round(float(np.median(ts)), 4)

    # --- prolong+correct
    hc = 1
    nc = own // 2
    nxc = (gs_e[-1] - 1) // 2
    ec_s = (
        (T, nc + 2 * hc, nxc) if dim == 2
        else (T, nc + 2 * hc, (nxy - 1) // 2, nxc)
    )
    xo = jnp.asarray(
        rng.standard_normal((T, own) + gs_e[1:]), DTYPE
    )
    ec = jnp.asarray(rng.standard_normal(ec_s), DTYPE)
    f_pc = jax.jit(lambda xo, ec: pj.sh_prolong_correct(xo, ec, tx, own, hc))
    t0 = time.time()
    out = jax.block_until_ready(f_pc(xo, ec))
    rec["pc_compile_s"] = round(time.time() - t0, 1)
    Af, Bf = np.asarray(ec) @ Ux.T, np.asarray(ec) @ Wx.T
    P = np.zeros((T, own) + gs_e[1:], np.float32)
    for f in range(own):
        cu, cw = f // 2 + hc, (f - 1) // 2 + hc
        if dim == 2:
            P[:, f] = 0.5 * (Af[:, cu] + Bf[:, cw])
        else:
            nyc = (nxy - 1) // 2
            for fy in range(nxy):
                cuy, cwy = fy // 2, (fy - 1) // 2
                a = Af[:, cu, cuy] if 0 <= cuy < nyc else 0.0
                w_ = Bf[:, cw, cwy] if 0 <= cwy < nyc else 0.0
                P[:, f, fy] = 0.5 * (a + w_)
    refp = np.asarray(xo) + P
    rec["pc_rel"] = float(
        np.abs(np.asarray(out) - refp).max() / np.abs(refp).max()
    )
    ts = []
    for _ in range(3):
        t0 = time.time()
        jax.block_until_ready(f_pc(xo, ec))
        ts.append(time.time() - t0)
    rec["pc_steady_s"] = round(float(np.median(ts)), 4)

    # --- blocked vmask smoother (the stage the semi path composes with)
    vm = np.ones((1,) + gs_e, np.float32)
    vm[:, :h] = 0.0
    vm[:, -1:] = 0.0
    vmj = jnp.asarray(vm)
    f_sm = jax.jit(
        lambda b: pj.smooth(None, b, cols, zero_init=True, vmask=vmj)
    )
    t0 = time.time()
    jax.block_until_ready(f_sm(b))
    rec["sm_compile_s"] = round(time.time() - t0, 1)
    rec["ok"] = True
    print(json.dumps(rec), flush=True)


def main():
    # 2-D production family: flagship 1023² split 2/4/8 ways (own = 512 /
    # 256 / 128) at the hardware halo h=2, plus the odd-h slice path; one
    # 3-D family (z-sharded 127³).
    cases = [
        (2, 512, 2, 1023, 33),
        (2, 256, 2, 1023, 33),
        (2, 128, 3, 1023, 33),
        (3, 64, 2, 127, 17),
    ]
    for dim, own, h, nxy, T in cases:
        run_case(dim, own, h, nxy, T)


if __name__ == "__main__":
    main()
