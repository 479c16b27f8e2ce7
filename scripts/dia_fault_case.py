"""One isolated test case for the wide-band multi-level DIA-Pallas worker
fault (round-4 crash class: results_tpu/r4_nested_bisect_*.log — kernels on
the m=1.05M step=1280 fine level alone are solve-stable, adding ANY second
engaged level (step 640 or 384) reproducibly kills the TPU worker at solve
dispatch; 5 crashes, trigger unknown).

This reproduces the kernel DISPATCH PATTERN with synthetic banded operators
(the fault is structural — offsets/blocking — not value-dependent), far
below the solve level, so one axis can be varied per run. Each case runs in
its OWN process (a faulted worker poisons the process); the orchestrator is
scripts/dia_fault_bisect.py.

    python scripts/dia_fault_case.py CASE

prints one JSON line {"case":..., "ok": true, ...} on success; a worker
fault kills the process (the orchestrator records rc/stderr).
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

from spacetime_tpu.ops.dia_pallas import DiaPallasLevel  # noqa: E402

DTYPE = jnp.float32


class _SynthLevel:
    """Duck-typed ops.multigrid level with synthetic banded (A, M): SPD-ish
    diagonally-dominant values; only the offset structure and m matter for
    the fault family."""

    fmt = "dia"

    def __init__(self, m: int, bw: int):
        self.m = m
        offs = sorted({0, 1, -1, bw - 1, -(bw - 1), bw, -bw})
        self.offA = tuple(offs)
        self.offM = tuple(offs)
        rng = np.random.default_rng(m)
        nd = len(offs)
        vals = 0.1 * rng.random((m, nd)) + 0.05
        center = offs.index(0)
        vals[:, center] = 4.0 + rng.random(m)
        self.Av = vals
        self.Mv = 0.25 * vals
        self.dA = vals[:, center].copy()
        self.dM = 0.25 * self.dA
        self.rsA = np.abs(vals).sum(axis=1)
        self.rsM = 0.25 * self.rsA


def make(m, bw, T, nu=2, mb=None):
    lev = _SynthLevel(m, bw)
    pj = DiaPallasLevel(lev, T, DTYPE, nu=nu)
    if mb is not None:
        pj.MB = mb
    omega = np.concatenate([[0.0], np.geomspace(2.0, 4000.0, T - 1)])
    cols = DiaPallasLevel.columns(lev, omega, DTYPE)
    vals = pj.values(lev, DTYPE)
    return pj, cols, vals


def stage(pj, x, b, cols, vals):
    y = pj.smooth(None, b, cols, vals, zero_init=True)
    r = pj.residual(y, b, cols, vals)
    return pj.smooth(y, r, cols, vals)


def main():
    case = sys.argv[1]
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 33
    t0 = time.time()
    float(jnp.ones((8, 8)).sum())  # tunnel probe
    rec = {"case": case, "T": T, "tunnel_s": round(time.time() - t0, 1)}

    # The round-4 faulting family: L0 m=1049025 bw=1184 (step 1280,
    # HS 2560), L1 m=261665 bw=592 (step 640, HS 1280).
    M0, BW0 = 1049025, 1184
    M1, BW1 = 261665, 592

    rng = np.random.default_rng(0)
    mk_xb = lambda m: (
        jnp.asarray(rng.standard_normal((T, m)), DTYPE),
        jnp.asarray(rng.standard_normal((T, m)), DTYPE),
    )

    def dispatch(fn, args, n=3):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        rec["compile_s"] = round(time.time() - t0, 1)
        ts = []
        for _ in range(n):
            t0 = time.time()
            jax.block_until_ready(fn(*args))
            ts.append(time.time() - t0)
        rec["steady_s"] = round(float(np.median(ts)), 4)

    if case in ("l0_only", "l1_only"):
        m, bw = (M0, BW0) if case == "l0_only" else (M1, BW1)
        pj, cols, vals = make(m, bw, T)
        rec.update(m=m, bw=bw, step=pj.step, HS=pj.HS, MB=pj.MB)
        x, b = mk_xb(m)
        f = jax.jit(lambda x, b, cols, vals: stage(pj, x, b, cols, vals))
        dispatch(f, (x, b, cols, vals))
    elif case.startswith("both"):
        # both families in ONE jitted program (the solve's dispatch shape)
        nu = 1 if case == "both_nu1" else 2
        mb1 = None
        if case == "both_mb_small":
            mb1 = 1280 * nu  # L1 MB = HS (smallest legal window)
        pj0, cols0, vals0 = make(M0, BW0, T, nu=nu)
        pj1, cols1, vals1 = make(M1, BW1, T, nu=nu, mb=mb1)
        rec.update(MB0=pj0.MB, HS0=pj0.HS, MB1=pj1.MB, HS1=pj1.HS, nu=nu)
        x0, b0 = mk_xb(M0)
        x1, b1 = mk_xb(M1)
        if case == "both_sep_jits":
            f0 = jax.jit(
                lambda x, b, c, v: stage(pj0, x, b, c, v)
            )
            f1 = jax.jit(
                lambda x, b, c, v: stage(pj1, x, b, c, v)
            )
            t0 = time.time()
            for _ in range(3):
                y0 = f0(x0, b0, cols0, vals0)
                jax.block_until_ready(y0)
                y1 = f1(x1, b1, cols1, vals1)
                jax.block_until_ready(y1)
            rec["compile_s"] = round(time.time() - t0, 1)
        else:
            def f(x0, b0, c0, v0, x1, b1, c1, v1):
                y0 = stage(pj0, x0, b0, c0, v0)
                y1 = stage(pj1, x1, b1, c1, v1)
                return y0, y1

            dispatch(
                jax.jit(f),
                (x0, b0, cols0, vals0, x1, b1, cols1, vals1),
            )
    elif case.startswith("custom:"):
        # custom:M:BW:MB — one kernel family alone with an explicit block
        # (MB=0 keeps the chooser's pick). Sweep outcome (r5_fault_sweep
        # .jsonl): the trigger tracks m, not MB — the step-640 family
        # faults alone at m=261665 for EVERY MB (2560..15360) and at
        # m=523329, step-1280 faults at m=261665, while m=1049025 is
        # stable for both; the earlier both_mb_small stability was a
        # combination effect, not an MB=HS·ν property.
        _, ms, bws, mbs = case.split(":")
        m, bw, mb = int(ms), int(bws), int(mbs)
        pj, cols, vals = make(m, bw, T, mb=(mb or None))
        rec.update(m=m, bw=bw, step=pj.step, HS=pj.HS, MB=pj.MB)
        x, b = mk_xb(m)
        f = jax.jit(lambda x, b, cols, vals: stage(pj, x, b, cols, vals))
        dispatch(f, (x, b, cols, vals))
    else:
        raise SystemExit(f"unknown case {case}")

    rec["ok"] = True
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
