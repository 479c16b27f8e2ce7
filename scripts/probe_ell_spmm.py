"""Hardware probe: blocked-ELL SpMM kernels for the SA/AMG coarse levels
(ops/ell_pallas.py) at the production 1.05M-dof L-shape shapes.

First hardware exercise of the PrefetchScalarGridSpec SpMM family
(ops/spmv_pallas.py was previously interpret-tested only — round-4 verdict
weak #5). Probes, per ELL level of the n=1184 hierarchy (L1 m=175231 is
the one that matters — its gathers are 75-85% of every V-cycle,
results_tpu/r4_profile_amg1m.jsonl):

  1. compile + exactness of op_pair / interp / restrict vs the XLA gather
     forms on device;
  2. slope-timed speed of the full L1 V-cycle stage composition
     (pre-smooth + residual + post-smooth + both transfers) XLA vs Pallas;
  3. (br, bc) block-shape candidates.

Run bounded under the TPU lock:

    timeout 3600 python scripts/lockrun.py --tag ell_probe -- \
        timeout 3500 python scripts/probe_ell_spmm.py

One JSON line per measurement on stdout.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from spacetime_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from spacetime_tpu.fem import P1System, l_shape_mesh  # noqa: E402
from spacetime_tpu.models import get_problem  # noqa: E402
from spacetime_tpu.ops.ell_pallas import EllPallasLevel  # noqa: E402
from spacetime_tpu.ops.multigrid import SAMultiShiftMultigrid  # noqa: E402

DTYPE = jnp.float32


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_time(build, k1, k2, reps):
    def timed(k):
        g = build(k)
        t0 = time.perf_counter()
        float(g())
        log(f"    k={k}: compile+warm {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = timed(k1), timed(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1184)
    p.add_argument("--rows", type=int, default=33)
    p.add_argument("--k1", type=int, default=4)
    p.add_argument("--k2", type=int, default=20)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--levels", type=int, nargs="*", default=None,
                   help="level indices to probe (default: all ELL levels)")
    p.add_argument("--blocks", type=str, default="128x128,64x128",
                   help="comma-separated brxbc candidates")
    args = p.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    log(f"tunnel probe ok ({time.perf_counter() - t0:.1f}s)")

    t0 = time.perf_counter()
    sys_ = P1System.from_problem(get_problem("lshape2d"), l_shape_mesh(args.n))
    ms, _ = SAMultiShiftMultigrid.build(sys_.A, sys_.M, nu=2)
    log(f"setup {time.perf_counter() - t0:.1f}s: levels="
        f"{[(lv.m, lv.fmt) for lv in ms.levels]}")
    T = args.rows
    omega = np.concatenate([[0.0], np.geomspace(2.0, 4000.0, T - 1)])
    lps = ms.row_params(omega, DTYPE)
    rng = np.random.default_rng(0)

    ell_idx = [i for i, lv in enumerate(ms.levels) if lv.fmt == "ell"]
    if args.levels:
        ell_idx = [i for i in ell_idx if i in args.levels]
    cands = [tuple(map(int, s.split("x"))) for s in args.blocks.split(",")]

    for li in ell_idx:
        lev = ms.levels[li]
        lp = lps[li]
        m = lev.m
        x = jnp.asarray(rng.standard_normal((T, m)), DTYPE)
        b = jnp.asarray(rng.standard_normal((T, m)), DTYPE)

        # XLA reference: the full ELL-level V-cycle stage (pre-smooth +
        # residual + restrict; then interp + post-smooth). Device params
        # flow as jit ARGUMENTS (lp pytree) — closed-over device constants
        # are the documented 40x/compile-explosion footgun on this backend
        # (CLAUDE.md invariants), and the kernel candidates below carry GBs.
        def xla_stage(x, b, lp):
            y = ms._smooth(lev, lp, None, b, zero_init=True)
            r = b - ms._op(lev, lp, y)
            rc = ms._restrict(r, lp)
            y = y + ms._interp(rc * 0.5, lp)
            return ms._smooth(lev, lp, y, b, nu=ms.nu_post)

        def chain(stage, k, lpx):
            @jax.jit
            def f(x, b, lpx):
                def body(i, x):
                    return stage(x, b, lpx) * 1e-3
                return jax.lax.fori_loop(0, k, body, x)[0, 0]

            return lambda: f(x, b, lpx)

        per_xla = slope_time(
            lambda k: chain(xla_stage, k, lp), args.k1, args.k2, args.reps
        )
        log(f"L{li} XLA stage: {per_xla * 1e3:.2f} ms")
        print(json.dumps({"impl": "xla_stage", "level": li, "m": m,
                          "K": int(lev.eidx.shape[1]), "ms": per_xla * 1e3}),
              flush=True)
        ref = np.asarray(xla_stage(x, b, lp))

        for br, bc in cands:
            rec = {"impl": "ell_pallas", "level": li, "m": m,
                   "br": br, "bc": bc}
            try:
                t0 = time.perf_counter()
                pj = EllPallasLevel(lev, T, DTYPE, br=br, bc=bc)
                rec["nslots_op"] = pj.nslots_op
                rec["nslots_P"] = pj.nslots_P
                rec["nslots_R"] = pj.nslots_R
                rec["op_pair_MB"] = round(
                    (pj._bA.nbytes + pj._bM.nbytes) / 1e6
                )
                rec["convert_s"] = round(time.perf_counter() - t0, 1)
                lpp = dict(lp)
                lpp["ellv"] = pj.values(lev, DTYPE)
                log(f"L{li} ({br}x{bc}): nslots op={pj.nslots_op} "
                    f"P={pj.nslots_P} R={pj.nslots_R} "
                    f"pair={rec['op_pair_MB']} MB")

                def pl_stage(x, b, lpp):
                    plv = lpp["ellv"]
                    y = ms._smooth(lev, lpp, None, b, zero_init=True, pj=pj)
                    r = b - ms._op(lev, lpp, y, pj)
                    rc = pj.restrict(r, plv)
                    y = y + pj.interp(rc * 0.5, plv)
                    return ms._smooth(lev, lpp, y, b, nu=ms.nu_post, pj=pj)

                t0 = time.perf_counter()
                out = np.asarray(pl_stage(x, b, lpp))
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                err = float(
                    np.abs(out - ref).max() / np.abs(ref).max()
                )
                rec["max_rel_err_vs_xla"] = err
                if err > 1e-4:
                    rec["status"] = "MISMATCH"
                    print(json.dumps(rec), flush=True)
                    continue
                per = slope_time(
                    lambda k: chain(pl_stage, k, lpp),
                    args.k1, args.k2, args.reps,
                )
                rec["ms"] = per * 1e3
                rec["speedup_vs_xla"] = per_xla / per
                rec["status"] = "OK"
            except Exception as e:  # compile failures are data
                rec["status"] = "FAIL"
                rec["error"] = str(e)[:300]
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
