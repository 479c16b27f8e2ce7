"""Hardware probe: banded-DIA Pallas smoother kernels (ops/dia_pallas.py).

The flat-layout kernels take lane-axis shifted slices up to the mesh
bandwidth (~±513 lanes at the L-shape h=1/512) — a Mosaic lowering never
exercised by the structured kernels (whose lane taps are ±1). This probes,
at the production L-shape fine-level shape:

  1. compile (scoped VMEM / lowering) per (TB, MB) candidate;
  2. exactness vs the XLA smoother on device;
  3. slope-timed speed vs the XLA smoother+residual at the same shape.

Run under the TPU lock, bounded:

    timeout 3600 python scripts/lockrun.py --tag dia_probe -- \
        timeout 3500 python scripts/probe_dia_pallas.py

One JSON line per candidate on stdout; paste winners into the
solver gate notes (solver/heateq.py pallas_dia wiring).
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

from spacetime_tpu.fem import (  # noqa: E402
    P1System,
    l_shape_mesh,
    refine_hierarchy,
)
from spacetime_tpu.ops.dia_pallas import DiaPallasLevel  # noqa: E402
from spacetime_tpu.ops.multigrid import NestedMultiShiftMultigrid  # noqa: E402

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
    p.add_argument("--base-n", type=int, default=32)
    p.add_argument("--refines", type=int, default=4)
    p.add_argument("--rows", type=int, default=129)
    p.add_argument("--k1", type=int, default=8)
    p.add_argument("--k2", type=int, default=40)
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev}")
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    log(f"tunnel probe ok ({time.perf_counter() - t0:.1f}s)")

    mesh = refine_hierarchy(l_shape_mesh(args.base_n), args.refines)
    sys_ = P1System.from_mesh(mesh)
    ms, _ = NestedMultiShiftMultigrid.build(mesh, sys_.A, sys_.M, nu=2)
    lev = ms.levels[0]
    m = int(lev.dA.shape[0])
    T = args.rows
    log(f"L-shape base {args.base_n} +{args.refines} refines: m={m}, "
        f"{len(lev.offA)} diagonals, bw="
        f"{max(max(lev.offA), -min(lev.offA))}, T={T}")

    omega = np.concatenate([[0.0], np.geomspace(2.0, 4000.0, T - 1)])
    lps = ms.row_params(omega, DTYPE)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((T, m)), DTYPE)
    b = jnp.asarray(rng.standard_normal((T, m)), DTYPE)

    # XLA reference: one pre-smooth + residual + post-smooth (the V-cycle
    # fine-level stage composition), slope-timed.
    lp0 = lps[0]

    def xla_stage(x, b):
        y = ms._smooth(lev, lp0, None, b, zero_init=True)
        r = b - ms._op(lev, lp0, y)
        return ms._smooth(lev, lp0, y, r)

    def xla_chain(k):
        @jax.jit
        def f(x, b):
            def body(i, x):
                return xla_stage(x, b) * 1e-3  # keep bounded
            return jax.lax.fori_loop(0, k, body, x)[0, 0]

        return lambda: f(x, b)

    per_xla = slope_time(xla_chain, args.k1, args.k2, args.reps)
    log(f"XLA fine-stage (pre+res+post): {per_xla * 1e3:.2f} ms")
    print(json.dumps(
        {"impl": "xla_stage", "ms": per_xla * 1e3, "m": m, "T": T}
    ), flush=True)
    ref = np.asarray(xla_stage(x, b))

    pj = DiaPallasLevel(lev, T, DTYPE, nu=2)
    cands = [(pj.TB, pj.MB)]
    for c in [(8, pj.HS * 8), (4, pj.HS * 16), (8, pj.HS * 16)]:
        if c not in cands and c[1] < m:
            cands.append(c)
    cols = DiaPallasLevel.columns(lev, omega, DTYPE)
    vals = pj.values(lev, DTYPE)

    for TB, MB in cands:
        rec = {"impl": "dia_pallas", "TB": TB, "MB": MB, "HS": pj.HS}
        log(f"candidate TB={TB} MB={MB} (blocked={MB < m})")
        pj.TB, pj.MB = TB, MB
        try:
            def pl_stage(x, b):
                y = pj.smooth(None, b, cols, vals, zero_init=True)
                r = pj.residual(y, b, cols, vals)
                return pj.smooth(y, r, cols, vals)

            t0 = time.perf_counter()
            out = np.asarray(pl_stage(x, b))
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            err = float(np.abs(out - ref).max() / np.abs(ref).max())
            rec["max_rel_err_vs_xla"] = err
            if err > 1e-5:
                rec["status"] = "MISMATCH"
                print(json.dumps(rec), flush=True)
                continue

            def chain(k):
                @jax.jit
                def f(x, b):
                    def body(i, x):
                        return pl_stage(x, b) * 1e-3
                    return jax.lax.fori_loop(0, k, body, x)[0, 0]

                return lambda: f(x, b)

            per = slope_time(chain, args.k1, args.k2, args.reps)
            rec["ms"] = per * 1e3
            rec["speedup_vs_xla"] = per_xla / per
            rec["status"] = "OK"
        except Exception as e:  # compile failures are data
            rec["status"] = "FAIL"
            rec["error"] = str(e)[:300]
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
