"""Probe the semi-fused V-cycle transfer kernels at the 3D flagship shape.

The blocked-3D fine level runs separate smooth/residual kernels + XLA
separated-form transfers (19.4 ms/cycle for the transfer pair at 133 MDoF,
at the copy ceiling but 5x the single-pass byte minimum). The semi-fused
kernels (ops/mg_pallas residual_restrict / prolong_correct) do each
transfer fused with its adjacent op in one pass. This measures, at the
fine-level shape (T=65, 127**3 f32):

  pl_pair    pallas residual_restrict + prolong_correct
  xla_pair   XLA (residual, restrict) + (interp, add)  [current solve path]
  mix_rr     pallas rr + XLA prolong+correct  (attributes the split)
  mix_pc     XLA residual+restrict + pallas pc

plus max|err| vs the XLA pair on a slab. Compile failure of a variant is
recorded and skipped (Mosaic VMEM/compile walls are exactly what this
probes). Usage: python scripts/probe_semi_transfer.py --space-n 128
"""

import argparse
import json
import sys
import time
import traceback

sys.path.insert(0, ".")

from spacetime_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--space-n", type=int, default=128)
    ap.add_argument("--time-n", type=int, default=65)
    ap.add_argument("--k1", type=int, default=8)
    ap.add_argument("--k2", type=int, default=40)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (tiny shapes only)")
    args = ap.parse_args()

    from spacetime_tpu.ops.mg_pallas import MSPallasLevel
    from spacetime_tpu.ops.multigrid import MultiShiftMultigrid

    T = args.time_n
    log(f"building MG hierarchy at {args.space_n}^3 ...")
    msmg, _ = MultiShiftMultigrid.build(3, args.space_n, nu=2)
    lev = msmg.levels[0]
    gs = (args.space_n - 1,) * 3
    rng = np.random.default_rng(0)
    omega = np.abs(rng.standard_normal(T)) * 10

    pj = MSPallasLevel(
        lev.A_st, lev.M_st, T, jnp.float32, 2, interpret=args.interpret
    )
    log(f"smoother blocks (TB,YB)=({pj.TB},{pj.YB}); "
        f"transfer blocks (TBt,YBt)=({pj.TBt},{pj.YBt}); "
        f"fused_ok={pj.fused_ok} semi_ok={pj.semi_ok}")
    params = {
        "cols": MSPallasLevel.columns(lev, omega, jnp.float32),
        "tx": pj.transfers(jnp.float32),
        "lp": msmg.row_params(omega, jnp.float32)[0],
    }
    X = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    B = jnp.asarray(rng.standard_normal((T,) + gs), jnp.float32)
    nc = lev.n // 2

    def rr_pl(V, b, p):
        return pj.residual_restrict(V, b, p["cols"], p["tx"])

    def rr_xla(V, b, p):
        return msmg._restrict(b - msmg._op(lev, p["lp"], V), nc)

    def pc_pl(V, ec, p):
        return pj.prolong_correct(V, ec, p["tx"])

    def pc_xla(V, ec, p):
        return V + msmg._interp(ec, nc)

    variants = {
        "xla_pair": (rr_xla, pc_xla),  # first: the accuracy reference
        "pl_pair": (rr_pl, pc_pl),
        "mix_rr": (rr_pl, pc_xla),
        "mix_pc": (rr_xla, pc_pl),
    }

    # stage-wise accuracy vs XLA, once (scaled max error; expect the
    # bf16x2 transfer-matmul split level, ~3e-6 measured on CPU interpret)
    try:
        rc_ref = np.asarray(rr_xla(X, B, params), np.float64)
        rc_pl = np.asarray(rr_pl(X, B, params), np.float64)
        ec = jnp.asarray(rc_ref, jnp.float32)
        pc_ref = np.asarray(pc_xla(X, ec, params), np.float64)
        pc_out = np.asarray(pc_pl(X, ec, params), np.float64)
        print(json.dumps({
            "check": "stage_errors",
            "rr_scaled_err": float(f"{np.max(np.abs(rc_pl - rc_ref)) / np.max(np.abs(rc_ref)):.3e}"),
            "pc_scaled_err": float(f"{np.max(np.abs(pc_out - pc_ref)) / np.max(np.abs(pc_ref)):.3e}"),
        }), flush=True)
    except Exception:
        log(traceback.format_exc())
        print(json.dumps({"check": "stage_errors", "error": True}), flush=True)

    def composite(rr, pc):
        def f(V, b, p):
            return pc(V, rr(V, b, p), p)
        return f

    def slope(op):
        def chain(k):
            @jax.jit
            def f(V, b, p):
                V = jax.lax.fori_loop(
                    0, k, lambda i, V: 0.5 * op(V, b, p), V
                )
                return V[0, 0, 0, 0]
            return f

        def timed(f):
            t0 = time.perf_counter()
            float(f(X, B, params))
            log(f"  compile+warm: {time.perf_counter() - t0:.1f}s")
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(f(X, B, params))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t2 = timed(chain(args.k1)), timed(chain(args.k2))
        return (t2 - t1) / (args.k2 - args.k1)

    for name, (rr, pc) in variants.items():
        log(f"[{name}]")
        try:
            sec = slope(composite(rr, pc))
            print(json.dumps(
                {"variant": name, "ms": round(sec * 1e3, 4)}
            ), flush=True)
        except Exception:
            log(traceback.format_exc())
            print(json.dumps({"variant": name, "error": True}), flush=True)


if __name__ == "__main__":
    main()
