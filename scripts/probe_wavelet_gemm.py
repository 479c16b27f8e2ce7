"""Probe variants of the dense-W wavelet GEMM at flagship shapes.

The per-component split (BASELINE.md) shows the wavelet GEMM pair at
41 ms/iter at the 3D flagship — ~26 GB/s effective against the measured
334 GB/s platform copy ceiling. W only appears inside the preconditioner
K_X (never in B, K_Y, or the RHS), so precision below HIGHEST is
admissible if outer iteration counts hold. This probes:

  flat_highest   current solver path: reshape to (N+1, m), 6-pass HIGHEST
  flat_high      3-pass HIGH (~f32-accurate; error ~2^-24-ish per element)
  flat_default   1-pass bf16 (floor; likely too coarse for the shifts)
  grid_high      dot_general on the (N+1, *gs) grid layout (no reshape)
  pair_*         the full W' then W round trip (what an iteration pays)

Usage: python scripts/probe_wavelet_gemm.py --space-n 128 --time-levels 6 --dim 3
"""

import argparse
import sys
import time

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
    ap.add_argument("--time-levels", type=int, default=6)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--k1", type=int, default=16)
    ap.add_argument("--k2", type=int, default=80)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from spacetime_tpu.fem.timegrid import uniform_time_grid
    from spacetime_tpu.ops.wavelets import build_wavelet_transform

    grid = uniform_time_grid(args.time_levels)
    wt = build_wavelet_transform(grid)
    N1 = grid.num_nodes
    gs = (args.space_n - 1,) * args.dim
    m = int(np.prod(gs))
    Wd = wt.dense()
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((N1,) + gs), jnp.float32)
    log(f"W ({N1}x{N1}) x state {(N1,) + gs} = {N1 * m / 1e6:.1f} MDoF")

    P = jax.lax.Precision
    params = {
        "W": jnp.asarray(Wd, jnp.float32),
        "WT": jnp.asarray(Wd.T, jnp.float32),
    }

    def flat(prec):
        def op(V, p):
            f = V.reshape(V.shape[0], -1)
            return jnp.dot(p["W"], f, precision=prec).reshape(V.shape)
        return op

    def grid_dg(prec):
        def op(V, p):
            return jax.lax.dot_general(
                p["W"], V, (((1,), (0,)), ((), ())), precision=prec)
        return op

    def pair(prec):
        def op(V, p):
            f = V.reshape(V.shape[0], -1)
            c = jnp.dot(p["WT"], f, precision=prec)
            return jnp.dot(p["W"], c, precision=prec).reshape(V.shape)
        return op

    variants = {
        "flat_highest": flat(P.HIGHEST),
        "flat_high": flat(P.HIGH),
        "flat_default": flat(P.DEFAULT),
        "grid_high": grid_dg(P.HIGH),
        "grid_highest": grid_dg(P.HIGHEST),
        "pair_highest": pair(P.HIGHEST),
        "pair_high": pair(P.HIGH),
    }

    # accuracy vs f64 reference on a thin slab (host, cheap)
    Xs = np.asarray(X[:, : min(gs[0], 8)], np.float64).reshape(N1, -1)
    ref = Wd @ Xs

    scale = 1.0 / max(abs(float(np.max(ref))), 1.0)

    def slope(op):
        c = jnp.float32(scale)

        def chain(k):
            @jax.jit
            def f(V, p):
                V = jax.lax.fori_loop(0, k, lambda i, V: c * op(V, p), V)
                return V[(0,) * V.ndim]
            return f

        def timed(f):
            t0 = time.perf_counter()
            float(f(X, params))
            log(f"  compile+warm: {time.perf_counter() - t0:.1f}s")
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(f(X, params))
                ts.append(time.perf_counter() - t0)
            return float(np.median(ts))

        t1, t2 = timed(chain(args.k1)), timed(chain(args.k2))
        return (t2 - t1) / (args.k2 - args.k1)

    import json
    for name, op in variants.items():
        log(f"[{name}]")
        sec = slope(op)
        # element accuracy on the slab
        got = np.asarray(
            op(X, params)[:, : min(gs[0], 8)], np.float64
        ).reshape(N1, -1)
        if name.startswith("pair"):
            refv = Wd @ (Wd.T @ Xs)
        else:
            refv = ref
        rel = float(np.max(np.abs(got - refv)) / np.max(np.abs(refv)))
        gb = X.size * 4 * (4 if name.startswith("pair") else 2) / 1e9
        print(json.dumps({
            "variant": name,
            "ms": round(sec * 1e3, 4),
            "eff_gbps": round(gb / sec, 1),
            "max_rel_err": float(f"{rel:.3e}"),
        }), flush=True)


if __name__ == "__main__":
    main()
