"""Hardware probe: blocked-y fused Kronecker kernels on LARGE 3D grids.

DESIGN.md §8 / ops/kron_pallas.py keep blocked-y 3D kron kernels (and the
blocked-3D stab-fused variants) gated OFF in ``KronPallas.supported`` — the
in-kernel live set (_live_factor 24) was never measured on hardware at a
blocking-forcing 3D size, and Mosaic's actual scoped-VMEM requests have been
observed to exceed the per-block estimate ~4x at the budget edge (see
_pick_blocks).  This script produces exactly the measurements needed to flip
that gate:

  1. does each (TB, YB) candidate compile (scoped-VMEM within the 110 MB
     limit), and how long does the Mosaic compile take (grid-program count
     scaling — see BASELINE.md caveats)?
  2. does the kernel match the XLA stencil pair on device?
  3. how fast is it vs the XLA pair at the same shape (slope timing,
     bench.py methodology — chained fori, fixed overheads cancel)?

Run (the tunnel can hang — always bound it):

    timeout 7200 python scripts/probe_kron3d.py --space-n 128 --time-levels 5

Results print as one JSON line per candidate on stdout; paste the winners
into ops/kron_pallas.py's supported()/stab_ok comments when flipping the
gate.
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

from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid  # noqa: E402
from spacetime_tpu.fem.timegrid import time_matrices  # noqa: E402
from spacetime_tpu.ops import kron_pallas  # noqa: E402
from spacetime_tpu.ops.kron_pallas import KronPallas  # noqa: E402
from spacetime_tpu.ops.sparse import DiaMatrix  # noqa: E402
from spacetime_tpu.ops.stencil import StencilOperator, row_scale  # noqa: E402

DTYPE = jnp.float32


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def slope_time(f, args, k1, k2, reps):
    """Median per-link time of chained applications (bench.py method)."""

    def timed(k):
        g = f(k)
        t0 = time.perf_counter()
        float(g(*args))
        log(f"    k={k}: compile+warm {time.perf_counter() - t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(g(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = timed(k1), timed(k2)
    return (t2 - t1) / (k2 - k1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--space-n", type=int, default=128)
    p.add_argument("--time-levels", type=int, default=5)
    p.add_argument("--k1", type=int, default=16)
    p.add_argument("--k2", type=int, default=128)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--blocks", type=str, nargs="*", default=None,
        help="explicit TBxYB candidates, e.g. 4x32 8x16 (default: chooser "
        "pick + a spread)",
    )
    p.add_argument("--skip-stab", action="store_true")
    args = p.parse_args()

    dev = jax.devices()[0]
    log(f"device: {dev}")
    # Tiny-op tunnel probe: fail fast (under the caller's timeout) rather
    # than hang in the first real kernel.
    t0 = time.perf_counter()
    float(jnp.ones((8, 8)).sum())
    log(f"tunnel probe ok ({time.perf_counter() - t0:.1f}s)")

    system = P1System.from_mesh(unit_cube_mesh(args.space_n))
    grid = uniform_time_grid(args.time_levels)
    gs = tuple(system.mesh.grid_shape)
    T = grid.num_intervals
    log(f"grid {gs} x {T} ts = {(T + 1) * system.m / 1e6:.1f} MDoF f32")

    M_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.M), gs)
    A_st = StencilOperator.from_dia(DiaMatrix.from_csr(system.A), gs)
    h = time_matrices(grid)["h"]

    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((T + 1,) + gs), DTYPE)

    # XLA reference pair at this shape (the current production fallback).
    hh = row_scale(0.5 * h, gs, DTYPE)
    z = jnp.zeros((1,) + gs, DTYPE)

    # Contractive scale so chains stay bounded (cf. bench.py power iteration;
    # a fixed rough bound is fine here — only boundedness matters).
    X, rho = U, 1.0
    for _ in range(8):
        W = M_st.apply(X[1:] - X[:-1]) + hh * A_st.apply(X[1:] + X[:-1])
        VM, VA = M_st.apply(W), hh * A_st.apply(W)
        Y = jnp.concatenate([-VM + VA, z]) + jnp.concatenate([z, VM + VA])
        rho = float(jnp.max(jnp.abs(Y)))
        X = Y / rho
    scale = float(1.0 / np.sqrt(rho))
    log(f"rho≈{rho:.3e} -> scale {scale:.3e}")

    def xla_pair(V):
        DU, SU = V[1:] - V[:-1], V[1:] + V[:-1]
        W = scale * (M_st.apply(DU) + hh * A_st.apply(SU))
        VM, VA = M_st.apply(W), hh * A_st.apply(W)
        return scale * (
            jnp.concatenate([-VM + VA, z]) + jnp.concatenate([z, VM + VA])
        )

    def xla_chain(k):
        @jax.jit
        def f(V):
            V = jax.lax.fori_loop(0, k, lambda i, V: xla_pair(V), V)
            return V[(0,) * V.ndim]

        return f

    per_xla = slope_time(xla_chain, (U,), args.k1, args.k2, args.reps) / 2.0
    ref_out = np.asarray(xla_pair(U))
    log(f"XLA pair: {per_xla * 1e3:.3f} ms/apply")
    print(json.dumps({"impl": "xla", "ms_per_apply": per_xla * 1e3}), flush=True)

    if args.blocks:
        cands = [tuple(int(v) for v in b.split("x")) for b in args.blocks]
    else:
        tb0, yb0 = kron_pallas._pick_blocks(
            T, gs, jnp.dtype(DTYPE).itemsize
        )
        log(f"chooser pick: TB={tb0} YB={yb0}")
        cands = [(tb0, yb0)]
        for c in [(4, 32), (4, 16), (8, 16), (2, 48), (2, 64)]:
            if T % c[0] == 0 and c not in cands and c[1] < gs[-2]:
                cands.append(c)

    for TB, YB in cands:
        rec = {"impl": "pallas", "TB": TB, "YB": YB}
        log(f"candidate TB={TB} YB={YB}")
        try:
            kp = KronPallas(M_st, A_st, h, DTYPE, blocks=(TB, YB))
            t0 = time.perf_counter()
            out = np.asarray(
                kp.apply_BT(kp.apply_B(U, scale=scale), scale=scale)
            )
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            err = float(
                np.max(np.abs(out - ref_out)) / max(np.abs(ref_out).max(), 1e-30)
            )
            rec["max_rel_err_vs_xla"] = err
            if err > 1e-5:
                rec["status"] = "MISMATCH"
                print(json.dumps(rec), flush=True)
                continue

            def chain(k):
                @jax.jit
                def f(V, p):
                    def body(i, V):
                        return kp.apply_BT(
                            kp.apply_B(V, p, scale=scale), p, scale=scale
                        )

                    V = jax.lax.fori_loop(0, k, body, V)
                    return V[(0,) * V.ndim]

                return lambda: f(U, kp.params)

            per = slope_time(chain, (), args.k1, args.k2, args.reps)
        except Exception as e:  # compile/VMEM failures are data, not errors
            rec["status"] = "FAIL"
            rec["error"] = str(e)[:300]
            print(json.dumps(rec), flush=True)
            continue
        rec["ms_per_apply"] = per / 2.0 * 1e3
        rec["speedup_vs_xla"] = per_xla / (per / 2.0)
        rec["status"] = "OK"
        print(json.dumps(rec), flush=True)

        if not args.skip_stab:
            rec2 = {"impl": "pallas_stab", "TB": TB, "YB": YB}
            try:
                # stab variants keep their own chooser blocks; probe the
                # explicit candidate instead
                kp.TBs, kp.YBs = TB, YB
                B, W = kp.apply_B_stab(U)
                out2 = np.asarray(kp.apply_BT_stab(jnp.asarray(ref_out[:-1]), W))
                rec2["status"] = "OK(ran)"
                rec2["note"] = "correctness is interpret-tested; this probes compile+run only"
            except Exception as e:
                rec2["status"] = "FAIL"
                rec2["error"] = str(e)[:300]
            print(json.dumps(rec2), flush=True)


if __name__ == "__main__":
    main()
