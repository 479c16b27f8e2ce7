#!/bin/bash
# Round-4 TPU queue, part A (run under scripts/lockrun.py — CLAUDE.md job
# discipline). Stages, by priority (round-3 verdict):
#   1. DS-vs-f64 residual-leg A/B at 513^2 x 128 (33.8 MDoF): raw leg
#      timings + full refined solves, same process
#   2. 2D flagship (1025^2 x 128 = 135 MDoF) time-to-1e-8 with DS legs —
#      target <= 8.5 s (round-3 record 10.58 s, f64 legs)
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4 $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 6 --interval 120 || exit 1
log "tunnel is up"

log "stage 1: DS leg A/B at 33.8 MDoF"
timeout 7200 python - >results_tpu/r4_ds_midscale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax, jax.numpy as jnp, numpy as np
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver
from spacetime_tpu.solver.ds_legs import DSResidual

prob = get_problem("smooth2d")
sys_ = P1System.from_mesh(unit_square_mesh(512))
grid = uniform_time_grid(7)
s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"midscale: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)

# raw leg timings (same data, same process)
p64 = s.params_for(jnp.float64)
gL, gR, u0 = s.assemble_rhs_host(jnp.float64)
f = jax.jit(lambda a, b, c, p: s.rhs_device(a, b, c, p))(gL, gR, u0, p64)
f.block_until_ready()
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((s.N + 1,) + s.gs) * 1e-3)
resid64 = jax.jit(lambda f, u, p: f - s.apply_S(u, p))
dsj = s._ds_resid()
assert dsj is not None
fp = dsj["split"](f)
for name, fn in (
    ("f64", lambda: resid64(f, u, p64)),
    ("ds", lambda: dsj["leg"](fp, u, dsj["params"])),
):
    out = fn()
    jax.block_until_ready(out)  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    print(f"leg[{name}]: median {np.median(ts)*1e3:.1f} ms "
          f"(samples {['%.1f' % (t*1e3) for t in ts]})", flush=True)
r64 = resid64(f, u, p64)
rds = dsj["leg"](fp, u, dsj["params"])
from spacetime_tpu.ops import ds as dsm
rel = float(jnp.linalg.norm(dsm.to_f64(rds) - r64)
            / jnp.linalg.norm(s.apply_S(u, p64)))
print(f"leg rel op err (hardware): {rel:.3e}", flush=True)
del r64, rds, f, fp, u, gL, gR, u0

# full refined solves, alternating (first solve of each mode pays jit)
for i in range(4):
    for legs in ("f64", "ds"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"refined[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 rc=$?"

log "stage 2: flagship 135 MDoF time-to-1e-8 with DS legs"
timeout 14400 python - >results_tpu/r4_ds_flagship.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
sys_ = P1System.from_mesh(unit_square_mesh(1024))
grid = uniform_time_grid(7)
s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"flagship: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
# solve0 of each mode pays compile + per-process program load; steady
# rows are the same-process repeats (CLAUDE.md measurement discipline)
for i in range(4):
    for legs in ("ds", "f64"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"flag[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 2 rc=$?"
log "done"
