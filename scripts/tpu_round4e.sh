#!/bin/bash
# Round-4 TPU queue, part E (after part D): two cheap closers —
#   1. 3-D DS-legs refined A/B at 65^3 x 32 (8.3 MDoF): the DS residual
#      legs in the 15-point-stencil regime on hardware (2-D is measured;
#      the 3-D splits exercise the Veltkamp weight splitting)
#   2. capacity ladder step 1377^2 x 128 = 245 MDoF to shrink the
#      [211, 269) single-chip bracket
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4e $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

log "stage 1: 3D DS refined A/B at 8.3 MDoF"
timeout 4200 python - >results_tpu/r4_ds_3d.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth3d")
s = HeatSolver(prob, P1System.from_mesh(unit_cube_mesh(64)),
               uniform_time_grid(5), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles=1, mg_cycles_kx=1)
print(f"3d midscale: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    for legs in ("f64", "ds"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"3d[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 rc=$?"

log "stage 2: capacity 245 MDoF"
timeout 4200 python - >results_tpu/r4_cap_245m.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh(1376)),
               uniform_time_grid(7), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"capacity 245m: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"cap[245m] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 2 rc=$?"
log "queue E done"
