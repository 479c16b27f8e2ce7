#!/bin/bash
# Seventh TPU measurement queue: waits for tpu_catchup6.sh (pass its PID
# as $1), then measures the driver's headline metric — time-to-1e-8
# residual (BASELINE.json) — at flagship scale via mixed-precision
# iterative refinement (f32 mg inner PCG + f64 residuals), previously
# recorded only at cfg1/cfg2. Steady in-process methodology.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup7 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup6 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 12. 2D flagship 1025^2 x 128ts (135 MDoF), tol 1e-8 via refinement.
log "stage 12: 2D flagship refined to 1e-8"
timeout 10800 python - >results_tpu/refined_flagship.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
jax.config.update("jax_enable_x64", True)  # refined needs f64 residuals
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh(1024)),
               uniform_time_grid(7), dtype=jnp.float32, inner="mg",
               rhs="device")
print(f"2D flagship refined: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(2):
    t0 = time.perf_counter()
    r = s.solve_refined(tol=1e-8)
    print(f"refined solve{i}: {time.perf_counter()-t0:.1f}s wall, "
          f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
          f"rounds={getattr(r, 'rounds', None)}, "
          f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 12 rc=$?"

log "done"
