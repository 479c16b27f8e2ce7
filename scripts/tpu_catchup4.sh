#!/bin/bash
# Fourth TPU measurement queue: waits for tpu_catchup3.sh (pass its PID
# as $1), then measures varcoef3d at scale — the coefficient-robust
# weighted Galerkin-RAP multigrid path in 3D, which has only an n=4
# smoke test so far. Steady in-process methodology (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup4 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup3 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 8. varcoef3d at cfg3 scale (65^3 x 32ts = 8.3 MDoF).
log "stage 8: varcoef3d 65^3x32 (weighted Galerkin-RAP mg)"
timeout 7200 python - >results_tpu/varcoef3d_scale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("varcoef3d")
s = HeatSolver(prob, P1System.from_problem(prob, unit_cube_mesh(64)),
               uniform_time_grid(5), dtype=jnp.float32, inner="mg",
               rhs="device")
print(f"varcoef3d 65^3x32: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(2):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"varcoef3d solve{i}: {time.perf_counter()-t0:.1f}s wall, "
          f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
          f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}", flush=True)
EOF
log "stage 8 rc=$?"

log "done"
