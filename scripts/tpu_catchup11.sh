#!/bin/bash
# Eleventh TPU measurement queue: waits for tpu_catchup10.sh (pass its
# PID as $1), then retries the time-to-1e-8 mixed-precision refinement
# measurements. The first flagship attempt (tpu_catchup9 stage 12) died
# RESOURCE_EXHAUSTED: solve_refined kept the staged (N+1,m) f64
# quadrature loads (~1.08 GB each at 135 MDoF) and the f64 residual
# alive across the f32 inner solve; the lifetime fixes in
# solver/heateq.solve_refined reclaim ~3.2 GB. Measures the
# guaranteed-fit 33.8 MDoF shape first so a row is recorded even if the
# flagship still does not fit. Steady in-process methodology
# (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup11 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup10 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 15. time-to-1e-8 via refinement: 513^2x128 (33.8 MDoF), then the 2D
#     flagship 1025^2x128 (135 MDoF) with the lifetime fixes.
log "stage 15: refined to 1e-8, 33.8 MDoF then 135 MDoF"
timeout 14400 python - >results_tpu/refined_scale.log 2>&1 <<'EOF'
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
for n, lv in [(512, 7), (1024, 7)]:
    s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh(n)),
                   uniform_time_grid(lv), dtype=jnp.float32, inner="mg",
                   rhs="device")
    print(f"refined n={n}: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF",
          flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8)
        print(f"refined n={n} solve{i}: {time.perf_counter()-t0:.1f}s "
              f"wall, solve_seconds={r.solve_seconds:.2f}, "
              f"iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
    del s
EOF
log "stage 15 rc=$?"

log "done"
