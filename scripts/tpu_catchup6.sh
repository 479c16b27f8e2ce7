#!/bin/bash
# Sixth TPU measurement queue: waits for tpu_catchup5.sh (pass its PID as
# $1), then re-measures the flagship base configs with the folded
# per-row stencil weights (commit "Fold A/M stencil weights...") to
# isolate that change's effect vs the recorded 4.92 s (3D) / 3.16 s (2D)
# steady solves and the 32.99 ms V-cycle. Steady in-process methodology
# (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup6 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup5 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 10. Flagship steady solves, default settings, folded weights.
log "stage 10: flagship steady solves (folded weights)"
timeout 10800 python - >results_tpu/folded_flagship.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import (P1System, unit_cube_mesh, unit_square_mesh,
                               uniform_time_grid)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

for name, pname, mesh, lv in [
    ("3D 129^3x64", "smooth3d", unit_cube_mesh(128), 6),
    ("2D 1025^2x128", "smooth2d", unit_square_mesh(1024), 7),
]:
    prob = get_problem(pname)
    s = HeatSolver(prob, P1System.from_mesh(mesh), uniform_time_grid(lv),
                   dtype=jnp.float32, inner="mg", rhs="device")
    print(f"{name}: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"{name} solve{i}: {time.perf_counter()-t0:.1f}s wall, "
              f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 10 rc=$?"

# 11. V-cycle stage split at the 3D flagship, folded weights.
log "stage 11: vcycle stage split, 3D flagship, folded weights"
timeout 7200 python scripts/profile_iteration.py --space-n 128 \
    --time-levels 6 --problem smooth3d --vcycle-stages \
    >results_tpu/vcycle_stages_folded.jsonl 2>results_tpu/vcycle_stages_folded.err
log "stage 11 rc=$?"

log "done"
