#!/bin/bash
# Fifth TPU measurement queue: waits for tpu_catchup4.sh (pass its PID as
# $1), then measures the K_Y-cycle reduction presets at the flagship
# shapes. CPU validation (small 2D/3D): mg_cycles=2 leaves iteration
# counts and L2 errors unchanged; combined with the one-stronger-cycle
# K_X preset the 3D count rises by 1. Steady in-process methodology
# (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup5 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup4 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 9. Flagship steady solves with mg_cycles (K_Y) reduced 3 -> 2, alone
#    and combined with the K_X speed preset; 2D flagship with the same.
log "stage 9: flagship K_Y-cycle presets"
timeout 10800 python - >results_tpu/ky_cycles_scale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import (P1System, unit_cube_mesh, unit_square_mesh,
                               uniform_time_grid)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

runs = [
    ("3D ky2", "smooth3d", dict(mg_cycles=2)),
    ("3D ky2+kx1nu3", "smooth3d",
     dict(mg_cycles=2, mg_cycles_kx=1, mg_nu_kx=3)),
    ("2D ky2", "smooth2d", dict(mg_cycles=2)),
]
for name, pname, kw in runs:
    prob = get_problem(pname)
    if pname == "smooth3d":
        sys_ = P1System.from_mesh(unit_cube_mesh(128))
        grid = uniform_time_grid(6)
    else:
        sys_ = P1System.from_mesh(unit_square_mesh(1024))
        grid = uniform_time_grid(7)
    s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
                   rhs="device", **kw)
    print(f"{name}: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"{name} solve{i}: {time.perf_counter()-t0:.1f}s wall, "
              f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 9 rc=$?"

log "done"
