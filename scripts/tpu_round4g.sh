#!/bin/bash
# Round-4 TPU queue, part G: capacity bracket refinement. Part E's
# 1376 pick broke the mg hierarchy (the 86->43 halving crashes the
# transfer — CPU-verified family rule: every used halving must stay
# even; 88/84 fine, 86/172 break). Valid steps: 1408 = 2^7*11 ->
# 256.1 MDoF (brackets against the 269 OOM); fallback 1344 = 2^6*21 ->
# 233.4 MDoF if 256 exhausts.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4g $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

cap_probe() {  # $1 = space-n, $2 = tag
    timeout 4200 python - >"results_tpu/r4_cap_$2.log" 2>&1 <<EOF
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh($1)),
               uniform_time_grid(7), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"capacity $2: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"cap[$2] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
    local rc=$?
    log "capacity $2 rc=$rc"
    return $rc
}

if cap_probe 1408 256m; then
    : # 256 MDoF fits -> ceiling bracket narrows to [256, 269)
else
    cap_probe 1344 233m
fi
log "queue G done"
