#!/bin/bash
# Thirteenth TPU queue: waits for tpu_catchup12 (pass its PID as $1),
# then re-measures the L-shape AMG setup+solve at n=512 (25.2 MDoF)
# with the loose-tol eigsh spectral calibration (commit 3f9eb92): the
# previously recorded 1524 s host setup was 92% the tol=0 shift-invert
# eigsh, not aggregation. Expect setup in the tens of seconds; outer
# iterations should stay 18 and L2 ~1.288e-05 (lshape_amg.log).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup13 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup12 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

log "stage 16: L-shape AMG n=512 with fast spectral calibration"
timeout 7200 python - >results_tpu/lshape_amg_fastsetup.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
for n, lv in [(512, 7)]:
    sys_ = P1System.from_problem(prob, l_shape_mesh(n))
    t0 = time.perf_counter()
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="amg", rhs="device")
    mdof = (s.N + 1) * s.m / 1e6
    print(f"lshape amg n={n} lv={lv}: m={s.m} -> {mdof:.1f} MDoF, "
          f"setup {time.perf_counter()-t0:.1f}s (was 1524.1), "
          f"levels={[(l.m, l.fmt) for l in s.msmg.levels]}", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"lshape amg n={n} solve{i}: {time.perf_counter()-t0:.1f}s "
              f"wall, solve_seconds={r.solve_seconds:.2f}, "
              f"iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 16 rc=$?"

log "done"
