#!/bin/bash
# Third TPU measurement queue: waits for tpu_catchup2.sh (pass its PID as
# $1), then measures the one path with no at-scale hardware row yet — the
# unstructured L-shape solve (blocked-ELL SpMV + Chebyshev polynomial
# inner solves), first at ~3 MDoF then ~13 MDoF. Steady in-process
# methodology as the flagship rows (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup3 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup2 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 7. Unstructured at scale: L-shape red-refined, cheb inner, steady
#    in-process second-solve timing.
log "stage 7: unstructured L-shape at scale (cheb inner)"
timeout 7200 python - >results_tpu/lshape_scale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
for n, lv in [(256, 6), (512, 7)]:
    sys_ = P1System.from_problem(prob, l_shape_mesh(n))
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="cheb", rhs="device")
    mdof = (s.N + 1) * s.m / 1e6
    print(f"lshape n={n} lv={lv}: m={s.m} -> {mdof:.1f} MDoF, "
          f"cheb spec={getattr(s, '_cheb_spec', None)}", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"lshape n={n} solve{i}: {time.perf_counter()-t0:.1f}s wall, "
              f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}", flush=True)
EOF
log "stage 7 rc=$?"

log "done"
