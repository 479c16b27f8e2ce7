#!/bin/bash
# Tenth TPU measurement queue: waits for tpu_catchup9.sh (pass its PID as
# $1), then measures the NEW smoothed-aggregation AMG inner
# (ops/multigrid.SAMultiShiftMultigrid, inner='amg') at the same L-shape
# shapes the other two unstructured inners were recorded at
# (results_tpu/lshape_scale.log cheb: 15 iters / 2.07 s at 3.2 MDoF,
# 17 iters / 38.6 s at 25.2 MDoF; results_tpu/lshape_nested_mg.log nested
# geometric mg) — completing the three-way unstructured-inner comparison.
# Here the mesh is used AT NATIVE RESOLUTION (no refinement record), the
# regime AMG exists for. Steady in-process methodology (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup10 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup9 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 14. Unstructured L-shape at scale, smoothed-aggregation AMG inner.
log "stage 14: unstructured L-shape at scale (AMG inner)"
timeout 10800 python - >results_tpu/lshape_amg.log 2>&1 <<'EOF'
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
    t0 = time.perf_counter()
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="amg", rhs="device")
    mdof = (s.N + 1) * s.m / 1e6
    lv_ms = [(l.m, l.fmt) for l in s.msmg.levels]
    print(f"lshape amg n={n} lv={lv}: m={s.m} -> {mdof:.1f} MDoF, "
          f"setup {time.perf_counter()-t0:.1f}s, levels={lv_ms}", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"lshape amg n={n} solve{i}: {time.perf_counter()-t0:.1f}s "
              f"wall, solve_seconds={r.solve_seconds:.2f}, "
              f"iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 14 rc=$?"

log "done"
