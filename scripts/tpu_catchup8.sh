#!/bin/bash
# Eighth TPU measurement queue: waits for tpu_catchup7.sh (pass its PID
# as $1), then measures the NEW nested unstructured multigrid
# (ops/multigrid.NestedMultiShiftMultigrid, fem.refine_hierarchy) at the
# same L-shape shapes the Chebyshev inner was recorded at
# (results_tpu/lshape_scale.log: 15 iters / 2.07 s at 3.2 MDoF,
# 17 iters / 38.6 s at 25.2 MDoF — K_Y's degree-935 polynomial is the
# cost of having no hierarchy). Steady in-process methodology
# (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup8 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup7 pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 13. Unstructured L-shape at scale, nested-hierarchy multigrid inner.
#     refine_hierarchy(l_shape_mesh(32), r) reproduces the l_shape_mesh(n)
#     vertex sets (red refinement of the structured L-mesh) while
#     recording the nested-P1 chain: 48641/195585 interior dofs = the
#     cheb rows' n=256/n=512 shapes; coarsest level 705 (dense solves).
log "stage 13: unstructured L-shape at scale (nested mg inner)"
timeout 10800 python - >results_tpu/lshape_nested_mg.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, refine_hierarchy, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
for base_n, refines, lv in [(32, 3, 6), (32, 4, 7)]:
    mesh = refine_hierarchy(l_shape_mesh(base_n), refines)
    sys_ = P1System.from_problem(prob, mesh)
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="mg", rhs="device")
    assert type(s.msmg).__name__ == "NestedMultiShiftMultigrid", s.inner
    mdof = (s.N + 1) * s.m / 1e6
    nlev = len(s.msmg.levels)
    print(f"lshape nested r={refines} lv={lv}: m={s.m} -> {mdof:.1f} MDoF, "
          f"{nlev} mg levels", flush=True)
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"lshape nested r={refines} solve{i}: "
              f"{time.perf_counter()-t0:.1f}s wall, "
              f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
              f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}, "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 13 rc=$?"

log "done"
