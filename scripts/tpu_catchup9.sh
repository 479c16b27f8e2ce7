#!/bin/bash
# Ninth TPU measurement queue: re-runs the three stages lost to the VM
# restart — (11) folded-weights V-cycle stage split at the 3D flagship,
# (12) 2D flagship time-to-1e-8 via mixed-precision refinement,
# (13) nested-hierarchy-mg L-shape at scale (vs the recorded Chebyshev
# rows: 15 iters / 2.07 s at 3.2 MDoF, 17 iters / 38.6 s at 25.2 MDoF).
# Steady in-process methodology (BASELINE.md).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup9 $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 11. V-cycle stage split at the 3D flagship, folded weights.
log "stage 11: vcycle stage split, 3D flagship, folded weights"
timeout 7200 python scripts/profile_iteration.py --space-n 128 \
    --time-levels 6 --problem smooth3d --vcycle-stages \
    >results_tpu/vcycle_stages_folded.jsonl 2>results_tpu/vcycle_stages_folded.err
log "stage 11 rc=$?"

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

# 13. Unstructured L-shape at scale, nested-hierarchy multigrid inner.
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
