#!/bin/bash
# Twelfth TPU measurement queue (fresh VM after reboot killed
# tpu_catchup11 mid-wait): the time-to-1e-8 mixed-precision refinement
# measurement at 33.8 MDoF then the 2D flagship 135 MDoF, with the
# solve_refined lifetime fixes (staged f64 quadrature loads freed
# before the f32 inner solve). Steady in-process methodology
# (BASELINE.md). Guaranteed-fit shape first so a row is always
# recorded.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup12 $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

log "stage 15: refined to 1e-8, 33.8 MDoF then 135 MDoF"
timeout 10800 python - >results_tpu/refined_scale.log 2>&1 <<'EOF'
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
