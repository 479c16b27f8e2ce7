#!/bin/bash
# Round-4 TPU queue, part H (after part G): nested-1184 with the step=640
# blocklist landed — full kernel engagement minus the faulting L1 family
# (L0 step=1280 + L2 step=384 + L3/L4 whole-axis). If stable, this is the
# best nested row at the 1.05M-dof mesh; if it crashes, the blocklist
# widens to the untested L2+/whole-axis families next round.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4h $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

log "stage: nested 1M, full engagement minus step=640"
timeout 4200 python - >results_tpu/r4_nested_1m_gated.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import (P1System, l_shape_mesh, refine_hierarchy,
                               uniform_time_grid)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
sys_n = P1System.from_problem(prob, refine_hierarchy(l_shape_mesh(74), 4))
s = HeatSolver(prob, sys_n, uniform_time_grid(5), dtype=jnp.float32,
               inner="mg", rhs="device")
for key, plist in s._ms_pl.items():
    for li, pj in enumerate(plist):
        if pj is not None:
            print(f"  dia L{li}: m={pj.m} bw={pj.bw} step={pj.step} "
                  f"HS={pj.HS} TB={pj.TB} MB={pj.MB}", flush=True)
    break
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested-gated] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage rc=$?"
log "queue H done"
