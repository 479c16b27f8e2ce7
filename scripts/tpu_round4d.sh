#!/bin/bash
# Round-4 TPU queue, part D (after part C): bisect the reproducible
# nested-1184 + DIA-Pallas worker crash, then warm the bench shapes with
# the CORRECT warm_cache invocation (part B's stage 6 passed no space_n).
#
# Crash facts so far (r4_amg_1m_ab.log tail, r4_nested_1m_pallas.log):
# the SA config (kernels on the m=1049025 fine level ONLY) solves
# repeatedly; the nested config (kernels on L0..L3: blocked bw=1184 and
# bw=592 families + whole-axis 16640- and 4352-lane levels) kills the TPU
# worker at dispatch, twice. This stage runs nested with
# mg_pallas_min_points=400000 so ONLY L0 carries kernels — if it runs,
# the fault lives in the deeper-level kernel family; if it crashes, in
# the L0 kernel under the nested solve graph.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4d $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

log "stage: nested 1M, kernels on L0 only (crash bisection)"
timeout 4200 python - >results_tpu/r4_nested_1m_l0only.log 2>&1 <<'EOF'
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
s.mg_pallas_min_points = 400_000  # L0 (m=1049025) only
_ = s.params
for key, plist in s._ms_pl.items():
    for li, pj in enumerate(plist):
        if pj is not None:
            print(f"  dia L{li}: m={pj.m} bw={pj.bw} HS={pj.HS} "
                  f"TB={pj.TB} MB={pj.MB}", flush=True)
    break
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested-L0only] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "bisection rc=$?"

log "stage: warm bench shapes (cfg2 + kron)"
timeout 3600 python scripts/warm_cache.py 128 --time-levels 6 \
    >results_tpu/r4_warm2.log 2>&1
log "warm rc=$?"
log "queue D done"
