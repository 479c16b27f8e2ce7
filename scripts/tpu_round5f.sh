#!/bin/bash
# Round-5 TPU queue F: the 135-MDoF refinement-ceiling bakeoff (verdict
# task 6): post-DS, sweep the round-0 inner tolerance (traced in while
# mode - one executable serves the whole sweep) at the 2-D flagship.
# Doubles as the r5 DS-flagship regression row (the inner_tol=1e-5 legs).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "stage 1: flagship 2D refinement bakeoff"
timeout 7200 python scripts/lockrun.py --tag r5_flag_bakeoff -- \
  timeout 7100 python - >results_tpu/r5_flag2d_bakeoff.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh(1024)),
               uniform_time_grid(7), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"flagship: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
# Two passes: pass 0 pays compile + program load; pass 1 rows are the
# steady same-process measurements (CLAUDE.md discipline).
for i in range(2):
    for itol in (1e-5, 3e-5, 1e-4, 3e-4):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, inner_tol=itol, legs="ds")
        print(f"flag[itol={itol:g}] pass{i}: "
              f"wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 done rc=$?"
log "queue F complete"
