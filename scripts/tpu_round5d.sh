#!/bin/bash
# Round-5 TPU queue D: the 3-D flagship DS-legs row (verdict task 4):
# 129³×64ts = 133 MDoF refined solve, ds vs f64 legs, 3 alternating
# steady pairs (the r4_ds_flagship.log protocol). Record preset
# mg_cycles=1 / mg_cycles_kx=1 (r3_flag3d_flex.log, 3.40 s plain solve).
# Budget: ~40 min cold compile + 330-450 s per-process program load.
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "stage 1: 3-D flagship DS A/B"
timeout 10800 python scripts/lockrun.py --tag r5_ds_3dflag -- \
  timeout 10700 python - >results_tpu/r5_ds_3d_flagship.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth3d")
s = HeatSolver(prob, P1System.from_mesh(unit_cube_mesh(128)),
               uniform_time_grid(6), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles=1, mg_cycles_kx=1)
print(f"3d flagship: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    for legs in ("ds", "f64"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"3dflag[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 done rc=$?"
log "queue D complete"
