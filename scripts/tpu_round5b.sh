#!/bin/bash
# Round-5 TPU queue B:
#   1. iteration profile of the AMG-1M config WITH the blocked-ELL kernels
#      engaged (where do the remaining 13.0 s live?);
#   2. ELL block-shape probe at the dominant L1 (m=175231);
#   3. DS flat residual legs at-scale A/B on the nested-1184 production
#      config (round-5 verdict task 3 "done when": one at-scale refined
#      A/B log with identical round histories).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "stage 1: AMG-1M ELL-engaged iteration profile"
timeout 4800 python scripts/lockrun.py --tag r5_profile_ell -- \
  timeout 4700 python scripts/profile_iteration.py \
    --problem lshape2d --space-n 1184 --time-levels 5 --inner amg \
    >results_tpu/r5_profile_amg1m_ell.jsonl \
    2>results_tpu/r5_profile_amg1m_ell.err
log "stage 1 done rc=$?"

log "stage 2: ELL block-shape probe at L1"
timeout 3000 python scripts/lockrun.py --tag r5_ell_blocks -- \
  timeout 2900 python scripts/probe_ell_spmm.py --levels 1 \
    --blocks 128x128,256x128,512x128,256x256 \
    >results_tpu/r5_probe_ell_blocks.jsonl \
    2>results_tpu/r5_probe_ell_blocks.err
log "stage 2 done rc=$?"

log "stage 3: nested-1184 DS-vs-f64 refined legs A/B"
timeout 7200 python scripts/lockrun.py --tag r5_ds_nested -- \
  timeout 7100 python - >results_tpu/r5_ds_nested1m.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, refine_hierarchy, \
    uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver
from spacetime_tpu.solver.ds_legs import DSFlatResidual

prob = get_problem("lshape2d")
sys_n = P1System.from_problem(prob, refine_hierarchy(l_shape_mesh(74), 4))
s = HeatSolver(prob, sys_n, uniform_time_grid(5), dtype=jnp.float32,
               inner="mg", rhs="device")
assert DSFlatResidual.supported(s), "flat DS legs must support nested"
print(f"nested-1184: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF "
      f"flavor={s.mg_flavor}", flush=True)
# solve0 of each mode pays compile; steady rows are the alternating
# same-process repeats (CLAUDE.md measurement discipline)
for i in range(3):
    for legs in ("ds", "f64"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"nested[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 3 done rc=$?"
log "queue B complete"
