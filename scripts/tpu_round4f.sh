#!/bin/bash
# Round-4 TPU queue, part F (after part E): PROPER nested-1184 crash
# bisection. Part D's attempt set mg_pallas_min_points after __init__,
# which is too late (params build inside the constructor) — the run
# repeated the full L0..L3 config and crashed identically (third time,
# MB choice ruled out: L0 at 40960 now). Here each config clears the
# param/kernel caches and rebuilds, so the kernel set actually varies:
#   A: kernels on L0 only  (the SA-stable configuration family)
#   B: kernels on L0+L1    (adds the bw=592 blocked family)
# Whichever config first reproduces the fault names the responsible
# level family; each config is its own subprocess so a crash doesn't
# take the other down.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4f $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

run_cfg() {  # $1 = min_points, $2 = tag
    timeout 4200 python - >"results_tpu/r4_nested_bisect_$2.log" 2>&1 <<EOF
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
# params are built in __init__ — rebuild with the bisected kernel gate
s.mg_pallas_min_points = $1
s._params_cache.clear()
s._ms_pl.clear()
s._ms_pl_kx.clear()
s._solve_jit_cache.clear()
s.params = s.params_for(jnp.float32)
for key, plist in s._ms_pl.items():
    for li, pj in enumerate(plist):
        if pj is not None:
            print(f"  dia L{li}: m={pj.m} bw={pj.bw} HS={pj.HS} "
                  f"TB={pj.TB} MB={pj.MB}", flush=True)
    break
for i in range(2):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested-$2] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
    log "config $2 rc=$?"
}

run_cfg 400000 L0only
run_cfg 100000 L0L1
log "queue F done"
