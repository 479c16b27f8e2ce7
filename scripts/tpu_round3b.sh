#!/bin/bash
# Round-3 follow-up TPU queue (launched under lockrun; waits for the main
# r3 queue's lock). Stages:
#   1. 2D flagship (135 MDoF) flex + asymmetric-cycle bakeoff vs the
#      2.44 s round-2 record
#   2. L-shape 25.2 MDoF full-accuracy default preset with DIA kernels
#      (XLA record 2.33 s @ 15) + AMG 25.2 MDoF with DIA kernels
#      (XLA record 3.25 s @ 25)
#   3. the ~1M-spatial-dof unstructured AMG row (native-resolution mesh)
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round3b $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 6 --interval 120 || exit 1
log "tunnel is up"

log "stage 1: 2D flagship flex/asymmetric bakeoff (135 MDoF)"
timeout 10800 python - >results_tpu/r3_flag2d_flex.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
sys_ = P1System.from_mesh(unit_square_mesh(1024))
grid = uniform_time_grid(7)
cfgs = [
    ("std_kx1", dict(pcg_variant="standard", mg_cycles_kx=1)),
    ("flex_kx1_nupost1", dict(pcg_variant="flex", mg_cycles_kx=1,
                              mg_nu_post=1)),
    ("flex_ky2kx1_nupost1", dict(pcg_variant="flex", mg_cycles=2,
                                 mg_cycles_kx=1, mg_nu_post=1)),
]
for tag, kw in cfgs:
    s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
                   rhs="device", **kw)
    print(f"{tag}: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
    for i in range(4):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"{tag} solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 rc=$?"

log "stage 2: L-shape DIA kernels — default preset + AMG"
timeout 10800 python - >results_tpu/r3_lshape_dia2.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, refine_hierarchy, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
grid = uniform_time_grid(7)
mesh_n = refine_hierarchy(l_shape_mesh(32), 4)
sys_n = P1System.from_problem(prob, mesh_n)
# full-accuracy defaults (XLA row: 2.33 s @ 15)
s = HeatSolver(prob, sys_n, grid, dtype=jnp.float32, inner="mg",
               rhs="device")
print(f"nested defaults: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(4):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"nested_default solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
# AMG at native resolution (XLA row: 3.25 s @ 25 with ky2+kx1)
sys_a = P1System.from_problem(prob, l_shape_mesh(512))
t0 = time.perf_counter()
s = HeatSolver(prob, sys_a, grid, dtype=jnp.float32, inner="amg",
               rhs="device", mg_cycles=2, mg_cycles_kx=1)
print(f"amg setup {time.perf_counter()-t0:.2f}s, "
      f"dia_kernels={[p is not None for p in (s._ms_pl.get('float32') or [])]}",
      flush=True)
for i in range(4):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"amg solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 2 rc=$?"

log "stage 3: 1.05M-spatial-dof unstructured AMG row"
timeout 10800 python - >results_tpu/r3_amg_1m.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
sys_ = P1System.from_problem(prob, l_shape_mesh(1184))
t0 = time.perf_counter()
s = HeatSolver(prob, sys_, uniform_time_grid(5), dtype=jnp.float32,
               inner="amg", rhs="device")
print(f"amg 1M setup {time.perf_counter()-t0:.1f}s: m={s.m} -> "
      f"{(s.N+1)*s.m/1e6:.1f} MDoF, levels="
      f"{[(l.m, l.fmt) for l in s.msmg.levels]}", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"amg_1m solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 3 rc=$?"

log "queue done"
