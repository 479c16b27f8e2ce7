#!/bin/bash
# Round-4 TPU queue, part B (launched after part A's stage 3 delivered the
# factored-transfer A/B; replaces part A's remaining stages so the AMG
# follow-ups run at higher priority than capacity — VERDICT item ranking).
#   3b. DIA-Pallas block probe at the 1.05M-dof fine level (bw=1184 ->
#       HS=2560: the chooser's MB=15360 carries 25% halo overhead per
#       window; probe the HS*8/HS*16 family) + factored-AMG iteration
#       profile (which stage dominates post-factored-transfers)
#   4.  at-scale kappa rows: lshape-AMG 34.6 MDoF, varcoef3d 67.6 MDoF
#   5.  capacity ladder: 171 / 212 MDoF + the once-per-round 270 retry
#   6.  warm the bench shapes
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4b $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 4 --interval 120 || exit 1
log "tunnel is up"

log "stage 3b-i: DIA block probe at the 1M fine level"
timeout 4200 python scripts/probe_dia_pallas.py \
    --base-n 74 --refines 4 --rows 33 --k1 4 --k2 16 \
    >results_tpu/r4_probe_dia_1m.jsonl 2>results_tpu/r4_probe_dia_1m.err
log "stage 3b-i rc=$?"

log "stage 3b-ii: factored-AMG iteration profile"
timeout 4200 python scripts/profile_iteration.py \
    --problem lshape2d --space-n 1184 --time-levels 5 --inner amg \
    >results_tpu/r4_profile_amg1m.jsonl 2>results_tpu/r4_profile_amg1m.err
log "stage 3b-ii rc=$?"

log "stage 4: at-scale kappa rows (lshape-AMG, varcoef3d)"
timeout 9000 python - >results_tpu/r4_kappa_regimes.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from spacetime_tpu.fem import (P1System, unit_cube_mesh, l_shape_mesh,
                               uniform_time_grid)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver
from spacetime_tpu.solver.lanczos import lanczos_condition

cases = [
    ("lshape_amg_34M", "lshape2d",
     lambda: P1System.from_problem(get_problem("lshape2d"),
                                   l_shape_mesh(1184)), 5,
     {"inner": "amg"}),
    ("varcoef3d_67M", "varcoef3d",
     lambda: P1System.from_problem(get_problem("varcoef3d"),
                                   unit_cube_mesh(128)), 5,
     {"inner": "mg"}),
]
for tag, pname, mk_sys, lv, kw in cases:
    prob = get_problem(pname)
    sys_ = mk_sys()
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   rhs="device", **kw)
    p = s.params
    S_j = jax.jit(lambda U, p: s.apply_S(U, p))
    K_j = jax.jit(lambda R, p: s.apply_KX(R, p))
    t0 = time.perf_counter()
    est = lanczos_condition(lambda U: S_j(U, p), lambda R: K_j(R, p),
                            (s.N + 1,) + s.gs, dtype=jnp.float32)
    print(f"{tag}: {(s.N+1)*s.m/1e6:.1f} MDoF  lam=[{est.lam_min:.3f}, "
          f"{est.lam_max:.3f}]  kappa={est.condition:.2f}  "
          f"({time.perf_counter()-t0:.0f}s)", flush=True)
EOF
log "stage 4 rc=$?"

log "stage 5: capacity ladder (171 / 212 / 270 MDoF)"
cap_probe() {  # $1 = space-n, $2 = time-levels, $3 = tag
    timeout 4200 python - >"results_tpu/r4_cap_$3.log" 2>&1 <<EOF
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
s = HeatSolver(prob, P1System.from_mesh(unit_square_mesh($1)),
               uniform_time_grid($2), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"capacity $3: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"cap[$3] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
    local rc=$?
    log "capacity $3 rc=$rc"
    return $rc
}
cap_probe 1152 7 171m
if cap_probe 1280 7 212m; then
    : # 212 MDoF fits; the 270 retry next brackets the ceiling
else
    cap_probe 1216 7 191m
fi
cap_probe 1024 8 270m_retry

log "stage 7: nested fair row at 1,049,025 dofs (XLA kernels)"
# Part A's pallas attempt at this config CRASHED the TPU worker ("kernel
# fault" at solve dispatch — one of the deeper nested DIA-Pallas levels;
# the SA fine level with the same bw=1184 family ran fine). XLA-only here
# for the fair per-DoF number; the pallas retry runs LAST so a repeat
# crash costs nothing else.
timeout 4200 python - >results_tpu/r4_nested_1m.log 2>&1 <<'EOF'
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
t0 = time.perf_counter()
s = HeatSolver(prob, sys_n, uniform_time_grid(5), dtype=jnp.float32,
               inner="mg", rhs="device", pallas_kron=False)
print(f"[nested-xla] setup {time.perf_counter()-t0:.1f}s: m={s.m} -> "
      f"{(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested-xla] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 7 rc=$?"

log "stage 6: warm bench shapes"
timeout 3600 python scripts/warm_cache.py >results_tpu/r4_warm.log 2>&1
log "stage 6 rc=$?"

log "stage 8 (last, crash-tolerated): nested 1M with DIA-Pallas kernels"
timeout 4200 python - >results_tpu/r4_nested_1m_pallas.log 2>&1 <<'EOF'
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
_ = s.params  # build the per-dtype param/kernel wiring
for key, plist in s._ms_pl.items():
    for li, pj in enumerate(plist):
        if pj is not None:
            print(f"  dia L{li}: m={pj.m} bw={pj.bw} HS={pj.HS} "
                  f"TB={pj.TB} MB={pj.MB}", flush=True)
    break
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested-pallas] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 8 rc=$?"
log "queue B done"
