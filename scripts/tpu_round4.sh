#!/bin/bash
# Round-4 TPU queue (run under scripts/lockrun.py — CLAUDE.md job
# discipline). Stages by round-3 verdict priority:
#   1. DS-vs-f64 residual-leg A/B at 513^2 x 128 (33.8 MDoF): leg norms
#      (sync via scalar fetch) + full refined solves, same process
#   2. 2D flagship (1025^2 x 128 = 135 MDoF) time-to-1e-8, DS vs f64 legs
#      — target <= 8.5 s (round-3 record 10.58 s with f64 legs)
#   3. 1.05M-spatial-dof L-shape AMG: factored vs gather SA transfers A/B
#      (same process) + a nested-hierarchy row at the SAME 1,049,025-dof
#      mesh (base 74 refined 4x) for the fair per-DoF target
#   4. at-scale kappa rows for the reworked regimes: lshape-AMG 34.6 MDoF,
#      varcoef3d 67.6 MDoF
#   5. single-chip capacity ladder: 1153^2x128 (171 MDoF), 1281^2x128
#      (212 MDoF), then the once-per-round 270 MDoF retry
#   6. warm the bench shapes (driver runs bench.py at the round boundary)
# NOTE: the compile cache lives in /root/.cache and the VM was recycled —
# every stage pays cold compiles this session.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4 $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 6 --interval 120 || exit 1
log "tunnel is up"

log "stage 1: DS leg A/B at 33.8 MDoF"
timeout 4800 python - >results_tpu/r4_ds_midscale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache, ensure_x64
enable_compile_cache()
ensure_x64()
import jax, jax.numpy as jnp, numpy as np
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver
from spacetime_tpu.solver.ds_legs import DSResidual

prob = get_problem("smooth2d")
sys_ = P1System.from_mesh(unit_square_mesh(512))
grid = uniform_time_grid(7)
s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"midscale: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)

# Raw leg timings. block_until_ready through the tunnel returns early
# (measured: 0.1 ms for an op that costs ~1 s), so each timed call ends
# in an in-graph scalar norm whose float() fetch is a true sync; both
# sides carry the same ~170 ms round-trip.
p64 = s.params_for(jnp.float64)
gL, gR, u0 = s.assemble_rhs_host(jnp.float64)
f = jax.jit(lambda a, b, c, p: s.rhs_device(a, b, c, p))(gL, gR, u0, p64)
f.block_until_ready()
rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((s.N + 1,) + s.gs) * 1e-3)
legnorm64 = jax.jit(
    lambda f, u, p: jnp.linalg.norm(f - s.apply_S(u, p)))
dsr = DSResidual(s)
dsp = dsr.params()
fp = jax.jit(DSResidual.split_f)(f)
jax.block_until_ready(fp)
legnorm_ds = jax.jit(
    lambda fp, u, p: jnp.linalg.norm(dsr.resid_pair(fp, u, p)[0]))
for name, fn in (
    ("f64", lambda: float(legnorm64(f, u, p64))),
    ("ds", lambda: float(legnorm_ds(fp, u, dsp))),
):
    fn()  # compile + warm
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        v = fn()
        ts.append(time.perf_counter() - t0)
    print(f"leg[{name}]: median {np.median(ts)*1e3:.1f} ms "
          f"(samples {['%.1f' % (t*1e3) for t in ts]}) norm={v:.6e}",
          flush=True)
# operator agreement on hardware
r64 = jax.jit(lambda f, u, p: f - s.apply_S(u, p))(f, u, p64)
rds = jax.jit(lambda fp, u, p: dsr.resid_pair(fp, u, p))(fp, u, dsp)
from spacetime_tpu.ops import ds as dsm
rel = float(jnp.linalg.norm(dsm.to_f64(rds) - r64)
            / jnp.linalg.norm(s.apply_S(u, p64)))
print(f"leg rel op err (hardware): {rel:.3e}", flush=True)
del r64, rds, f, fp, u, gL, gR, u0

# full refined solves, alternating (first solve of each mode pays jit)
for i in range(4):
    for legs in ("f64", "ds"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"refined[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 1 rc=$?"

log "stage 2: flagship 135 MDoF time-to-1e-8 with DS legs"
timeout 10800 python - >results_tpu/r4_ds_flagship.log 2>&1 <<'EOF'
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
sys_ = P1System.from_mesh(unit_square_mesh(1024))
grid = uniform_time_grid(7)
s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1)
print(f"flagship: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
# solve0 of each mode pays compile + per-process program load; steady
# rows are the same-process repeats (CLAUDE.md measurement discipline)
for i in range(4):
    for legs in ("ds", "f64"):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8, legs=legs)
        print(f"flag[{legs}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} "
              f"inner_iters={r.iterations} rounds={len(r.residuals)} "
              f"hist={['%.2e' % v for v in r.residuals]} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 2 rc=$?"

log "stage 3: 1.05M-dof AMG factored-transfer A/B + nested fair row"
timeout 10800 python - >results_tpu/r4_amg_1m_ab.log 2>&1 <<'EOF'
import gc, sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
import spacetime_tpu.ops.multigrid as mgm
from spacetime_tpu.fem import P1System, l_shape_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
sys_ = P1System.from_problem(prob, l_shape_mesh(1184))
for mode, flag in (("gather", False), ("factored", True)):
    mgm.SA_FACTORED_TRANSFERS = flag
    t0 = time.perf_counter()
    s = HeatSolver(prob, sys_, uniform_time_grid(5), dtype=jnp.float32,
                   inner="amg", rhs="device")
    print(f"[{mode}] setup {time.perf_counter()-t0:.1f}s: m={s.m} -> "
          f"{(s.N+1)*s.m/1e6:.1f} MDoF, levels="
          f"{[(l.m, l.fmt) for l in s.msmg.levels]}", flush=True)
    if mode == "gather":
        # DIA-Pallas engagement diagnostic (verdict task 2a): which levels
        # carry kernels, and at what block geometry vs the probed family
        for key, pls in s._ms_pl.items():
            for li, pj in enumerate(pls):
                if pj is not None:
                    print(f"  dia-pallas L{li}: m={pj.m} bw={pj.bw} "
                          f"step={pj.step} HS={pj.HS} TB={pj.TB} "
                          f"MB={pj.MB}", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"[{mode}] solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
              f"L2={r.l2_error}", flush=True)
    del s
    gc.collect()

# Nested-hierarchy row at the SAME 1,049,025-dof mesh (74 * 2^4 = 1184)
from spacetime_tpu.fem import refine_hierarchy
sys_n = P1System.from_problem(prob, refine_hierarchy(l_shape_mesh(74), 4))
t0 = time.perf_counter()
s = HeatSolver(prob, sys_n, uniform_time_grid(5), dtype=jnp.float32,
               inner="mg", rhs="device")
print(f"[nested] setup {time.perf_counter()-t0:.1f}s: m={s.m} -> "
      f"{(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[nested] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage 3 rc=$?"

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
    : # 212 MDoF fits; 270 retry next tells us the ceiling bracket
else
    cap_probe 1216 7 191m
fi
cap_probe 1024 8 270m_retry

log "stage 6: warm bench shapes"
timeout 3600 python scripts/warm_cache.py >results_tpu/r4_warm.log 2>&1
log "stage 6 rc=$?"
log "queue done"
