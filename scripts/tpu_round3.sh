#!/bin/bash
# Round-3 TPU queue (run under scripts/lockrun.py — CLAUDE.md job
# discipline). Stages, by priority:
#   1. banded-DIA Pallas kernel probe at the L-shape fine-level shape
#   2. L-shape 25.2 MDoF same-process A/B: XLA vs DIA-Pallas V-cycles
#   3. 3D flagship (129^3 x 64 = 133 MDoF) flex-PCG bakeoff vs the 3.43 s
#      round-2 record (asymmetric V(2,1) cycles now admissible)
#   4. 2D flagship (1025^2 x 128 = 135 MDoF) time-to-1e-8 with the round
#      schedule (+ kx=1 preset) — target <10 s (was 15.33)
#   5. at-scale kappa(K_X S) Lanczos rows (2D/3D flagship, L-shape)
#   6. single-chip capacity: compiled memory analysis at 135/270 MDoF
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round3 $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 6 --interval 120 || exit 1
log "tunnel is up"

log "stage 1: DIA-Pallas kernel probe (L-shape fine level)"
timeout 3600 python scripts/probe_dia_pallas.py \
    >results_tpu/r3_probe_dia.jsonl 2>results_tpu/r3_probe_dia.err
log "stage 1 rc=$?"

log "stage 2: L-shape 25.2 MDoF A/B (XLA vs DIA-Pallas)"
timeout 7200 python - >results_tpu/r3_lshape_dia_ab.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, refine_hierarchy, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
mesh = refine_hierarchy(l_shape_mesh(32), 4)
sys_ = P1System.from_problem(prob, mesh)
grid = uniform_time_grid(7)
for tag, pk in (("xla", False), ("dia_pallas", "auto")):
    s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
                   rhs="device", mg_cycles=2, mg_cycles_kx=1,
                   pallas_kron=pk)
    print(f"{tag}: m={s.m} -> {(s.N+1)*s.m/1e6:.1f} MDoF, "
          f"dia_kernels={[p is not None for p in (s._ms_pl.get('float32') or [])]}",
          flush=True)
    for i in range(4):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"{tag} solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 2 rc=$?"

log "stage 3: 3D flagship flex-PCG bakeoff (133 MDoF)"
timeout 14400 python - >results_tpu/r3_flag3d_flex.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth3d")
sys_ = P1System.from_mesh(unit_cube_mesh(128))
grid = uniform_time_grid(6)
cfgs = [
    ("std_ky1kx1", dict(pcg_variant="standard", mg_cycles=1, mg_cycles_kx=1)),
    ("flex_ky1kx1", dict(pcg_variant="flex", mg_cycles=1, mg_cycles_kx=1)),
    ("flex_ky1kx1_nupost1", dict(pcg_variant="flex", mg_cycles=1,
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
log "stage 3 rc=$?"

log "stage 4: 2D flagship time-to-1e-8 (round schedule, 135 MDoF)"
timeout 10800 python - >results_tpu/r3_refined_flagship.log 2>&1 <<'EOF'
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
for tag, kw in (("defaults", {}), ("kx1", dict(mg_cycles_kx=1))):
    s = HeatSolver(prob, sys_, grid, dtype=jnp.float32, inner="mg",
                   rhs="device", **kw)
    print(f"refined {tag}: {(s.N+1)*s.m/1e6:.1f} MDoF", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        r = s.solve_refined(tol=1e-8)
        print(f"refined {tag} solve{i}: wall {time.perf_counter()-t0:.1f}s "
              f"solve_seconds={r.solve_seconds:.3f} inner_iters={r.iterations} "
              f"rounds={len(r.residuals)} rel={r.residuals[-1]:.2e} "
              f"L2={r.l2_error}", flush=True)
EOF
log "stage 4 rc=$?"

log "stage 5: at-scale kappa rows"
timeout 10800 python - >results_tpu/r3_kappa_scale.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax
import jax.numpy as jnp
from spacetime_tpu.fem import (P1System, unit_square_mesh, unit_cube_mesh,
                               l_shape_mesh, refine_hierarchy,
                               uniform_time_grid)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver
from spacetime_tpu.solver.lanczos import lanczos_condition

cases = [
    ("smooth2d_135M", "smooth2d",
     lambda: P1System.from_mesh(unit_square_mesh(1024)), 7, {}),
    ("lshape_25M", "lshape2d",
     lambda: P1System.from_problem(get_problem("lshape2d"),
                                   refine_hierarchy(l_shape_mesh(32), 4)), 7,
     {}),
    ("smooth3d_133M", "smooth3d",
     lambda: P1System.from_mesh(unit_cube_mesh(128)), 6, {}),
]
for tag, pname, mk_sys, lv, kw in cases:
    prob = get_problem(pname)
    sys_ = mk_sys()
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="mg", rhs="device", **kw)
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
log "stage 5 rc=$?"

log "stage 6: compiled memory analysis (135 / 270 MDoF)"
timeout 10800 python - >results_tpu/r3_memory_analysis.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_square_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("smooth2d")
for n, lv, tag in ((1024, 7, "135M"), (1024, 8, "270M")):
    sys_ = P1System.from_mesh(unit_square_mesh(n))
    s = HeatSolver(prob, sys_, uniform_time_grid(lv), dtype=jnp.float32,
                   inner="mg", rhs="device")
    ndof = (s.N + 1) * s.m
    fn = s._build_solve(1e-6, 200, warm=False)
    gL, gR, u0 = s.assemble_rhs_host()
    x0 = jnp.zeros((), s.dtype)
    t0 = time.perf_counter()
    lowered = fn.lower(gL, gR, u0, s.params, x0)
    comp = lowered.compile()
    ma = comp.memory_analysis()
    gb = 1024 ** 3
    print(f"{tag}: ndof={ndof/1e6:.1f}M  compile {time.perf_counter()-t0:.0f}s",
          flush=True)
    print(f"{tag}: args={ma.argument_size_in_bytes/gb:.3f} GB  "
          f"out={ma.output_size_in_bytes/gb:.3f} GB  "
          f"temp={ma.temp_size_in_bytes/gb:.3f} GB  "
          f"alias={ma.alias_size_in_bytes/gb:.3f} GB  "
          f"gen={ma.generated_code_size_in_bytes/1e6:.0f} MB", flush=True)
    tot = (ma.argument_size_in_bytes + ma.output_size_in_bytes
           + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
    print(f"{tag}: live total ~{tot/gb:.2f} GB = {tot/ndof:.1f} B/DoF",
          flush=True)
EOF
log "stage 6 rc=$?"

log "queue done"
