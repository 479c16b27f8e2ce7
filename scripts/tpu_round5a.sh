#!/bin/bash
# Round-5 TPU queue A: (1) blocked-ELL kernel full-solve A/B at the 1.05M-dof
# L-shape AMG config (verdict task 1 "done when": same-process A/B,
# coarse stage >=2x, full solve <=12.5 s @ 22 identical iterations);
# (2) wide-band multi-level DIA-Pallas fault bisection (verdict task 2).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "stage 1: AMG-1M ELL-kernel A/B"
timeout 9000 python scripts/lockrun.py --tag r5_amg_ell -- \
  timeout 8900 python - >results_tpu/r5_amg_1m_ell_ab.log 2>&1 <<'EOF'
import gc, sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, l_shape_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

prob = get_problem("lshape2d")
sys_ = P1System.from_problem(prob, l_shape_mesh(1184))
for mode, flag in (("gather", False), ("ell_pallas", True)):
    t0 = time.perf_counter()
    s = HeatSolver(prob, sys_, uniform_time_grid(5), dtype=jnp.float32,
                   inner="amg", rhs="device", pallas_ell=flag)
    print(f"[{mode}] setup {time.perf_counter()-t0:.1f}s: m={s.m} -> "
          f"{(s.N+1)*s.m/1e6:.1f} MDoF, levels="
          f"{[(l.m, l.fmt) for l in s.msmg.levels]}", flush=True)
    for i in range(3):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6, compute_error=(i == 0))
        wall = time.perf_counter() - t0
        err = f" L2={r.l2_error:.4e}" if i == 0 else ""
        print(f"[{mode}] solve{i}: wall {wall:.1f}s, "
              f"solve_seconds {r.solve_seconds:.3f}, iters {r.iterations}, "
              f"rel {r.residuals[-1]/r.residuals[0]:.2e}{err}", flush=True)
    del s
    gc.collect()
EOF
log "stage 1 done rc=$?"

log "stage 2: DIA fault bisection"
timeout 7200 python scripts/lockrun.py --tag dia_bisect -- \
  timeout 7000 python scripts/dia_fault_bisect.py \
  >results_tpu/r5_dia_fault_bisect.jsonl 2>results_tpu/r5_dia_fault_bisect.err
log "stage 2 done rc=$?"
log "queue A complete"
