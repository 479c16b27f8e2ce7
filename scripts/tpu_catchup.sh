#!/bin/bash
# Unattended TPU measurement session: waits for the axon tunnel, then runs
# the queued hardware measurements in order, logging to results_tpu/.
# Launch in the background; every stage is timeout-bounded (the tunnel can
# die again mid-run). Safe to re-run — stages are cheap when the compile
# cache is warm.
#
# Round-1 queue history: probe_kron3d (done -> blocked-3D kron enabled at
# (4,16)), big-3D 129^3x64 solve (done: 15 iters, 8.25 s steady in-process),
# bench sanity (done: ~65 GDoF/s). Current queue = the regression sanity
# set after the grid-layout wavelet GEMM change (expected: ~35 ms/iter off
# the 3D flagship, ~10 ms/iter off 2D; first solves recompile — new HLO).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup $(date +%H:%M:%S)] $*"; }

log "waiting for tunnel..."
python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 1. Headline bench (expected ~65 GDoF/s, vs_baseline ~1.4).
log "stage 1: bench.py"
timeout 4800 python bench.py >results_tpu/bench.json 2>results_tpu/bench.err
log "stage 1 rc=$?"

# 1b. Semi-fused V-cycle transfer kernels at the 3D flagship fine level:
#     do the new residual+restrict / prolong+correct Pallas passes beat the
#     XLA separated pair (19.4 ms/cycle) that they replaced in the solve
#     path? Expected: pl_pair well under xla_pair (single-pass byte minimum
#     is ~4 ms); if Mosaic fails to compile at this shape the probe records
#     it and the solve path must be gated back to XLA transfers.
log "stage 1b: probe_semi_transfer (3D fine level 127^3, T=65)"
timeout 4800 python scripts/probe_semi_transfer.py --space-n 128 \
    >results_tpu/semi_transfer.json 2>results_tpu/semi_transfer.err
log "stage 1b rc=$?"

# 2. Flagship steady solves, in-process second-solve timing (the honest
#    "steady" methodology: per-process first execution pays minutes of
#    device program load that no cache removes — see BASELINE.md).
#    Expected: 2D 135 MDoF ~3.5 s @17 iters; 3D 133 MDoF ~8.3 s @15 iters.
log "stage 2: flagship steady solves (2D 1025^2x128, 3D 129^3x64)"
timeout 7200 python - >results_tpu/flagship_steady.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import (
    P1System, unit_cube_mesh, unit_square_mesh, uniform_time_grid,
)
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

for name, mk, n, lv in [
    ("2D 1025^2x128", unit_square_mesh, 1024, 7),
    ("3D 129^3x64", unit_cube_mesh, 128, 6),
]:
    prob = get_problem("smooth2d" if mk is unit_square_mesh else "smooth3d")
    s = HeatSolver(prob, P1System.from_mesh(mk(n)), uniform_time_grid(lv),
                   dtype=jnp.float32, inner="mg", rhs="device")
    for i in range(2):
        t0 = time.perf_counter()
        r = s.solve(tol=1e-6)
        print(f"{name} solve{i}: {time.perf_counter()-t0:.1f}s wall, "
              f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}",
              flush=True)
EOF
log "stage 2 rc=$?"

# 3. 3D flagship with the recorded-best speed preset
#    (--mg-cycles-kx 1 --mg-nu-kx 3): previous best 7.44 s @ 16 iters.
log "stage 3: 3D flagship 129^3x64 with mg_cycles_kx=1 mg_nu_kx=3"
timeout 7200 python - >results_tpu/big3d_kx1.log 2>&1 <<'EOF'
import sys, time
sys.path.insert(0, ".")
from spacetime_tpu.utils import enable_compile_cache
enable_compile_cache()
import jax.numpy as jnp
from spacetime_tpu.fem import P1System, unit_cube_mesh, uniform_time_grid
from spacetime_tpu.models import get_problem
from spacetime_tpu.solver.heateq import HeatSolver

s = HeatSolver(get_problem("smooth3d"), P1System.from_mesh(unit_cube_mesh(128)),
               uniform_time_grid(6), dtype=jnp.float32, inner="mg",
               rhs="device", mg_cycles_kx=1, mg_nu_kx=3)
for i in range(2):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"3D kx1nu3 solve{i}: {time.perf_counter()-t0:.1f}s wall, "
          f"solve_seconds={r.solve_seconds:.2f}, iters={r.iterations}, "
          f"final_rel={r.residuals[-1]/r.residuals[0]:.3e}", flush=True)
EOF
log "stage 3 rc=$?"

log "done"
