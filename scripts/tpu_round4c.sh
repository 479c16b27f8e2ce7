#!/bin/bash
# Round-4 TPU queue, part C (queued behind part B): re-measure the
# factored-transfer AMG record with the probe-updated DIA block chooser
# (HS>=2048 levels now take MB=16*HS — the r4_probe_dia_1m.jsonl winner,
# 1.55x XLA vs the old 15360 pick's 1.38x at the 1M fine level).
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_round4c $(date +%H:%M:%S)] $*"; }

python scripts/wait_tunnel.py --hours 2 --interval 120 || exit 1
log "tunnel is up"

log "stage: factored AMG 1M with MB=40960 chooser"
timeout 4200 python - >results_tpu/r4_amg_1m_mb40960.log 2>&1 <<'EOF'
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
print(f"setup {time.perf_counter()-t0:.1f}s", flush=True)
_ = s.params
for key, plist in s._ms_pl.items():
    for li, pj in enumerate(plist):
        if pj is not None:
            print(f"  dia L{li}: m={pj.m} bw={pj.bw} HS={pj.HS} "
                  f"TB={pj.TB} MB={pj.MB}", flush=True)
    break
for i in range(3):
    t0 = time.perf_counter()
    r = s.solve(tol=1e-6)
    print(f"[factored-mb40960] solve{i}: wall {time.perf_counter()-t0:.1f}s "
          f"solve_seconds={r.solve_seconds:.3f} iters={r.iterations} "
          f"L2={r.l2_error}", flush=True)
EOF
log "stage rc=$?"
log "queue C done"
