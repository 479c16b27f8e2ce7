#!/bin/bash
# Unattended TPU measurement session: waits for the axon tunnel, then runs
# the queued hardware measurements in order, logging to results_tpu/.
# Launch in the background; every stage is timeout-bounded (the tunnel can
# die again mid-run). Safe to re-run — stages skip nothing but are cheap
# when the compile cache is warm.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup $(date +%H:%M:%S)] $*"; }

log "waiting for tunnel..."
python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 1. Blocked-3D kron kernel probe (gate-flip measurements for
#    ops/kron_pallas.supported; DESIGN.md §8 deferred item).
log "stage 1: probe_kron3d 129^3 x 32"
timeout 7200 python scripts/probe_kron3d.py --space-n 128 --time-levels 5 \
    >results_tpu/probe_kron3d.jsonl 2>results_tpu/probe_kron3d.err
log "stage 1 rc=$?"

# 2. Large-3D flagship config: 129^3 x 64 ts = 140 MDoF (cfg3 at scale).
#    First compile is tens of minutes; steady timing comes from the second
#    run (compile cache).
log "stage 2: big-3D solve 129^3 x 64 (compile + steady)"
for i in 1 2; do
  timeout 7200 python -m spacetime_tpu.run --backend jax --device tpu \
      --dtype f32 --inner mg --problem smooth3d --space-n 128 \
      --time-levels 6 --rhs device --out results_tpu/big3d_run$i.json \
      >results_tpu/big3d_run$i.log 2>&1
  log "stage 2 run$i rc=$?"
done

# 3. Headline bench (sanity: unchanged kernels should reproduce ~65 GDoF/s).
log "stage 3: bench.py"
timeout 4800 python bench.py >results_tpu/bench.json 2>results_tpu/bench.err
log "stage 3 rc=$?"

log "done"
