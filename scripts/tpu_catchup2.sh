#!/bin/bash
# Follow-up TPU measurement queue: waits for a running tpu_catchup.sh to
# exit (pass its PID as $1, or it polls for the process by pidfile), then
# re-profiles the 3D flagship with the grid-layout wavelet GEMM and the
# semi-fused V-cycle transfers enabled, recording the new splits that
# BASELINE.md's tables cite. Timeout-bounded stages; safe to re-run.
set -u
cd "$(dirname "$0")/.."
mkdir -p results_tpu

log() { echo "[tpu_catchup2 $(date +%H:%M:%S)] $*"; }

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
    log "waiting for tpu_catchup pid $WAIT_PID to exit"
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
    log "pid $WAIT_PID gone"
fi

python scripts/wait_tunnel.py --hours 11 --interval 300 || exit 1
log "tunnel is up"

# 4. V-cycle stage split at the 3D flagship with semi-fused transfers in
#    the solve path (compare vcycle_stages_big3d.jsonl: vc_full was
#    51.2 ms, transfer pair 19.4 ms).
log "stage 4: vcycle stage split, 3D flagship, semi-fused"
timeout 7200 python scripts/profile_iteration.py --space-n 128 \
    --time-levels 6 --problem smooth3d --vcycle-stages \
    >results_tpu/vcycle_stages_semi.jsonl 2>results_tpu/vcycle_stages_semi.err
log "stage 4 rc=$?"

# 5. Component split at the 3D flagship (compare profile_big3d.jsonl:
#    S 185.4, KY 158.3, KX 302.8, wavelet_pair 41.0, mg_vcycle_kx 107.1).
log "stage 5: component split, 3D flagship"
timeout 7200 python scripts/profile_iteration.py --space-n 128 \
    --time-levels 6 --problem smooth3d \
    >results_tpu/profile_big3d_semi.jsonl 2>results_tpu/profile_big3d_semi.err
log "stage 5 rc=$?"

# 6. Component split at the 2D flagship (grid-layout wavelet GEMM:
#    wavelet_pair was 14.9 ms at 135 MDoF).
log "stage 6: component split, 2D flagship 1025^2x128"
timeout 7200 python scripts/profile_iteration.py --space-n 1024 \
    --time-levels 7 --problem smooth2d \
    >results_tpu/profile_2dflag_gemm.jsonl 2>results_tpu/profile_2dflag_gemm.err
log "stage 6 rc=$?"

log "done"
