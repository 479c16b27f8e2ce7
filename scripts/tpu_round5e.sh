#!/bin/bash
# Round-5 TPU queue E: single-chip hardware probe of the BLOCKED sharded
# semi-fused transfer kernel family (flips mg_pallas.SH_BLOCKED_HW on
# success — verdict task 5 "done when").
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "sh_blocked probe"
timeout 3600 python scripts/lockrun.py --tag sh_probe -- \
  timeout 3500 python scripts/probe_sh_blocked.py \
    >results_tpu/r5_sh_blocked_probe.jsonl \
    2>results_tpu/r5_sh_blocked_probe.err
log "probe done rc=$?"
