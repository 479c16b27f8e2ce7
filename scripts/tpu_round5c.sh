#!/bin/bash
# Round-5 TPU queue C: DIA-fault boundary sweep. Queue A's bisection
# overturned the round-4 hypothesis: the SECOND kernel family (m=261665,
# bw=592, HS=1280, chooser MB=15360) faults ALONE, while the fine family
# (m=1049025, HS=2560, MB=40960) is stable and L1 at MB=2560 is stable.
# This sweep varies ONE axis per case to pin the boundary in (m, bw, MB).
cd /root/repo
log() { echo "[$(date +%H:%M:%S)] $*" >&2; }

log "fault boundary sweep"
timeout 5400 python scripts/lockrun.py --tag r5_fault_sweep -- \
  timeout 5300 python scripts/dia_fault_bisect.py \
    custom:261665:592:2560 \
    custom:261665:592:5120 \
    custom:261665:592:10240 \
    custom:261665:592:15360 \
    custom:1049025:592:15360 \
    custom:523329:592:15360 \
    custom:261665:1184:40960 \
    >results_tpu/r5_fault_sweep.jsonl 2>results_tpu/r5_fault_sweep.err
log "sweep done rc=$?"
