#!/bin/bash
# Round-5 chain 6: bench at the new defaults (split3 + SSIM bwd split),
# then the extraction-off ablation (int32-safe sentinel).
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
Q2_EXTRACT=0 Q2_ITERS=3000 timeout 7200 \
  scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
