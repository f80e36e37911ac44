#!/bin/bash
# Round-5 chain 4 (post-quality): final bench with deferred argmax,
# split3 at-scale quality A/B, extraction-off ablation, then the
# driver-style final bench.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
# split3 at-scale validation: 3000-iter surface run (compare: default-dot
# anchor 33.53 dB at 3000 iters, r4b)
EX4DGS_KERNEL_DOT=split3 Q2_ITERS=3000 timeout 7200 \
  scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
# extraction-off ablation (VERDICT r4 #8)
Q2_EXTRACT=0 Q2_ITERS=3000 timeout 7200 \
  scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
