#!/bin/bash
# Round-5 chain 5: at-scale quality validation of the candidate default
# (split3 kernel dots — the aligned layout measured as a net loss under the
# growth-policy capacity and stays non-default), then the extraction-off
# ablation (VERDICT r4 #8). Compare: default-dot anchor 33.53 dB at 3000
# iters (r4b).
set -x
cd /root/repo
EX4DGS_KERNEL_DOT=split3 Q2_ITERS=3000 \
  timeout 7200 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
Q2_EXTRACT=0 Q2_ITERS=3000 timeout 7200 \
  scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
