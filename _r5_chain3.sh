#!/bin/bash
# Round-5 chain 3: the reference-operating-point quality run.
# 1352x1014, surface scene, full schedule, target 40k iters with a
# wall-clock budget; checkpoints every 2500; end-to-end eval through
# eval/render_sets.render_set (full metrics + reference FPS recipe).
set -x
cd /root/repo
Q3_ITERS=40000 Q3_CKPT=2500 Q3_TIME_BUDGET_S=16000 EX4DGS_GT_CACHE_MB=3000 \
  timeout 21000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality3.py
