#!/bin/bash
# Round-4 TPU chain 3: perf after precision fix — blur A/B, stages, pair_fwd
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_SSIM_BLUR=matmul timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
