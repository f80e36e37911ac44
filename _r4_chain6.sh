#!/bin/bash
# Round-4 TPU chain 6: instrumented q2 (held-out trajectory), then perf sweep
set -x
cd /root/repo
Q2_ITERS=3000 timeout 9000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
EX4DGS_POWER=mxu timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
