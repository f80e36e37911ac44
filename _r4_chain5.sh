#!/bin/bash
# Round-4 TPU chain 5: perf sweep at split dots + direct power
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
EX4DGS_POWER=mxu timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 1800 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_prec_sanity.py
