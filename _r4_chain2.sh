#!/bin/bash
# Round-4 TPU chain 2: precision sweep (perf + parity) and pair_fwd probe
set -x
cd /root/repo
EX4DGS_MATMUL_PRECISION=high timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_prec_sanity.py
EX4DGS_MATMUL_PRECISION=high timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_MATMUL_PRECISION=high EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
