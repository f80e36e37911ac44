#!/bin/bash
# Round-4 TPU chain 4: split-dot perf + parity, then the FULL q2 quality run
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 1800 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_prec_sanity.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
Q2_ITERS=3000 timeout 7200 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
