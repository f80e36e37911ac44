#!/bin/bash
# Round-4c TPU chain 3: honest-gt bench, then the 15000-iter config-2
# surface quality run (the 6000-iter headline was still rising: 36.04 dB;
# the reference trains 40k iters).
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
Q2_ITERS=15000 timeout 12000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
