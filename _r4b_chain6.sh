#!/bin/bash
# Round-4b TPU chain 6: 6000-iter surface quality run (GT cached in /tmp),
# then a final bench at HEAD.
set -x
cd /root/repo
Q2_ITERS=6000 timeout 12000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
