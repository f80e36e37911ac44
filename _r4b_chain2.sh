#!/bin/bash
# Round-4b TPU chain 2: bench at HEAD (scan-dot split + GT cache), stage
# decomposition, then the surface-target at-scale quality run, then a
# split3 kernel-dot A/B bench.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
Q2_ITERS=3000 timeout 12000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
EX4DGS_KERNEL_DOT=split3 timeout 1800 scripts/tpu_snap_run.sh bench.py
