#!/bin/bash
# Round-5 chain 2: measure kernel prefetch + gid-row-14, then knob A/Bs.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_renderprobe.py
EX4DGS_BUFS=3 timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_KERNEL_DOT=split3 timeout 1800 scripts/tpu_snap_run.sh bench.py
