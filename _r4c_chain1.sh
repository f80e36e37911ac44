#!/bin/bash
# Round-4c TPU chain 1: bench at the new naive-untile default, step-overhead
# split (stats vs overflow-select vs outputs), fresh stage decomposition at
# the current 32x16/p1/g128 config.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stepover.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
