#!/bin/bash
# Round-4c TPU chain 2: big-tile sweep (48x16/64x16/32x32), then bench at the
# default config to measure the StepOutputs trim's train-step recovery.
set -x
cd /root/repo
timeout 3000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_bench_tiles3.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
