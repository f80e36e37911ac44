#!/bin/bash
# Round-3 follow-up batch (run AFTER the quality2 run frees the TPU and the
# 32x16 default is committed): loss-path layout probe, knob sweep around the
# new default, fresh stage decomposition, then the driver bench at the new
# default for the headline.
set -x
timeout 3600 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_lossprobe.py
timeout 3600 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_knobs32.py
timeout 3600 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
