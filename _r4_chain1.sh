#!/bin/bash
# Round-4 TPU chain 1: precision sanity -> bench delta -> training-health diag
set -x
cd /root/repo
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_prec_sanity.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
QD_ITERS=300 timeout 3600 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_q2diag.py
