#!/bin/bash
# Round-4b TPU chain 7: untile A/B (back-to-back), step-overhead probe.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_UNTILE=naive timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stepprobe.py
