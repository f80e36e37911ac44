#!/bin/bash
# Round-4b TPU chain 7: step-overhead decomposition + untile A/B via stages.
set -x
cd /root/repo
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stepprobe.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
