#!/bin/bash
# Round-4b TPU chain 5: backward pane-batching recheck at the final dots.
set -x
cd /root/repo
EX4DGS_PAIR=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
