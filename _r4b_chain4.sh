#!/bin/bash
# Round-4b TPU chain 4: clean benches at final HEAD (pm+dfeat three-pass,
# hardened window filter), fwd pane-batch recheck.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_PAIR_FWD=2 timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
