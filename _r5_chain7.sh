#!/bin/bash
# Round-5 chain 7: final-default decompositions for the ledger.
set -x
cd /root/repo
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_renderprobe.py
timeout 2700 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_bwdsplit.py
