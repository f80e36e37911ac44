#!/bin/bash
# Round-5 chain 1: post-refactor bench sanity, tight_cull A/B, render-only
# decomposition, train-step tax, shard_map overhead at mesh (1,1).
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_TIGHT_CULL=1 timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_renderprobe.py
EX4DGS_TIGHT_CULL=1 timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_renderprobe.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_steptax.py
timeout 3600 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_shardoverhead.py
