#!/bin/bash
# Round-4b TPU chain 3: bench at HEAD (pm three-pass), pack-VJP component
# probe, power/gchunk A/Bs at the new precision path.
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 1500 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_packvjp2.py
EX4DGS_POWER=mxu timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_GCHUNK=256 timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2400 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_stages6.py
