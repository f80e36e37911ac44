#!/bin/bash
set -x
timeout 1200 python bench.py
EX4DGS_PAIR=3 timeout 1200 python bench.py
timeout 1800 python _tpu_preproc.py
timeout 10800 scripts/tpu_snap_run.sh _tpu_parity_train.py
timeout 10800 scripts/tpu_snap_run.sh _tpu_quality2.py
