#!/bin/bash
set -x
timeout 1500 python bench.py
timeout 1500 scripts/tpu_snap_run.sh _tpu_quality2.py
