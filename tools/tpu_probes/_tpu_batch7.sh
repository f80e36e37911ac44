#!/bin/bash
set -x
timeout 1500 python bench.py
timeout 1800 scripts/probe.sh _tpu_kernprobe.py
timeout 9000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
