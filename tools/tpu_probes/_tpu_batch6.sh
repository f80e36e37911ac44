#!/bin/bash
set -x
timeout 1800 scripts/probe.sh _tpu_kernprobe.py
timeout 1500 scripts/probe.sh _tpu_fullstep.py
timeout 1500 python bench.py
