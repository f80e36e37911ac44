#!/bin/bash
# Round-4b TPU chain 1: instrumented q2 (held-out trajectory via
# test_iterations every 250, model save, render dumps), then a bench at HEAD.
set -x
cd /root/repo
Q2_ITERS=3000 timeout 12000 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py
timeout 1800 scripts/tpu_snap_run.sh bench.py
