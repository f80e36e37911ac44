#!/bin/bash
# Round-5 chain 4 (post-quality3): perf measurement chain.
#   1. default bench      — prices the deferred-argmax forward change
#   2. bwdsplit           — backward-chain decomposition (VERDICT #1)
#   3. alignedcheck       — REAL-device parity for the aligned layout
#   4-6. bench A/Bs       — aligned, aligned+G256, aligned+split3 stack
#   7. outspec            — image-layout out-spec microprobe (untile)
set -x
cd /root/repo
timeout 1800 scripts/tpu_snap_run.sh bench.py
timeout 2700 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_bwdsplit.py
timeout 1800 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_alignedcheck.py
EX4DGS_ALIGNED_LAYOUT=1 timeout 1800 scripts/tpu_snap_run.sh bench.py
EX4DGS_ALIGNED_LAYOUT=1 EX4DGS_GCHUNK=256 timeout 1800 \
  scripts/tpu_snap_run.sh bench.py
EX4DGS_ALIGNED_LAYOUT=1 EX4DGS_KERNEL_DOT=split3 timeout 1800 \
  scripts/tpu_snap_run.sh bench.py
timeout 1800 scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_outspec.py
# Tile re-sweep under the aligned layout: with the per-tile fixed cost and
# leading-lane waste largely gone, the slots*pixels product favors SMALLER
# tiles (r3 sweep verdict may invert). VPU-bound hypothesis check.
EX4DGS_ALIGNED_LAYOUT=1 EX4DGS_TILE=16x16 timeout 1800 \
  scripts/tpu_snap_run.sh bench.py
EX4DGS_ALIGNED_LAYOUT=1 EX4DGS_TILE=16x16 EX4DGS_PAIR=2 timeout 1800 \
  scripts/tpu_snap_run.sh bench.py
EX4DGS_ALIGNED_LAYOUT=1 EX4DGS_TILE=32x8 timeout 1800 \
  scripts/tpu_snap_run.sh bench.py
