#!/bin/bash
# Run a TPU script from a snapshot of committed HEAD so live edits to the
# working tree can't race the run's lazy imports. Usage:
#   scripts/tpu_snap_run.sh <script.py> [args...]
# The snapshot lives under /root/repo/_snap (inside the repo: sitecustomize
# breaks with PYTHONPATH overrides) and is refreshed from HEAD each call.
# runpy keeps the snapshot ROOT on sys.path so scripts anywhere in the tree
# (e.g. tools/tpu_probes/) can import the package.
set -e
SNAP=/root/repo/_snap
rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
SCRIPT="$1"; shift || true
exec python -c "import sys, runpy; sys.argv = ['$SCRIPT'] + sys.argv[1:]; runpy.run_path('$SCRIPT', run_name='__main__')" "$@"
