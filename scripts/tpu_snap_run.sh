#!/bin/bash
# Run a TPU script from a snapshot of committed HEAD so live edits to the
# working tree can't race the run's lazy imports. Usage:
#   scripts/tpu_snap_run.sh <script.py> [args...]
# The snapshot lives under /root/repo/_snap (inside the repo: sitecustomize
# needs the script dir to provide the package import) and is refreshed from
# HEAD each call.
set -e
SNAP=/root/repo/_snap
rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
exec python "$@"
