#!/bin/bash
# Run a measurement probe from tools/tpu_probes/ with the repo root on
# sys.path (python <script> puts the SCRIPT dir first, which would break the
# ex4dgs_tpu import; `python -c runpy` keeps cwd).  Usage:
#   scripts/probe.sh _tpu_stages6.py [args...]
set -e
cd "$(dirname "$0")/.."
NAME="$1"; shift || true
exec python -c "import sys, runpy; sys.argv = ['$NAME'] + '''$*'''.split(); runpy.run_path('tools/tpu_probes/$NAME', run_name='__main__')"
