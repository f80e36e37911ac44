#!/bin/bash
# Run a measurement probe from tools/tpu_probes/ with the repo root on
# sys.path (plain `python tools/tpu_probes/x.py` puts the script dir, not
# the cwd, on sys.path, which breaks the ex4dgs_tpu import). Usage:
#   scripts/probe.sh _tpu_stages6.py [args...]
set -e
cd "$(dirname "$0")/.."
NAME="$1"; shift || true
cat > /tmp/_probe_shim.py <<PY
import runpy, sys
sys.path.insert(0, "")
runpy.run_path("tools/tpu_probes/$NAME", run_name="__main__")
PY
exec python -u /tmp/_probe_shim.py "$@"
