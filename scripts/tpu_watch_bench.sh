#!/bin/bash
# Poll TPU availability (cheap device touch) every POLL seconds; when the
# backend comes back, run the driver bench and the batched tile-config bench
# from a HEAD snapshot, then exit. Writes progress to stdout.
# Single TPU toucher: never run alongside another TPU-touching process.
POLL=${POLL:-600}
DEADLINE=${DEADLINE:-$(( $(date +%s) + 8*3600 ))}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "[watch] probing TPU at $(date -u +%H:%M:%S)"
  if timeout 900 python -c "import jax; print(jax.devices())" 2>&1 | grep -q TPU; then
    echo "[watch] TPU back at $(date -u +%H:%M:%S); running benches"
    cd /root/repo
    BENCH_ATTEMPTS=2 scripts/tpu_snap_run.sh bench.py
    rc=$?
    echo "[watch] bench.py rc=$rc"
    scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_bench_tiles.py
    echo "[watch] tile bench rc=$?"
    echo "[watch] launching config-2 quality run (full schedule)"
    scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_quality2.py 2>&1 | tee /root/repo/_q2_fullsched_tpu.log
    echo "[watch] quality2 rc=$?"
    exit 0
  fi
  sleep "$POLL"
done
echo "[watch] deadline reached without TPU"
exit 1
