#!/usr/bin/env bash
# Run the test suite on the virtual 8-device CPU mesh, skipping the TPU
# plugin registration (PALLAS_AXON_POOL_IPS gates the deployment's
# sitecustomize) so tests don't dial or hold the single TPU tunnel.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest tests/ -q "$@"
