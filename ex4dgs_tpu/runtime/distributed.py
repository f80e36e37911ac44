"""Multi-host initialization and cross-host utilities.

The reference has no distributed execution at all (SURVEY.md §2.3). Here:
`initialize()` wires jax.distributed for a multi-host TPU slice (each host
sees its local devices; collectives ride ICI/DCN), and small helpers keep
host-side training state (RNG, schedule flags) consistent across processes —
the determinism contract the sharded step (parallel/step_dp.py) relies on.
"""
from __future__ import annotations

import os

import jax
import numpy as np


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Initialize multi-host JAX. No-ops gracefully on a single host.

    On TPU pods the arguments are inferred from the environment; pass them
    explicitly for CPU/GPU multi-process testing."""
    if num_processes is None:
        num_processes = int(os.environ.get("EX4DGS_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_consistent_seed(seed: int) -> np.random.Generator:
    """All hosts must draw identical schedule randomness (densify split noise,
    camera shuffles) so their host events stay in lockstep."""
    return np.random.default_rng(seed)


def shard_cameras_for_host(cameras: list, data_axis_size: int) -> list:
    """Partition the per-step camera batch across processes: process p feeds
    mesh rows [p*local, (p+1)*local). Host-side analog of NamedSharding over
    the 'data' axis for non-array inputs."""
    per = max(1, len(cameras) // jax.process_count())
    p = jax.process_index()
    return cameras[p * per:(p + 1) * per]
