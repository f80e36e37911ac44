"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (mirrors the driver's multichip dry-run environment).

Note: the deployment's sitecustomize imports jax and registers the axon TPU
plugin at interpreter start, so JAX_PLATFORMS in os.environ is read before
this file runs — use jax.config.update instead. For fastest local runs launch
via scripts/test.sh, which skips the TPU-plugin registration entirely.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
