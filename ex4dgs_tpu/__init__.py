"""ex4dgs_tpu — a TPU-native 4D Gaussian splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Ex4DGS
("Fully Explicit Dynamic Gaussian Splatting", NeurIPS 2024): static/dynamic
Gaussian separation with keyframe-interpolated motion, a differentiable
tile-based rasterizer with depth/flow/acc side-channels, adaptive density
control, and multi-chip SPMD training over a `jax.sharding.Mesh`.

Layout:
  ops/       pure-function compute kernels (projection, binning, compositing,
             Pallas TPU kernels, KNN, SSIM, spherical harmonics, interpolation)
  models/    Gaussian parameter state (pytree), temporal queries, density control
  train/     optimizer, losses, training step/loop
  data/      COLMAP parsing, dataset readers, cameras, scene orchestration
  parallel/  device mesh + sharded train/render steps
  io/        PLY import/export, checkpointing
  eval/      metrics and offline rendering harness
  runtime/   host-side native runtime (prefetch, profiling)
"""

__version__ = "0.1.0"

# f32 matmul semantics by default. On TPU the MXU's DEFAULT precision rounds
# f32 operands to bf16 (8-bit mantissa); every cancellation-sensitive matmul
# in this framework — SSIM variance statistics, the oracle's compositing
# einsums, the pack-VJP block-cumsum of gradients, the in-kernel log-space
# transmittance chain — then carries ~4e-3 relative noise. That noise broke
# at-scale training outright (SSIM denominators went negative in flat image
# regions; see ops/losses.py::_depthwise_blur) and silently degraded
# everything else, while every CPU test was blind to it (CPU matmuls are
# f32). Correct-by-default: opt out per call site with an explicit
# `precision=` where a measurement shows DEFAULT/HIGH is safe, or globally
# via EX4DGS_MATMUL_PRECISION for experiments.
import os as _os

import jax as _jax

_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("EX4DGS_MATMUL_PRECISION", "highest"),
)
