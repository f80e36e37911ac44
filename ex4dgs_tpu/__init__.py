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
