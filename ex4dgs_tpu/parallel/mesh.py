"""Device mesh construction.

The reference is strictly single-GPU (SURVEY.md §2.3) — every parallel axis
here is new design. Axes:

  data  — cameras/minibatch (DP): each device renders + differentiates a
          different camera; parameter gradients are psum'd over this axis.
  gauss — Gaussian primitives (TP/EP-analog): per-Gaussian preprocessing
          (temporal interpolation, covariance, projection, SH) is sharded
          over splats and all-gathered before compositing; the backward
          all-gather transposes to a reduce-scatter over ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, data: int | None = None,
              gauss: int | None = None, devices=None) -> Mesh:
    """Build a 2-D (data, gauss) mesh over the available devices.

    Defaults: all devices on the data axis (pure DP) unless `gauss` is given.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None and gauss is None:
        data, gauss = n_devices, 1
    elif data is None:
        data = n_devices // gauss
    elif gauss is None:
        gauss = n_devices // data
    assert data * gauss == n_devices, (data, gauss, n_devices)
    arr = np.asarray(devices).reshape(data, gauss)
    return Mesh(arr, axis_names=("data", "gauss"))
