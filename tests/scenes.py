"""Synthetic scene generators shared by tests and benchmarks."""
import math

import numpy as np
import jax.numpy as jnp

from ex4dgs_tpu.ops.math3d import projection_matrix, world_to_view
from ex4dgs_tpu.ops.projection import CameraArrays


def make_camera(width=64, height=64, fovx=math.radians(60.0), znear=0.01, zfar=100.0):
    fovy = 2 * math.atan(math.tan(fovx / 2) * height / width)
    R = np.eye(3)
    t = np.zeros(3)
    view = world_to_view(R, t)
    proj = projection_matrix(znear, zfar, fovx, fovy) @ view
    cam = CameraArrays(
        view=jnp.asarray(view), proj=jnp.asarray(proj), campos=jnp.zeros(3, jnp.float32)
    )
    return cam, dict(
        width=width,
        height=height,
        tan_fovx=math.tan(fovx / 2),
        tan_fovy=math.tan(fovy / 2),
    )


def random_gaussians(n=200, seed=0, spread=1.5, z_range=(2.0, 8.0), scale_range=(0.02, 0.25)):
    rng = np.random.default_rng(seed)
    means = np.concatenate(
        [
            rng.uniform(-spread, spread, (n, 2)),
            rng.uniform(*z_range, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    log_scales = np.log(rng.uniform(*scale_range, (n, 3))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opacity_logit = rng.uniform(-2.0, 3.0, (n, 1)).astype(np.float32)
    sh_dc = rng.uniform(-1.5, 1.5, (n, 1, 3)).astype(np.float32)
    sh_rest = (rng.normal(size=(n, 15, 3)) * 0.1).astype(np.float32)
    return dict(
        means=jnp.asarray(means),
        log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        opacity_logit=jnp.asarray(opacity_logit),
        sh_dc=jnp.asarray(sh_dc),
        sh_rest=jnp.asarray(sh_rest),
    )
