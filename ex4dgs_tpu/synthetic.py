"""Synthetic scene construction shared by tests, the graft entry, and bench.

Builds a fittable static+dynamic Gaussian scene with a ring of cameras —
the stand-in for an N3V capture when no dataset is mounted.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .models.config import ModelConfig
from .models.state import GaussianModel, create_from_pcd, empty_model
from .ops.math3d import projection_matrix, world_to_view
from .rendering import RenderCamera


def lookat_camera(eye, target, up, width, height, fov_deg=60.0, near=0.2, far=100.0):
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # camera-to-world rotation with +z forward (COLMAP convention)
    R = np.stack([right, down, fwd], axis=1)
    t = -R.T @ eye
    view = world_to_view(R, t)
    fov = math.radians(fov_deg)
    P = projection_matrix(near, far, fov, fov)
    return RenderCamera.from_fov(view, P @ view, eye, width, height, fov, fov)


def ring_cameras(n, radius, width, height, target=(0, 0, 0), elev=0.35, **kw):
    cams = []
    for i in range(n):
        a = 2 * math.pi * i / max(n, 1)
        eye = (radius * math.cos(a), elev * radius, radius * math.sin(a))
        cams.append(lookat_camera(eye, target, (0, 1, 0), width, height, **kw))
    return cams


def make_scene(
    n_static: int = 20000,
    n_dynamic: int = 2000,
    duration: float = 10.0,
    seed: int = 0,
    cfg: ModelConfig | None = None,
    static_capacity: int | None = None,
    dynamic_capacity: int | None = None,
    opacity: float | None = None,
) -> tuple[GaussianModel, ModelConfig]:
    """A unit-box cloud of static splats plus orbiting dynamic splats.

    opacity: optional static-splat opacity override (default keeps
    create_from_pcd's 0.1). Real captured scenes are surface-like and mostly
    opaque; quality harnesses pass ~0.85 so the target resembles N3V content
    instead of translucent dust (which makes densification thresholds
    pathological — every pixel's error spreads over ~20 blended layers)."""
    if cfg is None:
        cfg = ModelConfig(time_interval=5, start_duration=5,
                          duration=int(duration), near=0.2, far=100.0)
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n_static, 3)).astype(np.float32) * 0.7
    cols = rng.uniform(0.05, 0.95, size=(n_static, 3)).astype(np.float32)
    sc = static_capacity or max(1, n_static)
    dc = dynamic_capacity if dynamic_capacity is not None else n_dynamic
    model = create_from_pcd(pts, cols, cfg, duration=duration, static_capacity=sc,
                            dynamic_capacity=dc)
    # Volumetric random clouds have a far tail where the 3-NN distance (and so
    # the initialized scale) explodes into thousand-pixel splats — real COLMAP
    # clouds are surface-like and don't. Clip to keep the synthetic workload
    # representative of a trained scene's splat-size distribution.
    new_params = {
        **model.params,
        "scaling": jnp.minimum(model.params["scaling"], np.log(0.03)),
    }
    if opacity is not None:
        from .ops.math3d import inverse_sigmoid

        new_params["opacity"] = new_params["opacity"].at[:n_static].set(
            float(inverse_sigmoid(np.float32(opacity))))
    model = model._replace(params=new_params)

    if n_dynamic > 0:
        kf = model.keyframe_capacity
        p = dict(model.params)
        centers = rng.normal(size=(n_dynamic, 1, 3)).astype(np.float32) * 0.6
        phase = rng.uniform(0, 2 * np.pi, size=(n_dynamic, 1, 1)).astype(np.float32)
        ts = np.arange(kf, dtype=np.float32).reshape(1, kf, 1)
        cosv = np.cos(0.3 * ts + phase)
        orbit = 0.25 * np.concatenate(
            [cosv, np.sin(0.3 * ts + phase), np.zeros_like(cosv)], axis=-1
        ).astype(np.float32)
        p["motion_xyz"] = p["motion_xyz"].at[:n_dynamic].set(jnp.asarray(centers + orbit))
        p["motion_f_dc"] = p["motion_f_dc"].at[:n_dynamic, 0].set(
            jnp.asarray(rng.uniform(-1, 1, size=(n_dynamic, 3)).astype(np.float32))
        )
        p["motion_scaling"] = p["motion_scaling"].at[:n_dynamic].set(-4.0)
        p["motion_opacity"] = p["motion_opacity"].at[:n_dynamic].set(1.0)
        shift_u = cfg.time_shift / cfg.time_interval
        p["motion_opacity_center"] = (
            p["motion_opacity_center"].at[:n_dynamic, 0].set(shift_u)
        )
        p["motion_opacity_center"] = (
            p["motion_opacity_center"]
            .at[:n_dynamic, 1]
            .set(shift_u + duration / cfg.time_interval)
        )
        p["motion_opacity_var"] = p["motion_opacity_var"].at[:n_dynamic].set(1.0)
        model = model._replace(
            params=p,
            dynamic_mask=model.dynamic_mask.at[:n_dynamic].set(True),
            keyframe_num=jnp.asarray(kf, jnp.int32),
        )
    return model, cfg
