"""Temporal queries: per-frame tensors for the rasterizer.

Functional equivalents of CGaussianModel.get_{xyz,rotation,opacity,scaling,
features}[_at_t] (scene/c_gaussian_model.py:170-379). `mode` selects the
point set exactly as in the reference: 0 = static+dynamic concatenated,
1 = static only, 2 = dynamic only. With capacity padding the concatenated
axis is [static_capacity + dynamic_capacity]; inactive rows carry a False
mask (their opacity is forced to 0 downstream, so they never contribute).

All scalars (t, duration) are traced — one compiled render graph serves every
timestamp and every progressive-growing stage.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import interpolation as interp
from .config import ModelConfig
from .state import GaussianModel


class PointData(NamedTuple):
    """Per-frame rasterizer inputs for P = Ps(+Pd) capacity rows."""

    means3d: jnp.ndarray  # [P, 3]
    rotations: jnp.ndarray  # [P, 4] raw quaternions (un-normalized, as the
    # reference rasterizer consumes them, forward.cu:137)
    scales: jnp.ndarray  # [P, 3] activated (exp)
    opacity: jnp.ndarray  # [P] activated (sigmoid x temporal envelope)
    features: jnp.ndarray  # [P, (deg+1)^2, 3] SH coefficients
    mask: jnp.ndarray  # [P] bool active rows
    static_num: int  # rows [0:static_num] are the static group


def _keyframe_coords(t, cfg: ModelConfig):
    tt = t + cfg.time_shift
    k = jnp.floor(tt / cfg.time_interval).astype(jnp.int32)
    dt = jnp.mod(tt, cfg.time_interval) / cfg.time_interval
    return k, dt


def static_xyz_at_t(model: GaussianModel, t) -> jnp.ndarray:
    """xyz + disp * t/duration (c_gaussian_model.py:178-180)."""
    return model.params["xyz"] + model.params["xyz_disp"] * (t / model.duration)


def dynamic_xyz_at_t(model: GaussianModel, cfg: ModelConfig, t) -> jnp.ndarray:
    k, dt = _keyframe_coords(t, cfg)
    return interp.interp_keyframes(
        _interp_kind(cfg.interp_type), model.params["motion_xyz"], k, dt,
        y_d=model.params.get("motion_xyz_d"),
    )


def dynamic_rotation_at_t(model: GaussianModel, cfg: ModelConfig, t) -> jnp.ndarray:
    k, dt = _keyframe_coords(t, cfg)
    return interp.interp_quat_keyframes(
        cfg.rot_interp_type, model.params["motion_rotation"], k, dt
    )


def _interp_kind(kind: str) -> str:
    if kind == "cubic":  # model name alias
        return "cube"
    return kind


def dynamic_opacity_at_t(model: GaussianModel, cfg: ModelConfig, t) -> jnp.ndarray:
    """sigmoid(opacity) x bi-Gaussian temporal envelope
    (c_gaussian_model.py:363-366), in keyframe units."""
    tu = (t + cfg.time_shift) / cfg.time_interval
    env = interp.time_bigaussian(
        model.params["motion_opacity_center"],
        model.params["motion_opacity_var"],
        tu,
        var_min=cfg.var_pad / cfg.time_interval,
    )
    return jnp.squeeze(_sigmoid(model.params["motion_opacity"]), -1) * env


def point_data_at_t(model: GaussianModel, cfg: ModelConfig, t, mode: int = 0) -> PointData:
    """Assemble all rasterizer inputs for timestamp t."""
    t = jnp.asarray(t, jnp.float32)
    p = model.params
    use_static = mode in (0, 1)
    use_dynamic = mode in (0, 2) and model.dynamic_capacity > 0

    parts_xyz, parts_rot, parts_scale, parts_op, parts_feat, parts_mask = (
        [], [], [], [], [], []
    )
    static_num = 0
    if use_static:
        static_num = model.static_capacity
        parts_xyz.append(static_xyz_at_t(model, t))
        parts_rot.append(p["rotation"])
        parts_scale.append(jnp.exp(p["scaling"]))
        parts_op.append(jnp.squeeze(_sigmoid(p["opacity"]), -1))
        parts_feat.append(jnp.concatenate([p["f_dc"], p["f_rest"]], axis=1))
        parts_mask.append(model.static_mask)
    if use_dynamic:
        tu = (t + cfg.time_shift) / cfg.time_interval
        env = interp.time_bigaussian(
            p["motion_opacity_center"],
            p["motion_opacity_var"],
            tu,
            var_min=cfg.var_pad / cfg.time_interval,
        )
        parts_xyz.append(dynamic_xyz_at_t(model, cfg, t))
        parts_rot.append(dynamic_rotation_at_t(model, cfg, t))
        parts_scale.append(jnp.exp(p["motion_scaling"]))
        parts_op.append(jnp.squeeze(_sigmoid(p["motion_opacity"]), -1) * env)
        parts_feat.append(jnp.concatenate([p["motion_f_dc"], p["motion_f_rest"]], axis=1))
        parts_mask.append(model.dynamic_mask)

    features = jnp.concatenate(parts_feat, axis=0)
    # Mask SH bands above the active degree (equivalent to evaluating a lower
    # degree: SH is linear in its coefficients). Lets active_sh_degree be a
    # traced scalar instead of recompiling per oneupSHdegree (train.py:113-114).
    n_coef = features.shape[1]
    band = jnp.arange(n_coef, dtype=jnp.int32)
    band_ok = band < (model.active_sh_degree + 1) ** 2
    features = features * band_ok[None, :, None]

    return PointData(
        means3d=jnp.concatenate(parts_xyz, axis=0),
        rotations=jnp.concatenate(parts_rot, axis=0),
        scales=jnp.concatenate(parts_scale, axis=0),
        opacity=jnp.concatenate(parts_op, axis=0),
        features=features,
        mask=jnp.concatenate(parts_mask, axis=0),
        static_num=static_num,
    )


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))
