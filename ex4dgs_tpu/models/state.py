"""Gaussian model state: a capacity-padded pytree of static + dynamic splats.

TPU-native re-design of the reference CGaussianModel's parameter storage
(scene/c_gaussian_model.py:46-96,385-428). The reference grows/shrinks its
tensors on every densify/prune; under jit that would mean a recompile per
event. Here every array is padded to a *capacity* with an explicit active
mask; density-control events (models/density.py) run host-side and only
change the capacity when a bucketed threshold is crossed.

Parameter keys match the reference's optimizer param-group names
(c_gaussian_model.py:430-447) so per-group learning rates and PLY export map
one-to-one.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops.knn import mean_knn_dist2
from ..ops.math3d import inverse_sigmoid, rgb_to_sh0
from .config import ModelConfig

STATIC_KEYS = ("xyz", "f_dc", "f_rest", "opacity", "scaling", "rotation", "xyz_disp")
DYNAMIC_KEYS = (
    "motion_xyz",
    "motion_f_dc",
    "motion_f_rest",
    "motion_scaling",
    "motion_opacity",
    "motion_opacity_center",
    "motion_opacity_var",
    "motion_rotation",
)
# Parameters with a keyframe axis [P, K, ...]; "motion_xyz_d" (explicit
# Hermite tangents for interp_type="cubic_diff") exists only when the config
# selects that interpolator.
KEYFRAME_KEYS = ("motion_xyz", "motion_rotation", "motion_xyz_d")
STATIC_STAT_KEYS = (
    "max_radii2D",
    "min_radii2D",
    "xyz_gradient_accum",
    "denom",
    "xyz_error_accum",
    "xyz_error_min",
    "xyz_error_min_timestamp",
    "xyz_ssim_error_accum",
    "error_denom",
)
DYNAMIC_STAT_KEYS = (
    "motion_max_radii2D",
    "motion_min_radii2D",
    "motion_xyz_gradient_accum",
    "motion_denom",
    "motion_xyz_error_min",
    "motion_xyz_error_mean",
    "motion_xyz_error_min_timestamp",
    "motion_xyz_ssim_error_accum",
    "motion_error_denom",
)

CAPACITY_GRANULARITY = 4096


class GaussianModel(NamedTuple):
    """All-device model state. Fields with leading static-capacity Ps or
    dynamic-capacity Pd dims; scalars are 0-d arrays so they trace (no
    recompile when duration grows or SH degree steps up)."""

    params: dict  # name -> array, see STATIC_KEYS/DYNAMIC_KEYS
    static_mask: jnp.ndarray  # [Ps] bool — active static splats
    dynamic_mask: jnp.ndarray  # [Pd] bool
    stats: dict  # name -> [Ps] or [Pd] float32 accumulators
    active_sh_degree: jnp.ndarray  # [] int32
    duration: jnp.ndarray  # [] float32
    keyframe_num: jnp.ndarray  # [] int32 — active keyframes (<= K capacity)

    @property
    def static_capacity(self) -> int:
        return self.params["xyz"].shape[0]

    @property
    def dynamic_capacity(self) -> int:
        return self.params["motion_xyz"].shape[0]

    @property
    def keyframe_capacity(self) -> int:
        return self.params["motion_xyz"].shape[1]

    def n_static(self):
        return self.static_mask.sum()

    def n_dynamic(self):
        return self.dynamic_mask.sum()


def round_capacity(n: int, granularity: int = CAPACITY_GRANULARITY) -> int:
    return max(granularity, ((int(n) + granularity - 1) // granularity) * granularity)


def required_keyframes(duration: float, cfg: ModelConfig) -> int:
    """Keyframe count needed to cover `duration` (c_gaussian_model.py:1254)."""
    return (
        math.ceil((int(duration) + cfg.time_shift + cfg.time_pad * 2 + 1) / cfg.time_interval)
        + 1
        + 2
    )


def _empty_static(cap: int, sh_degree: int) -> dict:
    f_rest = (sh_degree + 1) ** 2 - 1
    return {
        "xyz": jnp.zeros((cap, 3), jnp.float32),
        "f_dc": jnp.zeros((cap, 1, 3), jnp.float32),
        "f_rest": jnp.zeros((cap, f_rest, 3), jnp.float32),
        "opacity": jnp.full((cap, 1), -10.0, jnp.float32),  # sigmoid ~ 0
        "scaling": jnp.full((cap, 3), -10.0, jnp.float32),  # exp ~ 0
        "rotation": jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (cap, 1)),
        "xyz_disp": jnp.zeros((cap, 3), jnp.float32),
    }


def _empty_dynamic(cap: int, kf_cap: int, sh_degree: int,
                   tangents: bool = False) -> dict:
    f_rest = (sh_degree + 1) ** 2 - 1
    out = {
        "motion_xyz": jnp.zeros((cap, kf_cap, 3), jnp.float32),
        "motion_f_dc": jnp.zeros((cap, 1, 3), jnp.float32),
        "motion_f_rest": jnp.zeros((cap, f_rest, 3), jnp.float32),
        "motion_scaling": jnp.full((cap, 3), -10.0, jnp.float32),
        "motion_opacity": jnp.full((cap, 1), -10.0, jnp.float32),
        "motion_opacity_center": jnp.zeros((cap, 2), jnp.float32),
        "motion_opacity_var": jnp.zeros((cap, 2), jnp.float32),
        "motion_rotation": jnp.tile(
            jnp.array([1.0, 0, 0, 0], jnp.float32)[None, None], (cap, kf_cap, 1)
        ),
    }
    if tangents:
        out["motion_xyz_d"] = jnp.zeros((cap, kf_cap, 3), jnp.float32)
    return out


def _init_stats(static_cap: int, dynamic_cap: int) -> dict:
    """Fresh accumulators (c_gaussian_model.py:412-428): min radii start at
    1000, error-min at 1000, min-timestamp at -1 (never-seen sentinel)."""
    s = {}
    for keys, cap in ((STATIC_STAT_KEYS, static_cap), (DYNAMIC_STAT_KEYS, dynamic_cap)):
        for k in keys:
            if "min_radii" in k or ("error_min" in k and "timestamp" not in k):
                s[k] = jnp.full((cap,), 1000.0, jnp.float32)
            elif "timestamp" in k:
                s[k] = jnp.full((cap,), -1.0, jnp.float32)
            else:
                s[k] = jnp.zeros((cap,), jnp.float32)
    return s


def empty_model(
    cfg: ModelConfig,
    static_capacity: int = CAPACITY_GRANULARITY,
    dynamic_capacity: int = 0,
    keyframe_capacity: int | None = None,
    duration: float | None = None,
) -> GaussianModel:
    dur = float(duration if duration is not None else max(cfg.start_duration, 1))
    if keyframe_capacity is None:
        max_dur = cfg.duration if cfg.duration > 0 else dur
        keyframe_capacity = required_keyframes(max_dur, cfg) + 2
    params = _empty_static(static_capacity, cfg.sh_degree)
    params.update(_empty_dynamic(dynamic_capacity, keyframe_capacity, cfg.sh_degree,
                                 tangents=cfg.interp_type == "cubic_diff"))
    return GaussianModel(
        params=params,
        static_mask=jnp.zeros((static_capacity,), bool),
        dynamic_mask=jnp.zeros((dynamic_capacity,), bool),
        stats=_init_stats(static_capacity, dynamic_capacity),
        active_sh_degree=jnp.zeros((), jnp.int32),
        duration=jnp.asarray(dur, jnp.float32),
        keyframe_num=jnp.zeros((), jnp.int32),
    )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    cfg: ModelConfig,
    duration: float | None = None,
    static_capacity: int | None = None,
    dynamic_capacity: int = 0,
    keyframe_capacity: int | None = None,
) -> GaussianModel:
    """Initialize the static cloud from a colored point cloud
    (c_gaussian_model.py:385-410): SH DC from RGB, log-scales from
    sqrt(mean 3-NN squared distance), opacity sigma^-1(0.1), identity quats,
    zero displacement."""
    n = points.shape[0]
    cap = static_capacity or round_capacity(n)
    model = empty_model(cfg, cap, dynamic_capacity, keyframe_capacity, duration)

    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(mean_knn_dist2(pts), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    sh_dc = rgb_to_sh0(jnp.asarray(colors, jnp.float32))  # [n, 3]
    params = dict(model.params)
    params["xyz"] = params["xyz"].at[:n].set(pts)
    params["f_dc"] = params["f_dc"].at[:n, 0].set(sh_dc)
    params["scaling"] = params["scaling"].at[:n].set(scales)
    params["opacity"] = params["opacity"].at[:n].set(
        inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))
    )
    return model._replace(
        params=params, static_mask=model.static_mask.at[:n].set(True)
    )


def oneup_sh_degree(model: GaussianModel, max_degree: int) -> GaussianModel:
    return model._replace(
        active_sh_degree=jnp.minimum(model.active_sh_degree + 1, max_degree)
    )
