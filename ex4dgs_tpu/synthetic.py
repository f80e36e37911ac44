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


def rig_cameras(n, radius, width, height, target=(0, 0, 0),
                elevs=(0.2, 0.5), **kw):
    """An N3V-like capture rig: n cameras around a ring, alternating between
    two elevations (the reference scenes are ~19-camera arcs at more than one
    height — a single coplanar ring leaves view-direction space, and so SH
    fitting, badly conditioned)."""
    cams = []
    for i in range(n):
        a = 2 * math.pi * i / max(n, 1)
        e = elevs[i % len(elevs)]
        eye = (radius * math.cos(a), e * radius, radius * math.sin(a))
        cams.append(lookat_camera(eye, target, (0, 1, 0), width, height, **kw))
    return cams


def _smooth_color(p: np.ndarray, freqs: np.ndarray, phases: np.ndarray) -> np.ndarray:
    """Low-frequency procedural color field in [0.08, 0.92]: a few sinusoids
    of the 3-D position per channel — smooth enough to be reconstructable
    from a sparse camera rig, textured enough that PSNR means something."""
    c = np.stack([
        np.sin(p @ freqs[3 * k] + phases[3 * k])
        + 0.5 * np.sin(p @ freqs[3 * k + 1] + phases[3 * k + 1])
        + 0.25 * np.sin(p @ freqs[3 * k + 2] + phases[3 * k + 2])
        for k in range(3)
    ], axis=-1)  # in [-1.75, 1.75]
    return (0.5 + c / 4.2).astype(np.float32)


def make_surface_scene(
    n_static: int = 50_000,
    n_dynamic: int = 5_000,
    duration: float = 8.0,
    seed: int = 0,
    cfg: ModelConfig | None = None,
    static_capacity: int | None = None,
    dynamic_capacity: int | None = None,
) -> tuple[GaussianModel, ModelConfig]:
    """A RECONSTRUCTABLE synthetic capture: textured ground plane + static
    spheres, plus small rigidly-moving dynamic spheres.

    make_scene's random volumetric dust fits the training views but is
    ill-posed for novel-view synthesis (each splat's shape/opacity must be
    rediscovered from the rig, and between-view occlusion states are
    unconstrained — measured: train 34 dB / held-out flat at ~17 dB at
    800x600). Real N3V/Technicolor content is surfaces; this target gives
    the config-2 quality anchor the same character: points ON 2-D surfaces,
    smooth color fields, near-opaque splats sized to the surface sampling
    density."""
    if cfg is None:
        cfg = ModelConfig(time_interval=5, start_duration=5,
                          duration=int(duration), near=0.2, far=100.0)
    rng = np.random.default_rng(seed)

    n_plane = n_static // 2
    n_blob = n_static - n_plane
    # ground plane y=-0.9, extent +-1.7
    pp = np.empty((n_plane, 3), np.float32)
    pp[:, 0] = rng.uniform(-1.7, 1.7, n_plane)
    pp[:, 2] = rng.uniform(-1.7, 1.7, n_plane)
    pp[:, 1] = -0.9
    plane_spacing = math.sqrt(3.4 * 3.4 / max(n_plane, 1))

    # static spheres above the plane
    K = 6
    centers = np.stack([
        rng.uniform(-1.1, 1.1, K),
        rng.uniform(-0.5, 0.35, K),
        rng.uniform(-1.1, 1.1, K),
    ], axis=1).astype(np.float32)
    radii = rng.uniform(0.25, 0.5, K).astype(np.float32)
    counts = np.full(K, n_blob // K)
    counts[: n_blob % K] += 1
    bp = []
    bsp = []
    for k in range(K):
        d = rng.normal(size=(counts[k], 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        bp.append(centers[k] + radii[k] * d)
        bsp.append(np.full(counts[k],
                           math.sqrt(4 * math.pi * radii[k] ** 2 / max(counts[k], 1))))
    pts = np.concatenate([pp] + bp).astype(np.float32)
    spacing = np.concatenate(
        [np.full(n_plane, plane_spacing)] + bsp).astype(np.float32)

    freqs = rng.uniform(-4.0, 4.0, size=(9, 3))
    phases = rng.uniform(0, 2 * np.pi, size=9)
    cols = _smooth_color(pts, freqs, phases)

    sc = static_capacity or max(1, n_static)
    dc = dynamic_capacity if dynamic_capacity is not None else n_dynamic
    model = create_from_pcd(pts, cols, cfg, duration=duration,
                            static_capacity=sc, dynamic_capacity=dc)
    from .ops.math3d import inverse_sigmoid

    log_scale = np.log(np.clip(0.7 * spacing, 1e-4, 0.05))[:, None]
    p = dict(model.params)
    p["scaling"] = p["scaling"].at[:n_static].set(
        jnp.asarray(np.repeat(log_scale, 3, axis=1)))
    p["opacity"] = p["opacity"].at[:n_static].set(
        float(inverse_sigmoid(np.float32(0.95))))
    model = model._replace(params=p)

    if n_dynamic > 0:
        kf = model.keyframe_capacity
        p = dict(model.params)
        # a few small spheres on rigid closed paths (smooth keyframe motion)
        D = 3
        dcounts = np.full(D, n_dynamic // D)
        dcounts[: n_dynamic % D] += 1
        ts = np.arange(kf, dtype=np.float32)
        dyn_pts = []
        dyn_traj = []
        dyn_spacing = []
        for k in range(D):
            r = 0.18
            d = rng.normal(size=(dcounts[k], 3))
            d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
            base = (r * d).astype(np.float32)  # body frame
            c0 = np.array([rng.uniform(-0.8, 0.8), rng.uniform(-0.3, 0.3),
                           rng.uniform(-0.8, 0.8)], np.float32)
            ax = rng.uniform(0, 2 * np.pi)
            # circular arc path, ~0.6 world units over the duration
            w = 0.25 + 0.1 * k
            path = 0.45 * np.stack([
                np.cos(w * ts + ax), 0.3 * np.sin(2 * w * ts + ax),
                np.sin(w * ts + ax),
            ], axis=1).astype(np.float32)  # [kf, 3]
            dyn_pts.append(c0 + base)
            dyn_traj.append(c0[None, None] + path[None] + base[:, None])
            dyn_spacing.append(np.full(
                dcounts[k], math.sqrt(4 * math.pi * r * r / max(dcounts[k], 1))))
        dyn_pts = np.concatenate(dyn_pts).astype(np.float32)
        traj = np.concatenate(dyn_traj).astype(np.float32)  # [n_dyn, kf, 3]
        dspacing = np.concatenate(dyn_spacing).astype(np.float32)
        dcols = _smooth_color(dyn_pts * 1.7, freqs, phases)

        p["motion_xyz"] = p["motion_xyz"].at[:n_dynamic].set(jnp.asarray(traj))
        from .ops.math3d import rgb_to_sh0

        p["motion_f_dc"] = p["motion_f_dc"].at[:n_dynamic, 0].set(
            jnp.asarray(rgb_to_sh0(dcols)))
        p["motion_scaling"] = p["motion_scaling"].at[:n_dynamic].set(
            jnp.asarray(np.repeat(
                np.log(np.clip(0.7 * dspacing, 1e-4, 0.05))[:, None], 3, axis=1)))
        p["motion_opacity"] = p["motion_opacity"].at[:n_dynamic].set(
            float(inverse_sigmoid(np.float32(0.95))))
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
