"""Temporal interpolation primitives for keyframed dynamic Gaussians.

Re-derivations of the reference formulas (utils/interpolations.py:6-107),
vectorized over [P, K, D] keyframe arrays with a *batched* gather at traced
keyframe indices so a whole training step stays inside one jit.

All interpolators share the keyframe convention of the reference model
(scene/c_gaussian_model.py:182-215): a query at time t maps to
  t' = t + time_shift;  k = floor(t'/interval);  dt = (t' mod interval)/interval
and interpolates between keyframes around k.
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_interp(y0: jnp.ndarray, y1: jnp.ndarray, t) -> jnp.ndarray:
    return y0 * (1.0 - t) + y1 * t


def _hermite(y_k, y_k1, m_k, m_k1, t):
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    return h00 * y_k + h10 * m_k + h01 * y_k1 + h11 * m_k1


def cube_interp(y_km1, y_k, y_k1, y_k2, t):
    """Catmull-Rom-style cubic Hermite (the reference's default "cube",
    interpolations.py:81-93): tangents are central differences / 2."""
    m_k = (y_k1 - y_km1) / 2.0
    m_k1 = (y_k2 - y_k) / 2.0
    return _hermite(y_k, y_k1, m_k, m_k1, t)


def pchip_interp(y_km1, y_k, y_k1, y_k2, t):
    """Monotone (PCHIP-style) Hermite (interpolations.py:65-77)."""
    d0 = (y_k1 - y_k) * (y_k - y_km1)
    m_k = jnp.where(d0 > 0, d0 / (y_k1 - y_km1) * 2.0, jnp.zeros_like(y_k))
    d1 = (y_k2 - y_k1) * (y_k1 - y_k)
    m_k1 = jnp.where(d1 > 0, d1 / (y_k2 - y_k) * 2.0, jnp.zeros_like(y_k))
    return _hermite(y_k, y_k1, m_k, m_k1, t)


def cubic_diff_interp(y_k, y_k1, yd_k, yd_k1, t):
    """Hermite with explicitly-parameterized tangents (interpolations.py:97-107)."""
    return _hermite(y_k, y_k1, yd_k, yd_k1, t)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical linear interpolation with the reference's exact guards
    (interpolations.py:33-52): dot clamped to +/-(1-1e-4), omega floor 1e-4,
    weights renormalized, zero-vector fallback to q0."""
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    q1 = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    d = jnp.clip(d, -1 + 1e-4, 1 - 1e-4)
    omega = jnp.maximum(jnp.arccos(d), 1e-4)
    s_omega = jnp.maximum(jnp.sin(omega), 1e-4)
    p0 = jnp.sin((1.0 - t) * omega) / s_omega
    p1 = jnp.sin(t * omega) / s_omega
    p_sum = jnp.maximum(p0 + p1, 1e-4)
    p0 = p0 / p_sum
    p1 = p1 / p_sum
    ret = q0 * p0 + q1 * p1
    ret = jnp.where(jnp.sum(jnp.abs(ret), axis=-1, keepdims=True) > 1e-4, ret, q0)
    return ret / jnp.linalg.norm(ret, axis=-1, keepdims=True)


def time_bigaussian(center: jnp.ndarray, var: jnp.ndarray, t, var_min: float) -> jnp.ndarray:
    """Two-sided temporal opacity envelope (interpolations.py:55-61).

    center: [P, 2] window ends (in keyframe units); var: [P, 2] log-widths.
    Returns [P] multiplier: 1 inside the window, Gaussian falloff outside with
    side-dependent width exp(var) + var_min/2.36."""
    m = jnp.min(t - center, axis=1)
    v = jnp.where(jnp.any(t > center, axis=1), var[:, 1], var[:, 0])
    opa = jnp.exp(-(m**2) / (jnp.exp(v) + var_min / 2.36) ** 2)
    inside = (center[:, 0] - t) * (center[:, 1] - t) < 0
    return jnp.where(inside, jnp.ones_like(opa), opa)


def keyframe_coords(t, time_shift: float, interval: float):
    """Map a scene timestamp to (keyframe index, fractional offset)."""
    tt = t + time_shift
    k = jnp.floor(tt / interval).astype(jnp.int32)
    dt = (tt % interval) / interval
    return k, dt


def gather_keyframes(y: jnp.ndarray, k, offsets: tuple[int, ...]):
    """Gather y[:, k+o] for each o in offsets. y: [P, K, D]; k scalar traced int."""
    return tuple(jnp.take(y, k + o, axis=1) for o in offsets)


def interp_keyframes(kind: str, y: jnp.ndarray, k, dt,
                     y_d: jnp.ndarray | None = None) -> jnp.ndarray:
    """Dispatch positional interpolation over keyframe axis 1 of y [P, K, D].

    kind: 'linear' | 'cube' | 'pchip' | 'cubic_diff'. For 'cubic_diff' a
    tangent keyframe array `y_d` of the same shape as `y` must be supplied
    (the reference's quad_diff_interpolate, interpolations.py:97-107, whose
    dispatch at c_gaussian_model.py:125-132 expects a separate y_d tensor).
    k/dt from keyframe_coords.
    """
    if kind == "linear":
        y0, y1 = gather_keyframes(y, k, (0, 1))
        return linear_interp(y0, y1, dt)
    if kind == "cube":
        ym1, y0, y1, y2 = gather_keyframes(y, k, (-1, 0, 1, 2))
        return cube_interp(ym1, y0, y1, y2, dt)
    if kind == "pchip":
        ym1, y0, y1, y2 = gather_keyframes(y, k, (-1, 0, 1, 2))
        return pchip_interp(ym1, y0, y1, y2, dt)
    if kind == "cubic_diff":
        if y_d is None:
            raise ValueError("cubic_diff needs a tangent array y_d")
        y0, y1 = gather_keyframes(y, k, (0, 1))
        yd0, yd1 = gather_keyframes(y_d, k, (0, 1))
        return cubic_diff_interp(y0, y1, yd0, yd1, dt)
    raise NotImplementedError(f"unknown interp kind: {kind}")


def interp_quat_keyframes(kind: str, y: jnp.ndarray, k, dt) -> jnp.ndarray:
    """Rotation interpolation: 'lerp' or 'slerp' between adjacent keyframes."""
    y0, y1 = gather_keyframes(y, k, (0, 1))
    if kind == "lerp":
        return linear_interp(y0, y1, dt)
    if kind == "slerp":
        return quat_slerp(y0, y1, dt)
    raise NotImplementedError(f"unknown rot interp kind: {kind}")
