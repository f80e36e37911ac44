"""Core 3D math: quaternions, covariances, camera matrices, spherical harmonics.

Numerics mirror the reference Ex4DGS pipeline (see /root/reference):
  - cov3D from scale/quat:            cuda_rasterizer/forward.cu:128-162
  - EWA 2D covariance + low-pass:     cuda_rasterizer/forward.cu:74-124
  - SH evaluation w/ clamp tracking:  cuda_rasterizer/forward.cu:20-71
  - camera matrices:                  utils/graphics_utils.py:45-117

Conventions (differ deliberately from the reference's transposed-torch-tensor
layout): all matrices here are *mathematical*, acting on column vectors.
`view` is the 4x4 world->camera matrix (p_cam = view @ [p,1]); `proj` is the
full 4x4 clip projection (proj = P @ view). The reference's
`world_view_transform` equals `view.T`.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

# Real spherical harmonic constants (degrees 0..3), identical to the
# reference's auxiliary.h / utils/sh_utils.py.
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def quat_to_rotmat(q: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Quaternion (w, x, y, z) [..., 4] -> rotation matrix [..., 3, 3].

    With normalize=False this matches the rasterizer's computeCov3D which
    consumes the raw (unnormalized) quaternion (forward.cu:137 keeps `q = rot`).
    """
    if normalize:
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)], -1
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)], -1
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)], -1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def cov3d_from_scaling_rotation(
    scaling: jnp.ndarray, rotation: jnp.ndarray, scale_modifier: float = 1.0
) -> jnp.ndarray:
    """World-space covariance Sigma = R S^2 R^T, packed to 6 upper-triangular
    entries (xx, xy, xz, yy, yz, zz). Mirrors forward.cu:128-162 (note: the
    quaternion is NOT normalized there, matching the reference kernel).

    Written as componentwise [P]-array math, NOT batched [P,3,3] matmuls: TPU
    lays a trailing dim of 3 on 3 of 128 lanes, so tiny-matrix batching runs
    at ~2% VPU occupancy while flat [P] arrays use every lane (the vectorized
    analog of the reference's per-thread scalar code)."""
    r = rotation[..., 0]
    x = rotation[..., 1]
    y = rotation[..., 2]
    z = rotation[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - r * z)
    r02 = 2.0 * (x * z + r * y)
    r10 = 2.0 * (x * y + r * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - r * x)
    r20 = 2.0 * (x * z - r * y)
    r21 = 2.0 * (y * z + r * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    s0 = scale_modifier * scaling[..., 0]
    s1 = scale_modifier * scaling[..., 1]
    s2 = scale_modifier * scaling[..., 2]
    # M = R diag(s); Sigma = M M^T
    m00, m01, m02 = r00 * s0, r01 * s1, r02 * s2
    m10, m11, m12 = r10 * s0, r11 * s1, r12 * s2
    m20, m21, m22 = r20 * s0, r21 * s1, r22 * s2
    return jnp.stack(
        [
            m00 * m00 + m01 * m01 + m02 * m02,
            m00 * m10 + m01 * m11 + m02 * m12,
            m00 * m20 + m01 * m21 + m02 * m22,
            m10 * m10 + m11 * m11 + m12 * m12,
            m10 * m20 + m11 * m21 + m12 * m22,
            m20 * m20 + m21 * m21 + m22 * m22,
        ],
        axis=-1,
    )


def unpack_sym3(packed: jnp.ndarray) -> jnp.ndarray:
    """(xx, xy, xz, yy, yz, zz) [..., 6] -> full symmetric [..., 3, 3]."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        axis=-2,
    )


def ewa_project_cov(
    mean_cam: jnp.ndarray,
    cov3d: jnp.ndarray,
    view_rot: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    kernel_size: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """EWA splatting 2D covariance with Mip-Splatting-style low-pass dilation.

    Args:
      mean_cam: [..., 3] Gaussian center in camera space.
      cov3d:    [..., 6] packed world-space covariance.
      view_rot: [3, 3] world->camera rotation block.
      kernel_size: low-pass dilation added to the cov2d diagonal.

    Returns:
      cov2d: [..., 3] dilated (a, b, c) of [[a, b], [b, c]].
      coef:  [...] opacity compensation sqrt(det0/det1) (0 where degenerate).

    Mirrors forward.cu:74-124 including the 1.3*tanfov view-frustum clamp of
    the Jacobian linearization point and all epsilons. Componentwise [P]-array
    math (see cov3d_from_scaling_rotation) — batched [P,2,3]x[P,3,3] matmuls
    would run on 2-3 of 128 lanes.
    """
    tx, ty, tz = mean_cam[..., 0], mean_cam[..., 1], mean_cam[..., 2]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    tx = jnp.clip(tx / tz, -limx, limx) * tz
    ty = jnp.clip(ty / tz, -limy, limy) * tz

    # J: d(image plane)/d(camera space) at the clamped linearization point.
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    j00 = focal_x * inv_tz
    j02 = -focal_x * tx * inv_tz2
    j11 = focal_y * inv_tz
    j12 = -focal_y * ty * inv_tz2
    # T = J @ W (W = view_rot, shared [3,3] scalars)
    w = view_rot
    t00 = j00 * w[0, 0] + j02 * w[2, 0]
    t01 = j00 * w[0, 1] + j02 * w[2, 1]
    t02 = j00 * w[0, 2] + j02 * w[2, 2]
    t10 = j11 * w[1, 0] + j12 * w[2, 0]
    t11 = j11 * w[1, 1] + j12 * w[2, 1]
    t12 = j11 * w[1, 2] + j12 * w[2, 2]
    vxx = cov3d[..., 0]
    vxy = cov3d[..., 1]
    vxz = cov3d[..., 2]
    vyy = cov3d[..., 3]
    vyz = cov3d[..., 4]
    vzz = cov3d[..., 5]
    # cov2d = T V T^T expanded over the packed symmetric entries
    a = (
        t00 * t00 * vxx + t01 * t01 * vyy + t02 * t02 * vzz
        + 2.0 * (t00 * t01 * vxy + t00 * t02 * vxz + t01 * t02 * vyz)
    )
    b = (
        t00 * t10 * vxx + t01 * t11 * vyy + t02 * t12 * vzz
        + (t00 * t11 + t01 * t10) * vxy
        + (t00 * t12 + t02 * t10) * vxz
        + (t01 * t12 + t02 * t11) * vyz
    )
    c = (
        t10 * t10 * vxx + t11 * t11 * vyy + t12 * t12 * vzz
        + 2.0 * (t10 * t11 * vxy + t10 * t12 * vxz + t11 * t12 * vyz)
    )

    det0 = jnp.maximum(1e-6, a * c - b * b)
    det1 = jnp.maximum(1e-6, (a + kernel_size) * (c + kernel_size) - b * b)
    coef = jnp.sqrt(det0 / (det1 + 1e-6) + 1e-6)
    coef = jnp.where((det0 <= 1e-6) | (det1 <= 1e-6), 0.0, coef)
    cov2d = jnp.stack([a + kernel_size, b, c + kernel_size], axis=-1)
    return cov2d, coef


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate real SH (deg<=3) colors. sh [..., K, 3], dirs [..., 3] (unit).

    Returns raw RGB *before* the +0.5 shift / clamp (mirrors
    utils/sh_utils.py:57-112 & forward.cu:20-63)."""
    result = SH_C0 * sh[..., 0, :]
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :] - SH_C1 * x * sh[..., 3, :]
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * sh[..., 4, :]
                + SH_C2[1] * yz * sh[..., 5, :]
                + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                + SH_C2[3] * xz * sh[..., 7, :]
                + SH_C2[4] * (xx - yy) * sh[..., 8, :]
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                    + SH_C3[1] * xy * z * sh[..., 10, :]
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                    + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                    + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :]
                )
    return result


def sh_to_rgb(deg: int, sh: jnp.ndarray, means: jnp.ndarray, campos: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB as the rasterizer does (forward.cu:20-71).

    The clamp at 0 naturally zeroes the gradient where clamped, matching the
    reference's explicit `clamped` bookkeeping under autodiff."""
    dirs = means - campos
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC shift: (rgb - 0.5) / SH_C0 (utils/sh_utils.py:114-115)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * SH_C0 + 0.5


# ---------------------------------------------------------------------------
# Camera matrices (host-side numpy; tiny and built once per camera).
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->camera 4x4 from COLMAP-style (R, t).

    R is the camera-to-world rotation as stored by the reference's readers
    (they pass `R.transpose()` into the w2c block, graphics_utils.py:45-56);
    t is the world->camera translation. Optional recentering/rescaling of the
    camera center mirrors getWorld2View2."""
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(
    znear: float, zfar: float, fovx: float, fovy: float, cx: float = 0.0, cy: float = 0.0
) -> np.ndarray:
    """Perspective projection, optionally off-center (cx, cy in [-0.5, 0.5]).

    Mirrors graphics_utils.py:getProjectionMatrix (cx=cy=0) and
    getProjectionMatrixCV, including their differing P[2,2] conventions."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    bottom = -top
    right = tan_half_fovx * znear
    left = -right
    off_center = cx != 0.0 or cy != 0.0
    if off_center:
        dx = (2 * tan_half_fovx * znear) * cx
        dy = (2 * tan_half_fovy * znear) * cy
        left += dx
        right += dx
        top += dy
        bottom += dy
    P = np.zeros((4, 4), dtype=np.float64)
    P[0, 0] = 2.0 * znear / (right - left)
    P[1, 1] = 2.0 * znear / (top - bottom)
    P[0, 2] = (right + left) / (right - left)
    P[1, 2] = (top + bottom) / (top - bottom)
    P[3, 2] = 1.0
    if off_center:
        P[2, 2] = (zfar + znear) / (zfar - znear)
    else:
        P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P.astype(np.float32)


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc2pix(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1, 1] -> pixel center coordinates (auxiliary.h:ndc2Pix)."""
    return ((v + 1.0) * size - 1.0) * 0.5


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))
