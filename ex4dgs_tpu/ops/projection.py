"""Per-Gaussian preprocessing: frustum culling, projection, EWA covariance,
conic/radius/tile-extent computation.

TPU-native equivalent of the reference's preprocessCUDA
(cuda_rasterizer/forward.cu:165-269): fully vectorized jnp over the Gaussian
axis — XLA fuses this into a handful of elementwise kernels; no Pallas needed
(the hot loops are binning + compositing, not preprocess). Gradients come from
autodiff and match the reference's hand-written chains (backward.cu:144-423)
because the forward math is identical, including clamp/cull masking.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math3d import cov3d_from_scaling_rotation, ewa_project_cov, ndc2pix
from ..kernel_config import current as _kernel_config

# Tile shape in pixels. The reference uses 16x16 (config.h:16-17); on TPU
# wider tiles amortize per-tile fixed costs and cut the instance count
# (fewer tiles touched per splat), and the measured optimum 32x16 is the
# default (BASELINE.md round-3 tile sweep). Configured via kernel_config
# (EX4DGS_TILE env override or kernel_config.configure(); mutual
# constraints — e.g. 512+ px tiles need pair=1 — are validated there).
TILE_X, TILE_Y = _kernel_config().tile_x, _kernel_config().tile_y


class CameraArrays(NamedTuple):
    """Per-camera tensors consumed by the rasterizer (all float32)."""

    view: jnp.ndarray  # [4,4] world->camera (mathematical, column-vector)
    proj: jnp.ndarray  # [4,4] full projection = P @ view
    campos: jnp.ndarray  # [3] camera center in world space


class Projected(NamedTuple):
    """Per-Gaussian screen-space quantities."""

    xy: jnp.ndarray  # [P,2] pixel-space mean
    depth: jnp.ndarray  # [P] camera-space z
    conic: jnp.ndarray  # [P,3] inverse dilated 2D covariance (a,b,c)
    opacity: jnp.ndarray  # [P] opacity * low-pass compensation coef
    radius: jnp.ndarray  # [P] int32 screen radius (0 => culled)
    rect_min: jnp.ndarray  # [P,2] int32 tile rect (x,y), clamped to grid
    rect_max: jnp.ndarray  # [P,2] int32 (exclusive)
    tiles_touched: jnp.ndarray  # [P] int32
    valid: jnp.ndarray  # [P] bool


def tile_grid(width: int, height: int, tile: int | None = None) -> tuple[int, int]:
    tx, ty = (tile, tile) if tile is not None else (TILE_X, TILE_Y)
    return (width + tx - 1) // tx, (height + ty - 1) // ty


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraArrays,
    *,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    kernel_size: float,
    min_depth: float = 0.2,
    max_depth: float = 100.0,
    mean2d_ndc_offset: jnp.ndarray | None = None,
) -> Projected:
    """Project Gaussians to screen space.

    `mean2d_ndc_offset` is a zeros [P,3] tensor whose gradient captures
    dL/d(ndc mean) for densification statistics — the functional equivalent of
    the reference's `screenspace_points` dummy (gaussian_renderer/__init__.py:28,
    backward.cu:669-670 scale by 0.5*W == d(pixel)/d(ndc)).
    """
    P = means3d.shape[0]
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)

    # Componentwise [P]-array math instead of [P,4]x[4,4] matmuls / [P,k]
    # stacks: a trailing dim of 3-4 occupies 3-4 of 128 TPU lanes, so the
    # "vectorized" matrix form runs at ~3% VPU occupancy (measured 4x slower
    # fwd, 3x bwd for this stage).
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    def affine(row):
        return row[0] * mx + row[1] * my + row[2] * mz + row[3]

    p_view_z = affine(cam.view[2])
    ph_x = affine(cam.proj[0])
    ph_y = affine(cam.proj[1])
    ph_w = affine(cam.proj[3])
    p_w = 1.0 / (ph_w + 1e-7)
    px_ndc = ph_x * p_w
    py_ndc = ph_y * p_w
    if mean2d_ndc_offset is not None:
        px_ndc = px_ndc + mean2d_ndc_offset[:, 0]
        py_ndc = py_ndc + mean2d_ndc_offset[:, 1]

    depth = p_view_z
    # Frustum test (auxiliary.h:in_frustum): near/far on view z, +-1.3 NDC box.
    in_frustum = (
        (depth > min_depth)
        & (depth <= max_depth)
        & (jnp.abs(px_ndc) <= 1.3)
        & (jnp.abs(py_ndc) <= 1.3)
    )

    p_view = jnp.stack([affine(cam.view[0]), affine(cam.view[1]), p_view_z], -1)
    cov2d, coef = ewa_project_cov(
        p_view, cov3d, cam.view[:3, :3], focal_x, focal_y, tan_fovx, tan_fovy, kernel_size
    )
    a, b, c = cov2d[:, 0], cov2d[:, 1], cov2d[:, 2]
    det = a * c - b * b
    det_ok = det > 0.0
    safe_det = jnp.where(det_ok, det, 1.0)
    det_inv = 1.0 / safe_det
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)

    mid = 0.5 * (a + c)
    lam1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0)))
    # Opacity-aware tile extent: the compositor drops contributions with
    # alpha < 1/255 (forward.cu:380), so a splat's true support ends at
    # sigma*sqrt(2 ln(255*alpha)) — tighter than 3 sigma for faint splats.
    # The reported `radius` (and the visibility/big-point stats that consume
    # it) keeps the reference's 3-sigma value; only the binning rect shrinks,
    # which is lossless for the rendered image and its gradients.
    alpha_eff = jnp.maximum(opacities * coef, 1e-12)
    support = jnp.sqrt(2.0 * jnp.maximum(jnp.log(255.0 * alpha_eff), 1e-2))
    # Per-axis extents of the region the reference actually composites:
    # ellipse {power >= -t} (everything below the 1/255 alpha floor is
    # dropped, forward.cu:380) INTERSECTED with its 3*sqrt(lambda_max) square
    # (auxiliary.h getRect). The ellipse's axis-aligned bbox is
    # +-support*sqrt(cov_xx) x +-support*sqrt(cov_yy) (the inverse of the
    # conic quadratic form), so the bbox of the intersection is the per-axis
    # min with the square — strictly tighter than the reference's square for
    # anisotropic or faint splats, and image-lossless.
    radius3 = 3.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    rect_rx = jnp.ceil(
        jnp.minimum(support * jnp.sqrt(jnp.maximum(a, 0.0)), radius3)
    )
    rect_ry = jnp.ceil(
        jnp.minimum(support * jnp.sqrt(jnp.maximum(c, 0.0)), radius3)
    )

    pix_x = ndc2pix(px_ndc, width)
    pix_y = ndc2pix(py_ndc, height)
    xy = jnp.stack([pix_x, pix_y], axis=-1)

    grid_x, grid_y = tile_grid(width, height)
    # getRect (auxiliary.h:46-57), with one fix: the reference's
    # (v + BLOCK - 1) / BLOCK int-cast is a ceil only for INTEGER v — for a
    # fractional center it can exclude the last tile whose edge pixel is
    # still inside the radius (latent in the reference, masked there by its
    # looser 3-sigma-max square). floor(v / tile) + 1 is the exact exclusive
    # bound for the last covered pixel floor(v).
    rmin_x = jnp.clip(((pix_x - rect_rx) / TILE_X).astype(jnp.int32), 0, grid_x)
    rmin_y = jnp.clip(((pix_y - rect_ry) / TILE_Y).astype(jnp.int32), 0, grid_y)
    rmax_x = jnp.clip(
        jnp.floor((pix_x + rect_rx) / TILE_X).astype(jnp.int32) + 1, 0, grid_x
    )
    rmax_y = jnp.clip(
        jnp.floor((pix_y + rect_ry) / TILE_Y).astype(jnp.int32) + 1, 0, grid_y
    )
    tiles_touched = (rmax_x - rmin_x) * (rmax_y - rmin_y)

    valid = in_frustum & det_ok & (tiles_touched > 0)
    tiles_touched = jnp.where(valid, tiles_touched, 0)
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    return Projected(
        xy=xy,
        depth=depth,
        conic=conic,
        opacity=opacities * coef,
        radius=radius,
        rect_min=jnp.stack([rmin_x, rmin_y], -1),
        rect_max=jnp.stack([rmax_x, rmax_y], -1),
        tiles_touched=tiles_touched,
        valid=valid,
    )


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray, scale_modifier: float = 1.0):
    return cov3d_from_scaling_rotation(scales, rotations, scale_modifier)


def mark_visible(
    means3d: jnp.ndarray, cam: CameraArrays, min_depth: float = 0.2, max_depth: float = 100.0
) -> jnp.ndarray:
    """Standalone frustum-visibility test (rasterizer_impl.cu:markVisible)."""
    P = means3d.shape[0]
    hom = jnp.concatenate([means3d, jnp.ones((P, 1), means3d.dtype)], axis=1)
    p_view = hom @ cam.view[:3].T
    p_hom = hom @ cam.proj.T
    p_proj = p_hom[:, :3] / (p_hom[:, 3:4] + 1e-7)
    depth = p_view[:, 2]
    return (
        (depth > min_depth)
        & (depth <= max_depth)
        & (jnp.abs(p_proj[:, 0]) <= 1.3)
        & (jnp.abs(p_proj[:, 1]) <= 1.3)
    )
