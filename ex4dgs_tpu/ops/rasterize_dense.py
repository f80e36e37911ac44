"""Dense O(P * pixels) reference renderer — the exact oracle.

Numerically identical to the tiled path (same contribution semantics,
including the per-tile rect eligibility test the reference inherits from its
binning stage), but with no binning: every pixel considers every Gaussian in
global depth order. Used as the ground truth for every rasterizer test and,
via jax.grad, as the gradient oracle. Only feasible for small scenes.
"""
from __future__ import annotations

import jax.numpy as jnp

from . import compositing as comp
from .projection import TILE_X, TILE_Y, Projected


def rasterize_dense(
    proj: Projected,
    colors: jnp.ndarray,  # [P, 3]
    flow: jnp.ndarray,  # [P, 3]
    *,
    width: int,
    height: int,
    bg: jnp.ndarray,  # [3]
    max_depth: float,
    subpixel_offset: jnp.ndarray | None = None,
    chunk: int = 0,
) -> comp.RenderOutputs:
    """Render [H, W] images. chunk>0 processes Gaussians in depth-ordered
    chunks of that size (bounds peak memory to H*W*chunk)."""
    P = proj.xy.shape[0]
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    xy = proj.xy[order]
    conic = proj.conic[order]
    opac = jnp.where(proj.valid[order], proj.opacity[order], 0.0)
    rect_min = proj.rect_min[order]
    rect_max = proj.rect_max[order]
    valid = proj.valid[order]
    feats = comp.make_features(colors[order], proj.depth[order], flow[order])
    ids = order.astype(jnp.int32)

    ys, xs = jnp.mgrid[0:height, 0:width]
    pixf = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
    if subpixel_offset is not None:
        pixf = pixf + subpixel_offset
    tx = (xs // TILE_X)[..., None]  # [H, W, 1]
    ty = (ys // TILE_Y)[..., None]

    carry = comp.init_carry((height, width), 8)
    step = P if chunk <= 0 else chunk
    for s in range(0, P, step):
        sl = slice(s, min(s + step, P))
        in_rect = (
            (tx >= rect_min[sl, 0])
            & (tx < rect_max[sl, 0])
            & (ty >= rect_min[sl, 1])
            & (ty < rect_max[sl, 1])
        )  # [H, W, G]
        carry = comp.blend_chunk(
            carry,
            pixf,
            xy[sl],
            conic[sl],
            opac[sl] * valid[sl],
            feats[sl],
            in_rect & valid[sl],
            ids[sl],
        )
    return comp.finalize(carry, bg, max_depth)
