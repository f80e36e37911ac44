"""Tiled rasterizer, pure-jnp implementation.

Consumes the static-shape binning (ops/binning.py) and blends every tile's
depth-ordered instance list with the shared compositing core. This is the
portable implementation: it runs anywhere (CPU tests, TPU fallback), is
differentiable end-to-end by autodiff, and defines the semantics the Pallas
TPU kernels (ops/rasterize_pallas.py) must reproduce bit-for-bit-ish.

Shape strategy: one lax.scan over fixed-size chunks of each tile's instance
range (all tiles advance in lockstep, masked beyond their own range). The
scan trip count is ceil(max_per_tile / chunk) with a *static* max_per_tile
bound chosen by the caller.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import compositing as comp
from .binning import Binning
from .projection import TILE_X, TILE_Y, Projected


def gather_sorted(proj: Projected, colors: jnp.ndarray, flow: jnp.ndarray, binning: Binning):
    """Gather per-instance data in sorted (tile, depth) order.

    One big XLA gather — its autodiff transpose is exactly the deterministic
    segment-sum that replaces the reference backward's atomicAdd scatters."""
    g = binning.order
    # "clip": the aligned layout's dead slots carry an out-of-range sentinel
    # id (binning.align_binning); their rows are masked by start/stop, so the
    # clamped garbage is never blended (the default "fill" mode would
    # poison them with NaN instead).
    xy = jnp.take(proj.xy, g, axis=0, mode="clip")
    conic = jnp.take(proj.conic, g, axis=0, mode="clip")
    opac = jnp.take(proj.opacity * proj.valid, g, mode="clip")
    feats = comp.make_features(
        jnp.take(colors, g, axis=0, mode="clip"),
        jnp.take(proj.depth, g, mode="clip"),
        jnp.take(flow, g, axis=0, mode="clip"),
    )
    return xy, conic, opac, feats, g


def tile_pixels(grid_x: int, grid_y: int) -> jnp.ndarray:
    """Pixel coordinates per tile: [num_tiles, TILE_Y*TILE_X, 2] (x, y)."""
    ty, tx = jnp.mgrid[0:grid_y, 0:grid_x]
    py, px = jnp.mgrid[0:TILE_Y, 0:TILE_X]
    x = tx.reshape(-1, 1) * TILE_X + px.reshape(1, -1)  # [T, S]
    y = ty.reshape(-1, 1) * TILE_Y + py.reshape(1, -1)
    return jnp.stack([x, y], axis=-1).astype(jnp.float32)


def composite_slab(
    proj: Projected,
    colors: jnp.ndarray,
    flow: jnp.ndarray,
    binning: Binning,
    *,
    grid_x: int,
    t0,
    num_local: int,
    starts: jnp.ndarray,  # [num_local] — the slab's LOCAL per-tile ranges
    stops: jnp.ndarray,
    bg: jnp.ndarray,
    max_depth: float,
    chunk: int = 128,
    max_per_tile: int | None = None,
) -> comp.RenderOutputs:
    """Composite a slab of `num_local` tiles starting at GLOBAL tile index t0
    (traced; only sets pixel coordinates), returning per-tile pixel blocks
    [num_local, TILE_Y*TILE_X, ...]. starts/stops index into `binning`'s
    instance buffer — with slab-local binning (bin_gaussians row0/rows) that
    buffer holds only this slab's instances.

    This is the unit the tile-sharding axis distributes (parallel/step_dp.py):
    each device bins and blends only its slab's contiguous instance ranges,
    so per-chip cost drops with the axis size."""
    capacity = binning.order.shape[0]
    if max_per_tile is None:
        max_per_tile = capacity
    steps = max(1, -(-max_per_tile // chunk))

    xy, conic, opac, feats, gid = gather_sorted(proj, colors, flow, binning)

    ids = t0 + jnp.arange(num_local, dtype=jnp.int32)
    ty = ids // grid_x
    tx = ids - ty * grid_x
    py, px = jnp.mgrid[0:TILE_Y, 0:TILE_X]
    x = tx.reshape(-1, 1) * TILE_X + px.reshape(1, -1)
    y = ty.reshape(-1, 1) * TILE_Y + py.reshape(1, -1)
    pixf = jnp.stack([x, y], axis=-1).astype(jnp.float32)  # [L, S, 2]

    start = starts
    stop = stops

    def step_fn(carry, j):
        idx = start[:, None] + j * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        ok = idx < stop[:, None]
        idx_c = jnp.clip(idx, 0, capacity - 1)
        xy_c = jnp.take(xy, idx_c, axis=0)[:, None]
        conic_c = jnp.take(conic, idx_c, axis=0)[:, None]
        opac_c = jnp.take(opac, idx_c, axis=0)[:, None]
        feats_c = jnp.take(feats, idx_c, axis=0)[:, None]
        gid_c = jnp.take(gid, idx_c, axis=0)[:, None]
        return comp.blend_chunk(
            carry, pixf, xy_c, conic_c, opac_c, feats_c, ok[:, None], gid_c
        ), None

    carry0 = comp.init_carry((num_local, TILE_Y * TILE_X), 8)
    carry, _ = jax.lax.scan(
        jax.checkpoint(step_fn), carry0, jnp.arange(steps, dtype=jnp.int32)
    )
    return comp.finalize(carry, bg, max_depth)


def rasterize_tiled(
    proj: Projected,
    colors: jnp.ndarray,
    flow: jnp.ndarray,
    binning: Binning,
    *,
    width: int,
    height: int,
    bg: jnp.ndarray,
    max_depth: float,
    chunk: int = 128,
    max_per_tile: int | None = None,
    subpixel_offset: jnp.ndarray | None = None,
) -> comp.RenderOutputs:
    """Render [H, W] outputs via the tile decomposition."""
    grid_x = (width + TILE_X - 1) // TILE_X
    grid_y = (height + TILE_Y - 1) // TILE_Y
    num_tiles = grid_x * grid_y
    capacity = binning.order.shape[0]
    if max_per_tile is None:
        max_per_tile = capacity
    steps = max(1, -(-max_per_tile // chunk))

    xy, conic, opac, feats, gid = gather_sorted(proj, colors, flow, binning)

    pixf = tile_pixels(grid_x, grid_y)  # [T, S, 2]
    if subpixel_offset is not None:
        pad_y = grid_y * TILE_Y - height
        pad_x = grid_x * TILE_X - width
        off = jnp.pad(subpixel_offset, ((0, pad_y), (0, pad_x), (0, 0)))
        off = (
            off.reshape(grid_y, TILE_Y, grid_x, TILE_X, 2)
            .transpose(0, 2, 1, 3, 4)
            .reshape(num_tiles, TILE_Y * TILE_X, 2)
        )
        pixf = pixf + off

    start = binning.tile_start  # [T]
    stop = binning.tile_stop

    def step_fn(carry, j):
        idx = start[:, None] + j * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        ok = idx < stop[:, None]
        idx_c = jnp.clip(idx, 0, capacity - 1)
        # [T, 1, C, ...] broadcasting against pixel dim S
        xy_c = jnp.take(xy, idx_c, axis=0)[:, None]
        conic_c = jnp.take(conic, idx_c, axis=0)[:, None]
        opac_c = jnp.take(opac, idx_c, axis=0)[:, None]
        feats_c = jnp.take(feats, idx_c, axis=0)[:, None]
        gid_c = jnp.take(gid, idx_c, axis=0)[:, None]
        carry = comp.blend_chunk(
            carry, pixf, xy_c, conic_c, opac_c, feats_c, ok[:, None], gid_c
        )
        return carry, None

    carry0 = comp.init_carry((num_tiles, TILE_Y * TILE_X), 8)
    # Remat each chunk: the autodiffed scan would otherwise save
    # [steps, tiles, px, chunk]-sized residuals (tens of GB at N3V size);
    # recomputing the blend in the backward sweep costs ~2x FLOPs for ~0 extra
    # memory — the same trade the reference backward makes by re-walking the
    # per-tile lists (backward.cu:426-682).
    carry, _ = jax.lax.scan(
        jax.checkpoint(step_fn), carry0, jnp.arange(steps, dtype=jnp.int32)
    )
    out = comp.finalize(carry, bg, max_depth)

    def to_image(arr):
        return comp.tiles_to_image(arr, grid_y, grid_x, TILE_Y, TILE_X,
                                   height, width)

    return comp.RenderOutputs(
        color=to_image(out.color),
        depth=to_image(out.depth),
        flow=to_image(out.flow),
        acc=to_image(out.acc),
        final_t=to_image(out.final_t),
        idx=to_image(out.idx),
    )
