"""Tile binning: expand visible Gaussians into per-tile depth-sorted instance
lists with fully static shapes.

TPU-native replacement for the reference's CUB prefix-scan + 64-bit radix sort
(rasterizer_impl.cu:72-140, 293-336). The dynamic `num_rendered` becomes a
static `capacity` with masked overflow:

  1. per-Gaussian tile counts -> inclusive prefix sum (cumsum);
  2. each of `capacity` instance slots finds its source Gaussian with a
     searchsorted over the prefix sums (the inverse of CUDA's
     duplicateWithKeys scatter — gather-based, so shapes stay static);
  3. lexicographic sort on (tile_id, depth) via jax.lax.sort with 2 keys
     (the analog of the packed [tile<<32 | float-depth-bits] radix keys);
  4. per-tile (start, end) ranges via searchsorted (identifyTileRanges).

Overflow behavior: instances beyond `capacity` are dropped *from the back of
the prefix-sum order* (high Gaussian index). `total` is returned so callers
can detect overflow and re-bin with a larger capacity at a host sync point.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected


class Binning(NamedTuple):
    order: jnp.ndarray  # [capacity] int32 Gaussian index per sorted instance
    tile_id: jnp.ndarray  # [capacity] int32 tile per sorted instance (T = pad)
    tile_start: jnp.ndarray  # [num_tiles] int32
    tile_stop: jnp.ndarray  # [num_tiles] int32
    total: jnp.ndarray  # [] int32 true instance count (may exceed capacity)


def bin_gaussians(proj: Projected, grid_x: int, grid_y: int, capacity: int) -> Binning:
    num_tiles = grid_x * grid_y
    counts = proj.tiles_touched.astype(jnp.int32)
    cum = jnp.cumsum(counts)  # inclusive
    total = cum[-1] if counts.shape[0] > 0 else jnp.zeros((), jnp.int32)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    gauss = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    gauss_c = jnp.minimum(gauss, counts.shape[0] - 1)
    local = slots - (jnp.take(cum, gauss_c) - jnp.take(counts, gauss_c))
    in_range = slots < total

    rmin = jnp.take(proj.rect_min, gauss_c, axis=0)
    rmax = jnp.take(proj.rect_max, gauss_c, axis=0)
    rect_w = jnp.maximum(rmax[:, 0] - rmin[:, 0], 1)
    dy = local // rect_w
    dx = local - dy * rect_w
    tile = (rmin[:, 1] + dy) * grid_x + (rmin[:, 0] + dx)
    tile = jnp.where(in_range, tile, num_tiles)  # sentinel sorts to the end

    depth = jnp.take(proj.depth, gauss_c)
    tile_s, _depth_s, order = jax.lax.sort(
        (tile, depth, gauss_c), dimension=0, num_keys=2, is_stable=True
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(tile_s, tile_ids, side="left").astype(jnp.int32)
    stop = jnp.searchsorted(tile_s, tile_ids, side="right").astype(jnp.int32)
    return Binning(order=order, tile_id=tile_s, tile_start=start, tile_stop=stop, total=total)


def required_capacity(total: int, granularity: int = 65536) -> int:
    """Round a host-side instance count up to a bucketed static capacity to
    bound recompilation under jit."""
    return max(granularity, ((int(total) + granularity - 1) // granularity) * granularity)
