"""Alpha-compositing core: the TPU-native reformulation of the reference's
sequential front-to-back blend loop (cuda_rasterizer/forward.cu:274-462).

Key idea: for a depth-ordered chunk of Gaussians, the blend weights
    w_i = alpha_i * prod_{j<i} (1 - alpha_j)
are a cumulative product along the Gaussian axis — vectorizable — and every
accumulated output (color / depth / acc / flow) is then a single
[pixels x gaussians] @ [gaussians x features] matmul that maps onto the MXU.
Early termination (reference: latch `done` once T*(1-alpha) < 1e-4,
forward.cu:382-387) becomes a prefix mask: once the running transmittance
product (including post-termination alphas) drops below 1e-4 it can never
recover, so `applied = cum >= 1e-4` reproduces the latch exactly.

Reference-faithful gradient semantics (see backward.cu:426-682):
  * color path: true autodiff gradient == the reference's exact recurrence;
  * the 0.99 alpha clamp is forward-only (reference backward ignores it) —
    implemented as a straight-through estimator;
  * depth/flow outputs only propagate gradients into the per-Gaussian
    depth/flow features (weights are stop_gradient'ed), matching the
    reference's backward which routes dL_dflow only into dL_ddir
    (backward.cu:639-642) and exposes the aux error-backtracking channel;
  * acc output is fully stop_gradient'ed (the reference's acc-gradient path is
    never exercised: no loss ever attaches to it in train.py).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..kernel_config import current as _kernel_config

# Rebindable (kernel_config.configure()): tile->image assembly layout.
UNTILE = _kernel_config().untile

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4
T_SENTINEL = 1e30


class BlendCarry(NamedTuple):
    cum: jnp.ndarray  # [...] running transmittance product (incl. post-latch)
    t_final: jnp.ndarray  # [...] transmittance at last applied contribution
    accum: jnp.ndarray  # [..., F] accumulated w-weighted features
    max_vis: jnp.ndarray  # [...] max blend weight seen (dominant-idx tracking)
    best_idx: jnp.ndarray  # [...] int32 id of dominant contributor (-1 none)


def init_carry(pixel_shape: tuple[int, ...], num_features: int, dtype=jnp.float32) -> BlendCarry:
    return BlendCarry(
        cum=jnp.ones(pixel_shape, dtype),
        t_final=jnp.full(pixel_shape, T_SENTINEL, dtype),
        accum=jnp.zeros((*pixel_shape, num_features), dtype),
        max_vis=jnp.zeros(pixel_shape, dtype),
        best_idx=jnp.full(pixel_shape, -1, jnp.int32),
    )


def blend_chunk(
    carry: BlendCarry,
    pixf: jnp.ndarray,  # [..., 2] pixel coordinates (with subpixel offset)
    xy: jnp.ndarray,  # [..., G, 2] Gaussian screen means
    conic: jnp.ndarray,  # [..., G, 3]
    opacity: jnp.ndarray,  # [..., G] opacity * coef
    features: jnp.ndarray,  # [..., G, F] blended features (rgb, depth, 1, flow, ...)
    contrib_ok: jnp.ndarray,  # [..., G] bool: instance eligible for this pixel group
    ids: jnp.ndarray,  # [..., G] int32 global ids (for dominant idx)
) -> BlendCarry:
    """Blend one depth-ordered chunk of G Gaussians into the running carry.

    Leading dims are pixel dims; Gaussian data may broadcast across them
    (e.g. xy of shape [G, 2] against pixels [..., 2])."""
    d = xy - pixf[..., None, :]  # [..., G, 2]
    dx, dy = d[..., 0], d[..., 1]
    power = (
        -0.5 * (conic[..., 0] * dx * dx + conic[..., 2] * dy * dy) - conic[..., 1] * dx * dy
    )
    alpha_raw = opacity * jnp.exp(jnp.minimum(power, 0.0))
    # Straight-through 0.99 clamp: forward min(), backward identity
    # (reference backward recomputes alpha but never masks the clamp).
    alpha_c = alpha_raw + jax.lax.stop_gradient(jnp.minimum(alpha_raw, ALPHA_MAX) - alpha_raw)
    m = contrib_ok & (power <= 0.0) & (alpha_c >= ALPHA_MIN)
    alpha = jnp.where(m, alpha_c, 0.0)

    one_m = 1.0 - alpha
    cum_in = carry.cum[..., None]
    cum = cum_in * jnp.cumprod(one_m, axis=-1)  # inclusive [..., G]
    cum_excl = jnp.concatenate([cum_in, cum[..., :-1]], axis=-1)
    applied = m & (cum >= T_EPS)
    w = jnp.where(applied, alpha * cum_excl, 0.0)  # [..., G]
    w_sg = jax.lax.stop_gradient(w)

    feats = jnp.broadcast_to(features, (*w.shape, features.shape[-1]))
    # Color (features[..., :3]) receives full gradients through the blend
    # weights; depth/acc/flow (features[..., 3:]) only through the features
    # themselves (reference backward.cu:624-642 routes color grads into alpha
    # but flow/aux grads only into the per-Gaussian features).
    accum_color = jnp.einsum("...g,...gf->...f", w, feats[..., :3])
    accum_aux = jnp.einsum("...g,...gf->...f", w_sg, feats[..., 3:])
    accum = carry.accum + jnp.concatenate([accum_color, accum_aux], axis=-1)

    chunk_min = jnp.min(jnp.where(applied, cum, T_SENTINEL), axis=-1)
    t_final = jnp.minimum(carry.t_final, chunk_min)

    chunk_best = jnp.argmax(w_sg, axis=-1)
    chunk_max = jnp.take_along_axis(w_sg, chunk_best[..., None], axis=-1)[..., 0]
    ids_b = jnp.broadcast_to(ids, w.shape)
    chunk_id = jnp.take_along_axis(ids_b, chunk_best[..., None], axis=-1)[..., 0]
    better = chunk_max > carry.max_vis
    return BlendCarry(
        cum=cum[..., -1],
        t_final=t_final,
        accum=accum,
        max_vis=jnp.where(better, chunk_max, carry.max_vis),
        best_idx=jnp.where(better, chunk_id, carry.best_idx),
    )


class RenderOutputs(NamedTuple):
    color: jnp.ndarray  # [..., 3] (background composited)
    depth: jnp.ndarray  # [...] acc-normalized mean depth (far where empty)
    flow: jnp.ndarray  # [..., 3] acc-normalized flow
    acc: jnp.ndarray  # [...] accumulated opacity (stop-gradient)
    final_t: jnp.ndarray  # [...] final transmittance
    idx: jnp.ndarray  # [...] int32 dominant contributor id (-1 = none)


def finalize(carry: BlendCarry, bg: jnp.ndarray, max_depth: float) -> RenderOutputs:
    """Normalize accumulators exactly as forward.cu:426-460.

    Feature layout in accum: [r, g, b, depth, one(acc), fx, fy, fz]."""
    t_final = jnp.where(carry.t_final >= T_SENTINEL, carry.cum, carry.t_final)
    # If nothing was ever applied, T stayed 1 (cum only shrinks via applied or
    # post-latch alphas; with no applied contribution cum==1).
    color = carry.accum[..., 0:3] + t_final[..., None] * bg
    acc = carry.accum[..., 4]
    acc_sg = jax.lax.stop_gradient(acc)
    has = acc_sg > 0.0
    denom = jnp.where(has, acc_sg, 1.0)
    depth_acc = carry.accum[..., 3]
    depth = jnp.where(has, depth_acc / denom, max_depth)
    flow = jnp.where(has[..., None], carry.accum[..., 5:8] / denom[..., None], 0.0)
    return RenderOutputs(
        color=color, depth=depth, flow=flow, acc=acc_sg, final_t=t_final, idx=carry.best_idx
    )


def make_features(
    colors: jnp.ndarray, depth: jnp.ndarray, flow: jnp.ndarray
) -> jnp.ndarray:
    """Stack blendable per-Gaussian features [..., 8] = (rgb, depth, 1, flow)."""
    return jnp.concatenate(
        [colors, depth[..., None], jnp.ones_like(depth[..., None]), flow], axis=-1
    )


def tiles_to_image(arr: jnp.ndarray, grid_y: int, grid_x: int,
                   tile_y: int, tile_x: int,
                   height: int, width: int) -> jnp.ndarray:
    """Assemble per-tile pixel blocks into an image:
    [T, tile_y*tile_x, *ch] -> [height, width, *ch].

    The assembly is a (grid_x, tile_y) transpose whose minor dimension is
    tile_x*C lanes. For color (C=3, 32-wide tiles: 96 lanes) that is
    lane-tile-misaligned; KernelConfig(untile="aligned") (EX4DGS_UNTILE
    override) pads the channel dim so the transpose moves whole 128-lane
    tiles (exact — padding dropped by the final slice). Measured end-to-end
    A/B at 1352x1014 / 730k instances (_r4b_chain7.log): aligned 15.97
    Mpix/s fwd+bwd vs naive 16.82 — the +33% padded bytes through fwd AND
    bwd cost more than the shuffle they save, so naive is the default."""
    ch = arr.shape[2:]
    aligned = UNTILE == "aligned"
    if (aligned and len(ch) == 1 and arr.dtype.itemsize == 4
            and tile_x <= 128 and 128 % tile_x == 0):
        c = ch[0]
        step = 128 // tile_x
        cpad = -(-c // step) * step
        if c < cpad <= 2 * c:
            arrp = jnp.pad(arr, ((0, 0), (0, 0), (0, cpad - c)))
            img2 = arrp.reshape(grid_y, grid_x, tile_y, tile_x * cpad)
            img2 = jnp.moveaxis(img2, 2, 1).reshape(
                grid_y * tile_y, grid_x * tile_x, cpad)
            return img2[:height, :width, :c]
    img = arr.reshape(grid_y, grid_x, tile_y, tile_x, *ch)
    img = jnp.moveaxis(img, 2, 1).reshape(
        grid_y * tile_y, grid_x * tile_x, *ch)
    return img[:height, :width]
