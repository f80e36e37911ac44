"""Backward-chain decomposition at bench shapes (round-5 VERDICT #1).

The grad-only step costs ~81 ms; the forward render is ~27 ms. This probe
splits the remaining ~54 ms of backward work by differentiating the SAME
full forward graph w.r.t. progressively earlier cut points. A zero residual
argument added at the cut (cols += x_cols / data += x_data) keeps the
forward identical while gating how far cotangents propagate — stop_gradient
alone would let JAX skip the backward entirely.

  A0 value-only, loss = mean(img)         = forward alone
  A  value-only loss (L1+SSIM)            = A0 + loss fwd
  B0 grad@data, loss = mean(img)          = A0 + untile bwd + bwd kernel + win0 merge
  B  grad@data, L1+SSIM                   = B0 + L1/SSIM fwd+bwd delta
  C  grad@cols (pre-pack [P,16])          = B + pack-VJP
  D  grad@params (full chain)             = C + preprocess/SH/cov/temporal VJP

Differences between consecutive rows are the per-stage backward costs.
"""
import os
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops import compositing as comp
from ex4dgs_tpu.ops.binning import bin_gaussians
from ex4dgs_tpu.ops.losses import l1_loss, ssim
from ex4dgs_tpu.ops.projection import tile_grid
from ex4dgs_tpu.ops.rasterize_pallas import (TILE_X, TILE_Y, _gather_rows_t,
                                             composite_tiles)
from ex4dgs_tpu.rendering import preprocess_points, render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W = int(os.environ.get("BWDSPLIT_W", 1352))
H = int(os.environ.get("BWDSPLIT_H", 1014))
_N = int(os.environ.get("BWDSPLIT_N", 100_000))
model, cfg = make_scene(n_static=_N, n_dynamic=_N // 10, duration=10.0,
                        static_capacity=_N, dynamic_capacity=max(_N // 5, 1024))
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3), jnp.float32)
bg = jnp.zeros(3)

probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=bg,
               capacity=2 * 1024 * 1024, max_per_tile=1024)
capacity = round_capacity(int(probe.binning_total) * 5 // 4, 65536)
grid_x, grid_y = tile_grid(W, H)
num_tiles = grid_x * grid_y
INTERP = jax.devices()[0].platform != "tpu"  # CPU smoke runs interpret mode
print(f"# capacity {capacity} tiles {num_tiles}", flush=True)

P_TOT = model.static_capacity + model.dynamic_capacity
x_cols0 = jnp.zeros((P_TOT, 16), jnp.float32)
x_data0 = jnp.zeros((16, capacity), jnp.float32)


def pipeline(params, x_cols, x_data, t, gt, *, cut, loss_kind):
    """Full forward; cotangents propagate only back to `cut`."""
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t)
    if cut != "params":
        pts = jax.tree_util.tree_map(jax.lax.stop_gradient, pts)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    flow = jnp.zeros((pts.means3d.shape[0], 3), jnp.float32)
    binning = bin_gaussians(proj, grid_x, grid_y, capacity)

    # pack_sorted, inlined so the cols/data cut points are reachable
    P = proj.xy.shape[0]
    opac = proj.opacity * proj.valid
    ones = jnp.ones((P,), jnp.float32)
    zeros = jnp.zeros((P,), jnp.float32)
    cols = jnp.stack(
        [proj.xy[:, 0], proj.xy[:, 1],
         proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
         opac, colors[:, 0], colors[:, 1], colors[:, 2],
         proj.depth, flow[:, 0], flow[:, 1], flow[:, 2],
         ones, zeros, zeros], axis=1)
    if cut == "data":
        cols = jax.lax.stop_gradient(cols)
    elif cut == "cols":
        cols = cols + x_cols
    data = _gather_rows_t(cols, binning.order, binning.cum, binning.counts)
    data = data.at[14, :].set(jax.lax.bitcast_convert_type(
        binning.order.astype(jnp.int32), jnp.float32))
    if cut == "data":
        data = data + x_data

    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    color, accum, tfinal, bestidx = composite_tiles(
        data, bg, binning.order[None, :], binning.tile_start,
        binning.tile_stop, tids, None, num_tiles, grid_x, INTERP, False)
    img = comp.tiles_to_image(color, grid_y, grid_x, TILE_Y, TILE_X, H, W)
    if loss_kind == "mean":
        return img.mean()
    return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))


def timeit(name, fn, n=20):
    out = jax.block_until_ready(fn(0))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms ({W * H / dt / 1e3:.2f} Mpix/s)", flush=True)
    return dt


ARGNUM = {"params": 0, "cols": 1, "data": 2}


def run(name, cut, loss_kind, grad):
    base = lambda p, xc, xd, t: pipeline(p, xc, xd, t, gt, cut=cut,
                                         loss_kind=loss_kind)
    if grad:
        f = jax.jit(jax.grad(base, argnums=ARGNUM[cut]))
    else:
        f = jax.jit(base)
    return timeit(name, lambda i: f(model.params, x_cols0, x_data0,
                                    jnp.asarray(float(i % 5))))


a0 = run("A0 value mean", "params", "mean", False)
a = run("A  value l1+ssim", "params", "full", False)
b0 = run("B0 grad@data mean", "data", "mean", True)
b = run("B  grad@data l1+ssim", "data", "full", True)
c = run("C  grad@cols l1+ssim", "cols", "full", True)
d = run("D  grad@params l1+ssim", "params", "full", True)
print(f"# deltas: loss-fwd {a - a0:.2f} | bwdkernel+untile {b0 - a0:.2f} | "
      f"loss-bwd {(b - b0) - (a - a0):.2f} | pack-vjp {c - b:.2f} | "
      f"preproc-vjp {d - c:.2f}", flush=True)
