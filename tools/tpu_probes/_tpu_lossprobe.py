"""Loss-path layout probe (round-3 roadmap: untile+L1 ~8.5 ms, SSIM ~3.2 ms).

The loss consumes images in HWC ([H, W, 3]) where the channel axis lands on
TPU lanes; the untile transpose (rasterize_pallas.timg) plus the L1/SSIM
elementwise math may be paying heavy relayout costs. Measures the FULL
render+loss gradient graph (bench.py shape) with the loss phrased four ways:

  base  — grad of sum(render): no loss at all. The untile itself stays (the
          render output is HWC by API contract), so variants below isolate
          the loss math; base vs A isolates L1+SSIM.
  A     — current: L1 + SSIM on HWC (production loss).
  B     — CHW: transpose render/gt to [3, H, W] (lanes = W) and compute
          L1 + band-matmul SSIM there.
  C     — merged: L1 on [H, W*3] 2D views, SSIM unchanged.
  blocks— grad of sum over the PRE-untile tile blocks (composite output
          consumed directly): isolates the untile transpose cost vs base.

Methodology per CLAUDE.md: all variants are end-to-end jitted graphs on the
same inputs; only relative differences are meaningful.
Run: scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_lossprobe.py
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.ops.losses import _band_matrix, l1_loss, ssim
from ex4dgs_tpu.rendering import render, preprocess_points, composite_projected
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W, H = 1352, 1014
ITERS = 10

model, cfg = make_scene(
    n_static=100_000, n_dynamic=10_000, duration=10.0,
    static_capacity=100_000, dynamic_capacity=16_384,
)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3), jnp.float32)
gt_chw = jnp.zeros((3, H, W), jnp.float32)

probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
               capacity=2 * 1024 * 1024, max_per_tile=1024)
total = int(probe.binning_total)
capacity = min(2 * 1024 * 1024, round_capacity(total * 5 // 4, 65536))
print(json.dumps({"instances": total, "capacity": capacity}), flush=True)


def _blur_chw(x, window_size=11, sigma=1.5):
    c, h, w = x.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma), x.dtype)
    bw = jnp.asarray(_band_matrix(w, window_size, sigma), x.dtype)
    # out = bh^T @ x @ bw per channel; contract H first: [H,H]x[C,H,W]->[H,C,W]
    y = lax.dot_general(bh, x, (((0,), (1,)), ((), ())),
                        preferred_element_type=x.dtype)
    y = lax.dot_general(y, bw, (((2,), (0,)), ((), ())),
                        preferred_element_type=x.dtype)  # [H, C, W]
    return jnp.moveaxis(y, 0, 1)  # [C, H, W]


_C1, _C2 = 0.01 ** 2, 0.03 ** 2


def ssim_chw(img1, img2):
    mu1, mu2 = _blur_chw(img1), _blur_chw(img2)
    s11, s22, s12 = _blur_chw(img1 * img1), _blur_chw(img2 * img2), _blur_chw(img1 * img2)
    a1 = 2 * mu1 * mu2 + _C1
    a2 = 2 * (s12 - mu1 * mu2) + _C2
    b1 = mu1 * mu1 + mu2 * mu2 + _C1
    b2 = (s11 - mu1 * mu1) + (s22 - mu2 * mu2) + _C2
    return ((a1 * a2) / (b1 * b2)).mean()


def loss_base(img):
    return img.sum()


def loss_a(img):
    return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))


def loss_b(img):
    x = img.transpose(2, 0, 1)
    return 0.8 * jnp.abs(x - gt_chw).mean() + 0.2 * (1.0 - ssim_chw(x, gt_chw))


def loss_c(img):
    a = img.reshape(H, W * 3)
    b = gt.reshape(H, W * 3)
    return 0.8 * jnp.abs(a - b).mean() + 0.2 * (1.0 - ssim(img, gt))


def render_img(params, t):
    m = model._replace(params=params)
    res = render(cam, m, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
                 max_per_tile=1024, chunk=256, track_idx=False)
    return res.render


def blocks_sum(params, t):
    # consume the compositor's raw tile blocks: no untile at all
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, mode=0)
    proj, colors = preprocess_points(
        pts, cam, cfg, near=cfg.near, far=cfg.far)
    from ex4dgs_tpu.ops import binning as binning_ops
    from ex4dgs_tpu.ops.rasterize_pallas import composite_tiles, pack_sorted
    from ex4dgs_tpu.ops.projection import tile_grid
    grid_x, grid_y = tile_grid(cam.width, cam.height)
    binning = binning_ops.bin_gaussians(proj, grid_x, grid_y, capacity)
    flow_dirs = jnp.zeros_like(colors)
    data, gid = pack_sorted(proj, colors, flow_dirs, binning)
    tids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    color, _accum, _tfinal, _best = composite_tiles(
        data, jnp.zeros(3), gid[None, :], binning.tile_start,
        binning.tile_stop, tids, None, grid_x * grid_y, grid_x, False, False)
    return color.sum()


def timed(name, fn):
    step = jax.jit(jax.grad(fn))
    g = step(model.params, jnp.asarray(1.0))
    jax.block_until_ready(g)
    for i in range(2):
        g = step(model.params, jnp.asarray(float(i % 5)))
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for i in range(ITERS):
        g = step(model.params, jnp.asarray(float(i % 5)))
    jax.block_until_ready(g)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "variant": name, "ms_per_iter": round(dt / ITERS * 1e3, 2),
        "mpix_s": round(W * H * ITERS / dt / 1e6, 3),
    }), flush=True)


timed("blocks", lambda p, t: blocks_sum(p, t))
timed("base", lambda p, t: loss_base(render_img(p, t)))
timed("A_hwc", lambda p, t: loss_a(render_img(p, t)))
timed("B_chw", lambda p, t: loss_b(render_img(p, t)))
timed("C_merged", lambda p, t: loss_c(render_img(p, t)))
