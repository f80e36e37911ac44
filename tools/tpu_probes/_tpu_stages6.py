"""Round-2 decomposition of the CURRENT pipeline: cumulative grad prefixes
inside one jitted graph (standalone stage timings lie on this stack)."""
import functools
import time

import jax, jax.numpy as jnp
from ex4dgs_tpu.rendering import preprocess_points
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops import binning as B
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.losses import l1_loss, ssim
from ex4dgs_tpu.ops.projection import tile_grid

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_096, dynamic_capacity=16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
import os
capacity = int(os.environ.get("ST_CAP", 917504))  # snug for 730k @32x16; 2M for round-2 comparison
gx, gy = tile_grid(W, H)
gt = jnp.zeros((H, W, 3))


def timeit(name, fn, *args, n=10):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.1f}ms", flush=True)


def pipeline(params, t, stage):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    if stage == 1:
        return proj.xy.sum() + proj.conic.sum() + colors.sum()
    binn = B.bin_gaussians(proj, gx, gy, capacity)
    if stage == 2:
        return (binn.order.sum() + binn.tile_start.sum()).astype(jnp.float32)
    data, gid = rp.pack_sorted(proj, colors, jnp.zeros_like(colors), binn)
    if stage == 3:
        return data.sum()
    tids = jnp.arange(gx * gy, dtype=jnp.int32)
    color, accum, tfinal, bestidx = rp.composite_tiles(
        data, jnp.zeros(3), gid[None], binn.tile_start, binn.tile_stop,
        tids, None, gx * gy, gx, False, False)
    if stage == 4:
        return accum.sum()
    if stage == 45:  # L1 in TILED layout (no untile in the graph)
        gt_t = jax.lax.stop_gradient(color) * 0.5
        return jnp.abs(color - gt_t).mean()
    from ex4dgs_tpu.ops.projection import TILE_X, TILE_Y
    img = color.reshape(gy, gx, TILE_Y, TILE_X, 3)
    img = jnp.moveaxis(img, 2, 1).reshape(gy * TILE_Y, gx * TILE_X, 3)[:H, :W]
    if stage == 5:
        return l1_loss(img, gt)
    return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))


# forward-only cumulative prefixes
for stage, nm in ((1, "preproc"), (2, "+bin"), (3, "+pack"), (4, "+kernel"),
                  (6, "+loss")):
    timeit(f"fwd {nm}", functools.partial(pipeline, stage=stage),
           model.params, jnp.asarray(1.0))

# grad cumulative prefixes
for stage, nm in ((1, "preproc"), (3, "+pack"), (4, "+kernel"),
                  (45, "+l1tiled"), (5, "+l1"), (6, "+ssim")):
    g = jax.grad(functools.partial(pipeline, stage=stage))
    timeit(f"grad {nm}", lambda p, t, g=g: g(p, t),
           model.params, jnp.asarray(1.0))
