"""VERDICT r4 #4: render-only (eval path) decomposition at snug capacity.

Cumulative forward prefixes inside one jitted graph (standalone stage
timings lie on this stack): preproc -> +bin -> +pack -> +kernel -> +untile
== the full render-only frame. Also prints the same prefixes with
EX4DGS_TIGHT_CULL toggled by the caller for the instance-count lever.
"""
import functools
import os
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops import binning as B
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.compositing import tiles_to_image
from ex4dgs_tpu.ops.projection import tile_grid
from ex4dgs_tpu.rendering import preprocess_points, render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_096, dynamic_capacity=16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gx, gy = tile_grid(W, H)

probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
               capacity=2 * 1024 * 1024, max_per_tile=1024)
total = int(probe.binning_total)
# the eval harness's snug sizing (eval/render_sets.py)
capacity = round_capacity(total * 5 // 4, 65536)
print(f"# instances {total} capacity {capacity} tiles {gx * gy}", flush=True)


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms  ({W * H / dt / 1e3:.1f} Mpix/s)", flush=True)


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
    img = tiles_to_image(color, gy, gx, rp.TILE_Y, rp.TILE_X, H, W)
    return img.sum()


for stage, nm in ((1, "preproc"), (2, "+bin"), (3, "+pack"), (4, "+kernel"),
                  (5, "+untile")):
    timeit(f"render {nm}", functools.partial(pipeline, stage=stage),
           model.params, jnp.asarray(1.0))

# the public render() (what eval/render_sets times), same capacity
rfn = lambda mparams, t: render(
    cam, model._replace(params=mparams), cfg, t=t, bg=jnp.zeros(3),
    capacity=capacity, max_per_tile=1024).render
timeit("render full render()", rfn, model.params, jnp.asarray(1.0))
# without dominant-idx tracking (training-style forward)
rfn2 = lambda mparams, t: render(
    cam, model._replace(params=mparams), cfg, t=t, bg=jnp.zeros(3),
    capacity=capacity, max_per_tile=1024, track_idx=False).render
timeit("render no-idx", rfn2, model.params, jnp.asarray(1.0))
