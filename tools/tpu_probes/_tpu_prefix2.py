"""In-graph decomposition round 2: binning sub-stages + pack-bwd variants +
new SSIM. All cumulative prefix timings inside one jitted graph."""
import functools
import time

import jax, jax.numpy as jnp
from ex4dgs_tpu.rendering import preprocess_points
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops import binning as B
from ex4dgs_tpu.ops import rasterize_pallas as rp
from ex4dgs_tpu.ops.scan_ops import blocked_cumsum
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
capacity = 2 * 1024 * 1024
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


# --------------- binning sub-stages (forward only)
def binning_sub(params, t, stage):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    counts = proj.tiles_touched.astype(jnp.int32)
    cum = blocked_cumsum(counts)
    total = cum[-1]
    slots = jnp.arange(capacity, dtype=jnp.int32)
    excl = cum - counts
    marks = jnp.zeros((capacity,), jnp.int32).at[excl].add(1, mode="drop")
    gauss_c = jnp.clip(blocked_cumsum(marks) - 1, 0, counts.shape[0] - 1)
    if stage == 1:  # expansion: slot -> gaussian
        return gauss_c.sum()
    cols = jnp.stack([
        excl.astype(jnp.float32),
        proj.rect_min[:, 0].astype(jnp.float32),
        proj.rect_min[:, 1].astype(jnp.float32),
        jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1).astype(jnp.float32),
        proj.depth,
    ], axis=1)
    g = jnp.take(cols, gauss_c, axis=0)
    local = slots - g[:, 0].astype(jnp.int32)
    rect_w = g[:, 3].astype(jnp.int32)
    dy = local // rect_w
    dx = local - dy * rect_w
    tile = (g[:, 2].astype(jnp.int32) + dy) * gx + (g[:, 1].astype(jnp.int32) + dx)
    tile = jnp.where(slots < total, tile, gx * gy)
    depth = g[:, 4]
    if stage == 2:  # + keys
        return tile.sum() + depth.sum()
    tile_s, _d, order = jax.lax.sort((tile, depth, gauss_c), dimension=0,
                                     num_keys=2, is_stable=True)
    if stage == 3:  # + sort
        return tile_s.sum() + order.sum()
    tid = jnp.arange(gx * gy, dtype=jnp.int32)
    start = jnp.searchsorted(tile_s, tid, side="left").astype(jnp.int32)
    stop = jnp.searchsorted(tile_s, tid, side="right").astype(jnp.int32)
    return start.sum() + stop.sum() + order.sum()


for s, nm in ((1, "expand"), (2, "+keys"), (3, "+sort"), (4, "+ranges")):
    timeit(f"bin {nm}", functools.partial(binning_sub, stage=s),
           model.params, jnp.asarray(1.0))


# --------------- full pipeline with pack-bwd variants
def pipeline(params, t, stage, pack_variant):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    proj, colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    binn = B.bin_gaussians(proj, gx, gy, capacity)

    if pack_variant == "current":
        data, gid = rp.pack_sorted(proj, colors, jnp.zeros_like(colors), binn)
    else:
        P = proj.xy.shape[0]
        opac = proj.opacity * proj.valid
        ones = jnp.ones((P,), jnp.float32)
        zeros = jnp.zeros((P,), jnp.float32)
        cols = jnp.stack([
            proj.xy[:, 0], proj.xy[:, 1],
            proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
            opac, colors[:, 0], colors[:, 1], colors[:, 2], proj.depth,
            zeros, zeros, zeros, ones, zeros, zeros,
        ], axis=1)

        @jax.custom_vjp
        def packg(cols):
            return jnp.take(cols, binn.order, axis=0).T

        def packg_fwd(cols):
            return packg(cols), None

        def packg_bwd(_, ct):
            if pack_variant == "sorted_scatter":
                g_s, slot_s = jax.lax.sort(
                    (binn.order, jnp.arange(capacity, dtype=jnp.int32)),
                    num_keys=1, is_stable=True)
                rows = jnp.take(ct.T, slot_s, axis=0)
                out = jnp.zeros((P, 16), jnp.float32).at[g_s].add(
                    rows, indices_are_sorted=True)
            else:  # plain_scatter (same as autodiff, but explicit)
                out = jnp.zeros((P, 16), jnp.float32).at[binn.order].add(ct.T)
            return (out,)

        packg.defvjp(packg_fwd, packg_bwd)
        data = packg(cols)
        gid = binn.order.astype(jnp.int32)

    if stage == 4:
        return data.sum()
    tids = jnp.arange(gx * gy, dtype=jnp.int32)
    color, accum, tfinal, bestidx = rp.composite_tiles(
        data, jnp.zeros(3), gid[None], binn.tile_start, binn.tile_stop,
        tids, None, gx * gy, gx, False, False)
    if stage == 5:
        return accum.sum()
    img = color.reshape(gy, gx, 16, 16, 3)
    img = jnp.moveaxis(img, 2, 1).reshape(gy * 16, gx * 16, 3)[:H, :W]
    if stage == 6:
        return l1_loss(img, gt)
    return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))


for variant in ("current", "plain_scatter", "sorted_scatter"):
    g = jax.grad(functools.partial(pipeline, stage=4, pack_variant=variant))
    timeit(f"grad pack [{variant}]", lambda p, t, g=g: g(p, t),
           model.params, jnp.asarray(1.0))

for stage, nm in ((5, "kernel"), (6, "l1"), (7, "ssim")):
    g = jax.grad(functools.partial(pipeline, stage=stage, pack_variant="current"))
    timeit(f"grad {nm} [current]", lambda p, t, g=g: g(p, t),
           model.params, jnp.asarray(1.0))
g = jax.grad(functools.partial(pipeline, stage=7, pack_variant="sorted_scatter"))
timeit("grad ssim [sorted_scatter]", lambda p, t: g(p, t),
       model.params, jnp.asarray(1.0))
