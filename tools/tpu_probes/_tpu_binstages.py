"""In-graph cumulative decomposition of bin_gaussians (standalone stage
timings lie on this stack): where do the ~16-19 ms go?"""
import functools
import time

import jax, jax.numpy as jnp
from ex4dgs_tpu.rendering import preprocess_points
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.ops.projection import tile_grid
from ex4dgs_tpu.ops.scan_ops import blocked_cummax, blocked_cumsum

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_096, dynamic_capacity=16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
capacity = 1703936
gx, gy = tile_grid(W, H)
num_tiles = gx * gy


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f}ms", flush=True)


def pipeline(params, t, stage):
    m = model._replace(params=params)
    pts = point_data_at_t(m, cfg, t, 0)
    proj, _colors = preprocess_points(pts, cam, cfg, near=cfg.near, far=cfg.far)
    counts = proj.tiles_touched.astype(jnp.int32)
    cum = blocked_cumsum(counts)
    total = cum[-1]
    if stage == 1:
        return total
    slots = jnp.arange(capacity, dtype=jnp.int32)
    excl = cum - counts
    marks = jnp.zeros((capacity,), jnp.int32).at[excl].add(1, mode="drop")
    gauss_c = blocked_cumsum(marks) - 1
    gauss_c = jnp.clip(gauss_c, 0, counts.shape[0] - 1)
    if stage == 2:
        return gauss_c.sum() + total
    runstart = blocked_cummax(jnp.where(marks > 0, slots, -1))
    local = slots - runstart
    if stage == 3:
        return local.sum() + gauss_c.sum()
    rect_w = jnp.maximum(proj.rect_max[:, 0] - proj.rect_min[:, 0], 1)
    packed_rect = (
        proj.rect_min[:, 0] | (proj.rect_min[:, 1] << 10) | (rect_w << 20)
    )
    cols = jnp.stack(
        [packed_rect, jax.lax.bitcast_convert_type(proj.depth, jnp.int32)],
        axis=1,
    )
    g = jnp.take(cols, gauss_c, axis=0)
    if stage == 4:
        return g.sum() + local.sum()
    pk = g[:, 0]
    rx = pk & 1023
    ry = (pk >> 10) & 1023
    rw = pk >> 20
    dy = local // rw
    dx = local - dy * rw
    tile = (ry + dy) * gx + (rx + dx)
    tile = jnp.where(slots < total, tile, num_tiles)
    if stage == 5:
        return tile.sum()
    DEPTH_BITS = 31 - int(num_tiles).bit_length()
    key = (tile << DEPTH_BITS) | (g[:, 1] >> (31 - DEPTH_BITS))
    key = jnp.where(slots < total, key, jnp.int32(2**31 - 1))
    key_s, order = jax.lax.sort(
        (key, gauss_c), dimension=0, num_keys=1, is_stable=True
    )
    if stage == 6:
        return key_s.sum() + order.sum()
    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(key_s, tile_ids << DEPTH_BITS, side="left")
    stop = jnp.searchsorted(key_s, (tile_ids + 1) << DEPTH_BITS, side="left")
    return start.sum() + stop.sum() + order.sum()


for stage, nm in ((1, "counts+cum"), (2, "+marks+gaussid"), (3, "+runstart"),
                  (4, "+rowgather"), (5, "+tilecalc"), (6, "+sort"),
                  (7, "+ranges")):
    timeit(f"bin {nm}", functools.partial(pipeline, stage=stage),
           model.params, jnp.asarray(1.0))
