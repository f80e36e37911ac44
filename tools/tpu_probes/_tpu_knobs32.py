"""Knob sweep around the new 32x16 pair=1 default (round-3 tile sweep win).

Variations measured (one process, kernel_config.configure between runs):
  - 32x16 p1 (the new default, re-anchor)
  - 32x16 p1 win_align=256 (coarser forward read windows)
  - 32x16 p1 bufs=3 (deeper read pipeline — was a loss at 16x16 p2)
  - 32x16 p1 g_chunk=128 (finer DMA windows — was a loss at 16x16 p2)
  - 24x16 p1 (middle ground: fewer instances than 16x16, more tiles than 32x16)
  - 32x16 p1 g_chunk=512 would exceed the VMEM budget (validated out)

Run: scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_knobs32.py
"""
import json
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.kernel_config import KernelConfig, configure
from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.ops.losses import l1_loss, ssim
from ex4dgs_tpu.rendering import render
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

CONFIGS = [
    KernelConfig(tile_x=32, tile_y=16, pair=1),
    KernelConfig(tile_x=32, tile_y=16, pair=1, win_align=256),
    KernelConfig(tile_x=32, tile_y=16, pair=1, bufs=3),
    KernelConfig(tile_x=32, tile_y=16, pair=1, g_chunk=128),
    KernelConfig(tile_x=24, tile_y=16, pair=1),
]

for kc in CONFIGS:
    configure(kc)
    probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                   capacity=2 * 1024 * 1024, max_per_tile=1024)
    total = int(probe.binning_total)
    capacity = min(2 * 1024 * 1024, round_capacity(total * 5 // 4, 65536))

    def loss_fn(params, t):
        m = model._replace(params=params)
        res = render(cam, m, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
                     max_per_tile=1024, chunk=256)
        img = res.render
        return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))

    step = jax.jit(jax.grad(loss_fn))
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
    mpix = W * H * ITERS / dt / 1e6
    print(json.dumps({
        "config": kc.as_dict(), "instances": total, "capacity": capacity,
        "mpix_s": round(mpix, 3),
    }), flush=True)
