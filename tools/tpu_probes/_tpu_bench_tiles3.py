"""Tile sweep round 3: bigger-than-32x16 tiles.

kernprobe showed per-tile FIXED costs dominate the kernels (grad 37.7 ms at
T=5440 vs 4.5 ms steady-state floor), and 16x16 -> 32x16 won +23% from
halving T and shedding instances. Bigger tiles halve T again at the price of
more blend work per instance (each instance blends over n_pix lanes):

  32x16 (default, baseline)   T=2720  n_pix=512
  48x16                       T=1820  n_pix=768
  64x16                       T=1364  n_pix=1024 (pair*n_pix*g128 hits the
                                      scoped-VMEM budget exactly)
  32x32                       T=1376  n_pix=1024 (square variant)

Run via scripts/tpu_snap_run.sh tools/tpu_probes/_tpu_bench_tiles3.py
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
    KernelConfig(),                                   # 32x16 p1 g128 default
    KernelConfig(tile_x=48, tile_y=16),
    KernelConfig(tile_x=64, tile_y=16),
    KernelConfig(tile_x=32, tile_y=32),
]

for kc in CONFIGS:
    configure(kc)
    try:
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
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(ITERS):
                g = step(model.params, jnp.asarray(float(i % 5)))
            jax.block_until_ready(g)
            best = min(best, time.perf_counter() - t0)
        mpix = W * H * ITERS / best / 1e6
        print(json.dumps({
            "config": kc.as_dict(), "instances": total, "capacity": capacity,
            "mpix_s": round(mpix, 3),
        }), flush=True)
    except Exception as e:  # a config Mosaic rejects must not kill the sweep
        print(json.dumps({"config": kc.as_dict(),
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
