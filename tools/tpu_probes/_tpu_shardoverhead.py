"""VERDICT r4 #5: quantify shard_map overhead on the real chip.

Runs the bench scene's FULL train step through (a) the plain jitted step
(train/step.py) and (b) the sharded step (parallel/step_dp.py) on a
(data=1, gauss=1) mesh — identical shapes, identical math, the only delta
is the shard_map program structure (collectives degenerate to copies).
The ratio bounds the fixed cost multi-chip deployment pays per step.
"""
import os
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.config import OptimizationConfig
from ex4dgs_tpu.models.optimizer import init_state
from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.parallel.mesh import make_mesh
from ex4dgs_tpu.parallel.step_dp import make_sharded_train_step, replicate
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.step import StepStatics, train_step

W, H = 1352, 1014
ITERS = 20
REPEATS = 3

model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_000, dynamic_capacity=16_384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3), jnp.float32)
bg = jnp.zeros(3)

probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
               capacity=2 * 1024 * 1024, max_per_tile=1024)
total = int(probe.binning_total)
capacity = round_capacity(total * 5 // 4, 65536)
print(f"# instances {total} capacity {capacity}", flush=True)

statics = StepStatics(cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=3.0,
                      capacity=capacity, chunk=256, max_per_tile=1024)
opt_state = init_state(model.params)


def measure(tick, out_of):
    dts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        for i in range(ITERS):
            o = tick(i)
        jax.block_until_ready(out_of(o))
        dts.append(time.perf_counter() - t0)
    med = sorted(dts)[len(dts) // 2]
    best = min(d for d in dts if d > med / 5)
    return W * H * ITERS / best / 1e6


def tick_plain(i):
    return train_step(model, opt_state, cam, gt, jnp.asarray(float(i % 5)),
                      bg, jnp.asarray(100, jnp.int32), statics)


jax.block_until_ready(tick_plain(0).loss)
jax.block_until_ready(tick_plain(1).loss)
plain = measure(tick_plain, lambda o: o.loss)
print(f"plain train_step: {plain:.2f} Mpix/s", flush=True)

mesh = make_mesh(1, data=1, gauss=1)
step_sh = make_sharded_train_step(statics, mesh)
model_r = replicate(model, mesh)
opt_r = replicate(opt_state, mesh)
cam_b = jax.tree.map(lambda a: jnp.stack([a]), cam)
gt_b = jnp.stack([gt])


def tick_shard(i):
    return step_sh(model_r, opt_r, cam_b, gt_b,
                   jnp.asarray([float(i % 5)], jnp.float32), bg,
                   jnp.asarray(100, jnp.int32))


jax.block_until_ready(tick_shard(0).loss)
jax.block_until_ready(tick_shard(1).loss)
shard = measure(tick_shard, lambda o: o.loss)
print(f"sharded step @(1,1): {shard:.2f} Mpix/s", flush=True)
print(f"RESULT shard_overhead_pct={100.0 * (plain - shard) / plain:.1f} "
      f"plain={plain:.2f} sharded={shard:.2f}", flush=True)
