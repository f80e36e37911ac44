"""Decompose the train-step overhead over the bare loss-grad graph
(bench.py measures both; the delta was ~9.5 ms at 730k instances).

Cumulative jitted graphs: (1) bench-style grad (no side channels),
(2) + the two gradient side-channels (mean2d densify stats, flow error
backtracking), (3) + scrub/mask + RAdam, (4) the full train_step (stats
accumulators + overflow gating + psnr)."""
import os
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.config import OptimizationConfig
from ex4dgs_tpu.models.optimizer import (group_lrs, init_state, mask_grads,
                                         radam_update, scrub_nan)
from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.ops.losses import l1_loss, ssim
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.step import StepStatics, _loss_and_aux, train_step

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_000, dynamic_capacity=16_384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3), jnp.float32)

probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
               capacity=2 * 1024 * 1024, max_per_tile=1024)
CAP = round_capacity(int(probe.binning_total) * 5 // 4, 65536)
statics = StepStatics(cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=3.0,
                      capacity=CAP, chunk=256, max_per_tile=1024)
opt_state = init_state(model.params)
bg = jnp.zeros(3)
it = jnp.asarray(100, jnp.int32)


def timeit(name, fn, *args, n=15):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(*args)
        jax.block_until_ready(o)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best * 1e3:6.1f} ms", flush=True)


def g1(params, t):
    def loss_fn(p, t):
        m = model._replace(params=p)
        res = render(cam, m, cfg, t=t, bg=bg, capacity=CAP,
                     max_per_tile=1024, chunk=256)
        return 0.8 * l1_loss(res.render, gt) + 0.2 * (1 - ssim(res.render, gt))
    return jax.grad(loss_fn)(params, t)


def g2(params, t):
    ps, pd = model.static_capacity, model.dynamic_capacity
    z = jnp.zeros((ps + pd, 3), jnp.float32)
    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (_loss, _aux), grads = grad_fn(params, z, z, model, cam, gt, t, bg, it,
                                   statics)
    return grads


def g3(params, t):
    grads = g2(params, t)
    pg = scrub_nan(mask_grads(grads[0], model))
    lrs = group_lrs(statics.opt, statics.spatial_lr_scale, it)
    np_, ns = radam_update(params, pg, opt_state, lrs)
    return np_, ns, grads[1], grads[2]


def g4(params, t):
    return train_step(model._replace(params=params), opt_state, cam, gt, t,
                      bg, it, statics)


timeit("1 bench grad      ", g1, model.params, jnp.asarray(1.0))
timeit("2 +side channels  ", g2, model.params, jnp.asarray(1.0))
timeit("3 +radam          ", g3, model.params, jnp.asarray(1.0))
timeit("4 full train_step ", g4, model.params, jnp.asarray(1.0))
