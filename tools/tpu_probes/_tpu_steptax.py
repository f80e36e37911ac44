"""VERDICT r4 #7: locate the train-step tax (train_step vs bench grad metric).

Incremental variants of the SAME graph at bench shapes:
  a. grad of render+L1+SSIM loss (the bench headline metric)
  b. a + RAdam update (params + optimizer state materialized as outputs)
  c. a + RAdam + stat accumulators (m2d/flow side channels + stats)
  d. the full train_step (c + overflow gate + psnr + nan flag + outputs)
"""
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
from ex4dgs_tpu.train.step import StepStatics, train_step, _loss_and_aux

W, H = 1352, 1014
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
capacity = round_capacity(int(probe.binning_total) * 5 // 4, 65536)
print(f"# capacity {capacity}", flush=True)
opt = OptimizationConfig()
statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=3.0,
                      capacity=capacity, chunk=256, max_per_tile=1024)
opt_state = init_state(model.params)
it = jnp.asarray(100, jnp.int32)


def timeit(name, fn, out_of, n=20):
    out = jax.block_until_ready(out_of(fn(0)))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(i)
    jax.block_until_ready(out_of(out))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name}: {dt:.2f} ms ({W * H / dt / 1e3:.2f} Mpix/s)", flush=True)


# a. bench grad metric
def loss_a(params, t, gt):
    m = model._replace(params=params)
    res = render(cam, m, cfg, t=t, bg=jnp.zeros(3), capacity=capacity,
                 max_per_tile=1024, chunk=256)
    img = res.render
    return 0.8 * l1_loss(img, gt) + 0.2 * (1.0 - ssim(img, gt))


step_a = jax.jit(jax.grad(loss_a))
timeit("a grad-only", lambda i: step_a(model.params, jnp.asarray(float(i % 5)), gt),
       lambda o: o)


# b. the step's actual loss (incl. l1_accum side channels) + RAdam
def step_b_fn(params, opt_state, t, gt):
    n_total = model.static_capacity + model.dynamic_capacity
    m2d = jnp.zeros((n_total, 3), jnp.float32)
    fd = jnp.zeros((n_total, 3), jnp.float32)
    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (loss, (res, ll1)), (pg, m2g, fg) = grad_fn(
        params, m2d, fd, model, cam, gt, t, bg, it, statics)
    pg = scrub_nan(mask_grads(pg, model))
    lrs = group_lrs(opt, 3.0, it)
    new_params, new_state = radam_update(params, pg, opt_state, lrs)
    return new_params, new_state, loss


step_b = jax.jit(step_b_fn)
timeit("b +sidechan+radam",
       lambda i: step_b(model.params, opt_state, jnp.asarray(float(i % 5)), gt),
       lambda o: o[2])

# d. full train_step
timeit("d full train_step",
       lambda i: train_step(model, opt_state, cam, gt,
                            jnp.asarray(float(i % 5)), bg, it, statics),
       lambda o: o.loss)
