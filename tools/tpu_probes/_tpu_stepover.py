"""Split the train-step-over-grad overhead (_tpu_stepprobe.py saw
g3 grads+radam 93.5 ms -> g4 full train_step 102.6 ms) into its parts:

  a) grads + scrub/mask + RAdam                      (= stepprobe g3)
  b) a + stat accumulators
  c) b + overflow no-op select over model+opt state
  d) c + psnr
  e) full train_step (adds image/radii/visibility as graph OUTPUTS —
     whatever d vs e costs is output materialization / lost DCE)
"""
import os
import time

import jax
import jax.numpy as jnp

from ex4dgs_tpu.models.config import OptimizationConfig
from ex4dgs_tpu.models.optimizer import (group_lrs, init_state, mask_grads,
                                         radam_update, scrub_nan)
from ex4dgs_tpu.models.state import round_capacity
from ex4dgs_tpu.ops.losses import psnr
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.step import (StepStatics, _loss_and_aux, train_step,
                                   _update_stat_accumulators)

SMOKE = os.environ.get("STEPOVER_SMOKE") == "1"  # tiny CPU sanity run
W, H = (352, 272) if SMOKE else (1352, 1014)
NS, ND = (2_000, 200) if SMOKE else (100_000, 10_000)
model, cfg = make_scene(n_static=NS, n_dynamic=ND, duration=10.0,
                        static_capacity=NS, dynamic_capacity=max(ND, 128))
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3), jnp.float32)

probe_cap = 65_536 if SMOKE else 2 * 1024 * 1024
probe = render(cam, model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
               capacity=probe_cap, max_per_tile=1024)
CAP = round_capacity(int(probe.binning_total) * 5 // 4, 65536)
statics = StepStatics(cfg=cfg, opt=OptimizationConfig(), spatial_lr_scale=3.0,
                      capacity=CAP, chunk=256, max_per_tile=1024)
opt_state = init_state(model.params)
bg = jnp.zeros(3)
it = jnp.asarray(100, jnp.int32)


def timeit(name, fn, *args, n=2 if SMOKE else 15):
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


def core(params, t, level):
    ps, pd = model.static_capacity, model.dynamic_capacity
    z = jnp.zeros((ps + pd, 3), jnp.float32)
    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (loss, (res, ll1)), grads = grad_fn(params, z, z, model, cam, gt, t, bg,
                                        it, statics)
    pg = scrub_nan(mask_grads(grads[0], model))
    lrs = group_lrs(statics.opt, statics.spatial_lr_scale, it)
    np_, ns = radam_update(params, pg, opt_state, lrs)
    if level == 0:
        return np_, ns
    new_model = _update_stat_accumulators(
        model._replace(params=np_), res, grads[1], grads[2], t, it, statics.opt)
    if level == 1:
        return new_model, ns
    ok = res.binning_total <= statics.capacity
    sel = lambda new, old: jax.tree.map(lambda a, b: jnp.where(ok, a, b),
                                        new, old)
    out_model = sel(new_model, model)
    out_os = sel(ns, opt_state)
    if level == 2:
        return out_model, out_os
    return out_model, out_os, psnr(res.render, gt)


def full(params, t):
    return train_step(model._replace(params=params), opt_state, cam, gt, t,
                      bg, it, statics)


timeit("a grads+radam     ", lambda p, t: core(p, t, 0), model.params, jnp.asarray(1.0))
timeit("b +stat accums    ", lambda p, t: core(p, t, 1), model.params, jnp.asarray(1.0))
timeit("c +overflow select", lambda p, t: core(p, t, 2), model.params, jnp.asarray(1.0))
timeit("d +psnr           ", lambda p, t: core(p, t, 3), model.params, jnp.asarray(1.0))
timeit("e full train_step ", full, model.params, jnp.asarray(1.0))
