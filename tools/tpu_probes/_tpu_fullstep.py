"""Full train_step cost vs bare loss-grad at bench scale: how much do RAdam,
stat accumulators, NaN scrub and the overflow select add on top of the
rasterizer fwd+bwd the bench measures?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from ex4dgs_tpu.models import OptimizationConfig
from ex4dgs_tpu.models.optimizer import init_state
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.step import StepStatics, train_step

W, H = 1352, 1014
model, cfg = make_scene(n_static=100_000, n_dynamic=10_000, duration=10.0,
                        static_capacity=100_096, dynamic_capacity=16384)
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], jnp.log(0.02)),
})
cam = ring_cameras(1, 3.0, W, H, far=cfg.far)[0]
gt = jnp.zeros((H, W, 3))
opt = OptimizationConfig()
state = init_state(model.params)
statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=1.0,
                      capacity=1441792, chunk=128, max_per_tile=None,
                      backend="pallas")


def timeit(name, fn, *args, n=15):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f}ms", flush=True)


step = lambda m, s: train_step(m, s, cam, gt, jnp.asarray(1.0), jnp.zeros(3),
                               jnp.asarray(500, jnp.int32), statics)
timeit("full train_step", step, model, state)
