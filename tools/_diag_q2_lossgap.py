"""Diagnose the q2 800x600 collapse: compare pallas(interpret) vs jnp on the
exact train-step loss (incl. the l1_accum flow hook) at the default 32x16
kernel config, on a small scene with partial edge tiles.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/_diag_q2_lossgap.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.train.step import _loss_and_aux, StepStatics
from ex4dgs_tpu import kernel_config

W, H = 300, 200
CAP = 128 * 256  # multiple of G_CHUNK

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1)
target, _ = make_scene(n_static=2000, n_dynamic=200, duration=8.0, seed=7,
                       static_capacity=2048, dynamic_capacity=256, cfg=cfg,
                       opacity=0.85)
cam = ring_cameras(3, 3.0, W, H, far=cfg.far)[1]
opt = OptimizationConfig(iterations=100)
print("kernel cfg:", kernel_config.current())

gt = np.clip(np.asarray(
    render(cam, target, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
           capacity=CAP, max_per_tile=2048, backend="jnp").render), 0, 1)
gt = jnp.asarray(gt)

n_total = target.static_capacity + target.dynamic_capacity
m2d = jnp.zeros((n_total, 3), jnp.float32)
fdirs = jnp.zeros((n_total, 3), jnp.float32)

results = {}
for backend in ["jnp", "pallas"]:
    statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=3.0, capacity=CAP,
                          max_per_tile=2048, backend=backend)
    if backend == "pallas":
        # force interpret mode on CPU
        import ex4dgs_tpu.ops.rasterize_pallas as rp
        orig = rp.composite_tiles
        import functools
        import ex4dgs_tpu.rendering as rnd

        def patched(data, bg, gid2, ts, te, tids, offs, num_tiles, grid_x,
                    interpret, track_idx):
            return orig(data, bg, gid2, ts, te, tids, offs, num_tiles, grid_x,
                        True, track_idx)
        rp_wrap = rp.rasterize_tiled_pallas

        def wrap2(*a, **k):
            k["interpret"] = True
            return rp_wrap(*a, **k)
        rnd.rasterize_tiled_pallas = None  # not used (imported inside fn)
        rp.rasterize_tiled_pallas_orig = rp_wrap
        rp.rasterize_tiled_pallas = wrap2

    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (loss, (res, ll1)), (pg, m2dg, fg) = grad_fn(
        target.params, m2d, fdirs, target, cam, gt, jnp.asarray(1.0),
        jnp.zeros(3), jnp.asarray(100, jnp.int32), statics)
    flow = res.opticalflow
    results[backend] = dict(loss=float(loss), ll1=float(ll1),
                            flow_absmax=float(jnp.abs(flow).max()),
                            acc_max=float(res.acc.max()),
                            img_mean=float(res.render.mean()),
                            m2dg_absmax=float(jnp.abs(m2dg).max()),
                            fg_absmax=float(jnp.abs(fg).max()))
    g = {k: float(jnp.abs(v).max()) for k, v in pg.items()}
    results[backend]["grad_absmax"] = g
    print(backend, results[backend], flush=True)

j, p = results["jnp"], results["pallas"]
print("\nDELTAS: loss", p["loss"] - j["loss"], " ll1", p["ll1"] - j["ll1"])
for k in j["grad_absmax"]:
    a, b = j["grad_absmax"][k], p["grad_absmax"][k]
    if abs(a - b) > 1e-5 * max(abs(a), abs(b), 1e-8):
        print("GRAD MISMATCH", k, a, b)
