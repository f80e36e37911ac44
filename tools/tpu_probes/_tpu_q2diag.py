"""Diagnose the q2 800x600 collapse on TPU: run the exact quality-2 config
(surface target, full schedule LRs, pallas backend) for a few hundred steps,
logging every loss component separately so the unbounded term shows itself.

No density-control events — pure optimization dynamics (the q2 trajectory
already decays 13.3 -> 12 dB before the first densify at iter 600).
"""
import json
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ex4dgs_tpu.data.cameras import CameraInfo
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.models.optimizer import group_lrs, init_state, mask_grads, radam_update, scrub_nan
from ex4dgs_tpu.models.state import create_from_pcd
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops.losses import l1_loss, psnr, ssim
from ex4dgs_tpu.ops.math3d import sh0_to_rgb
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.step import StepStatics, _loss_and_aux, _regularizers

W, H = 800, 600
N_CAMS, N_T = 10, 8
ITERS = int(os.environ.get("QD_ITERS", 200))
CAPACITY = 1024 * 1024
BACKEND = os.environ.get("QD_BACKEND", "pallas")

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1)
target, _ = make_scene(n_static=50_000, n_dynamic=5_000, duration=8.0, seed=7,
                       static_capacity=65_536, dynamic_capacity=8_192, cfg=cfg,
                       opacity=0.85)
cams = ring_cameras(N_CAMS, 3.0, W, H, far=cfg.far)

out_dir = "/tmp/q2s_frames"
os.makedirs(out_dir, exist_ok=True)
gts = {}
for ci in [1, 2, 3]:  # a few train cameras suffice
    for t in range(N_T):
        path = os.path.join(out_dir, f"c{ci}_t{t}.png")
        if not os.path.exists(path):
            img = render(cams[ci], target, cfg, t=jnp.asarray(float(t)),
                         bg=jnp.zeros(3), capacity=CAPACITY,
                         max_per_tile=4096, backend="jnp").render
            img = np.clip(np.asarray(img), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
        gts[(ci, t)] = jnp.asarray(
            np.asarray(Image.open(path), np.float32)[..., :3] / 255.0)
print("GT ready", flush=True)

rng = np.random.default_rng(0)
pd0 = point_data_at_t(target, cfg, jnp.asarray(0.0), mode=0)
act = np.asarray(pd0.mask)
pts0 = np.asarray(pd0.means3d)[act] + rng.normal(
    scale=0.02, size=(int(act.sum()), 3)).astype(np.float32)
cols0 = np.clip(np.asarray(sh0_to_rgb(pd0.features[act][:, 0])), 0, 1)
model = create_from_pcd(pts0, cols0, cfg, duration=max(cfg.start_duration, 1))
model = model._replace(params={
    **model.params,
    "scaling": jnp.minimum(model.params["scaling"], np.log(0.03)),
})
opt_state = init_state(model.params)

opt = OptimizationConfig(
    iterations=ITERS,
    position_lr_init=0.0016, position_lr_final=0.00016,
    feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.005, disp_lr=0.001,
    densification_interval=300, densify_from_iter=500,
    densify_until_iter=100000, random_background=False, static_reg=0.0,
)
statics = StepStatics(cfg=cfg, opt=opt, spatial_lr_scale=3.0,
                      capacity=CAPACITY, max_per_tile=4096, backend=BACKEND)

n_total = model.static_capacity + model.dynamic_capacity


def diag_step(params, opt_state, cam, gt, t, iteration):
    m2d = jnp.zeros((n_total, 3), jnp.float32)
    fdirs = jnp.zeros((n_total, 3), jnp.float32)
    grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1, 2), has_aux=True)
    (loss, (res, ll1)), (pg, m2dg, fg) = grad_fn(
        params, m2d, fdirs, model, cam, gt, t, jnp.zeros(3), iteration, statics)
    img = res.render
    ssim_v = ssim(img, gt)
    hook = jax.lax.stop_gradient(jnp.stack(
        [res.acc, jnp.abs(img - gt).mean(-1),
         ssim(img, gt, reduce=False).mean(-1)], axis=-1))
    hook_term = (res.opticalflow * hook).sum()
    regs = _regularizers(params, model._replace(params=params), opt, cfg,
                         iteration)
    pg = scrub_nan(mask_grads(pg, model._replace(params=params)))
    lrs = group_lrs(opt, statics.spatial_lr_scale, iteration)
    new_params, new_opt = radam_update(params, pg, opt_state, lrs)
    stats = {
        "loss": loss, "ll1": ll1, "ssim": ssim_v, "hook": hook_term,
        "regs": regs, "psnr": psnr(img, gt),
        "img_min": img.min(), "img_max": img.max(),
        "flow_absmax": jnp.abs(res.opticalflow).max(),
        "acc_min": res.acc.min(), "acc_max": res.acc.max(),
        "binning_total": res.binning_total,
        "nan_params": sum(jnp.isnan(v).sum() for v in params.values()),
        "gnorm_xyz": jnp.linalg.norm(pg["xyz"]),
        "gnorm_scaling": jnp.linalg.norm(pg["scaling"]),
        "gnorm_opacity": jnp.linalg.norm(pg["opacity"]),
        "scale_max": params["scaling"].max(),
    }
    return new_params, new_opt, stats


jstep = jax.jit(diag_step)

params = model.params
keys = [(ci, t) for ci in [1, 2, 3] for t in range(2)]  # start_duration=2
i = 0
for it in range(1, ITERS + 1):
    ci, t = keys[i % len(keys)]
    i += 1
    params, opt_state, st = jstep(
        params, opt_state, cams[ci], gts[(ci, t)], jnp.asarray(float(t)),
        jnp.asarray(it, jnp.int32))
    if it <= 5 or it % 10 == 0:
        st = {k: float(v) for k, v in st.items()}
        print(json.dumps({"it": it, **{k: round(v, 6) for k, v in st.items()}}),
              flush=True)
        if it == ITERS or it in (50, 100, 150):
            img = render(cams[1], model._replace(params=params), cfg,
                         t=jnp.asarray(1.0), bg=jnp.zeros(3),
                         capacity=CAPACITY, max_per_tile=4096,
                         backend=BACKEND).render
            arr = np.clip(np.asarray(img), 0, 1)
            Image.fromarray((arr * 255).astype(np.uint8)).save(
                f"/tmp/q2diag_{BACKEND}_it{it}.png")
print("done", flush=True)
