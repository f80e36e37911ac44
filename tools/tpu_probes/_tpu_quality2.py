"""BASELINE fill-in row 2: dynamic keyframe-interpolation unit scene.

50k static + 5k dynamic Gaussians, 8 timesteps, 800x600 (BASELINE.json
config 2). Ground truth frames are rendered from a synthetic scene through
the jnp oracle; training runs the production pallas backend with the full
densify/extract/progressive schedule on 9 ring cameras, evaluating on a
held-out camera (the N3V cam00 analog). Reports PSNR / SSIM (torch-style) /
SSIM (skimage-style) on the held-out views plus train + render throughput.
"""
import json
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ex4dgs_tpu.data.cameras import CameraInfo
from ex4dgs_tpu.data.readers import PointCloud, SceneInfo
from ex4dgs_tpu.data.scene import Scene
from ex4dgs_tpu.eval.metrics import ssim as ssim_torch
from ex4dgs_tpu.eval.metrics import ssim_skimage
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.ops.losses import psnr
from ex4dgs_tpu.ops.math3d import sh0_to_rgb
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import (make_scene, make_surface_scene,
                                  rig_cameras, ring_cameras)
from ex4dgs_tpu.train.trainer import Trainer

W, H = 800, 600
N_T = 8
ITERS = int(os.environ.get("Q2_ITERS", 3000))
CAPACITY = 1024 * 1024

FULL_SCHED = os.environ.get("Q2_SOFT", "0") != "1"  # VERDICT r3: full is default
# Q2_TARGET=surface (default): reconstructable surface scene + a 19-camera
# two-elevation rig (the N3V analog: ~19 cameras, cam00 held out).
# Q2_TARGET=dust: the original random volumetric cloud + 10-camera ring —
# kept as an ablation; measured train 34 dB / held-out flat ~17 dB at 800x600
# (novel views of random dust are ill-posed, see synthetic.make_surface_scene).
TARGET_KIND = os.environ.get("Q2_TARGET", "surface")
N_CAMS = 19 if TARGET_KIND == "surface" else 10

cfg = ModelConfig(time_interval=2, time_pad=1,
                  start_duration=2 if FULL_SCHED else 8, duration=8,
                  near=0.2, far=50.0, resolution=1,
                  # Q2_SH=0 ablation: the synthetic GT is Lambertian
                  # (f_rest == 0), so angular SH freedom can only overfit
                  # the training views
                  sh_degree=int(os.environ.get("Q2_SH", 3)))
if TARGET_KIND == "surface":
    target, _ = make_surface_scene(n_static=50_000, n_dynamic=5_000,
                                   duration=8.0, seed=7,
                                   static_capacity=65_536,
                                   dynamic_capacity=8_192, cfg=cfg)
    cams = rig_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
else:
    # opacity 0.85: near-opaque dust (a translucent opacity-0.1 target spreads
    # every pixel's error across ~20 blended layers and made the
    # reference-shaped densify/extract schedule runaway)
    target, _ = make_scene(n_static=50_000, n_dynamic=5_000, duration=8.0,
                           seed=7, static_capacity=65_536,
                           dynamic_capacity=8_192, cfg=cfg, opacity=0.85)
    cams = ring_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
fov = math.radians(60)

out_dir = f"/tmp/q2_frames_{TARGET_KIND}"
os.makedirs(out_dir, exist_ok=True)
infos = []
for ci, cam in enumerate(cams):
    for t in range(N_T):
        path = os.path.join(out_dir, f"c{ci}_t{t}.png")
        if not os.path.exists(path):
            img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                         bg=jnp.zeros(3), capacity=CAPACITY,
                         max_per_tile=4096, backend="jnp").render
            img = np.clip(np.asarray(img), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
            image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
            near=cfg.near, far=cfg.far, timestamp=float(t),
        ))
print("GT frames rendered", flush=True)

# held-out camera 0 = the test split (N3V cam00 analog)
test_infos = [i for i in infos if i.uid == 0]
train_infos = [i for i in infos if i.uid != 0]

# Init cloud = all ACTIVE rows at t=0 (the reference analog: the COLMAP
# triangulation of frame 0 sees moving objects at their t=0 positions,
# scripts/pre_n3d.py:42-49) + noise. Two measured failure modes to avoid
# (both produced the fog init that diverged at 800x600):
#  - slicing params["xyz"][:55000] includes 5k capacity-PADDING rows — a
#    dense zero blob at the origin with garbage colors;
#  - the random volumetric cloud's 3-NN far tail inflates init scales into
#    thousand-pixel splats (iter-0 render mean 0.51 vs GT 0.07). Real COLMAP
#    clouds are surface-like and don't have this tail; make_scene applies
#    the same clip to the TARGET's scales for the same reason
#    (synthetic.py:65-72), so the trained init gets it too.
from ex4dgs_tpu.models.state import create_from_pcd
from ex4dgs_tpu.models.temporal import point_data_at_t

rng = np.random.default_rng(0)
pd0 = point_data_at_t(target, cfg, jnp.asarray(0.0), mode=0)
act = np.asarray(pd0.mask)
pts0 = np.asarray(pd0.means3d)[act] + rng.normal(
    scale=0.02, size=(int(act.sum()), 3)).astype(np.float32)
cols0 = np.clip(np.asarray(sh0_to_rgb(pd0.features[act][:, 0])), 0, 1)
init_model = create_from_pcd(pts0, cols0, cfg,
                             duration=max(cfg.start_duration, 1))
init_model = init_model._replace(params={
    **init_model.params,
    "scaling": jnp.minimum(init_model.params["scaling"], np.log(0.03)),
})

if FULL_SCHED:
    # Reference-shaped schedule (configs/N3V/n3v_base.json scaled to this
    # scene's 8 timesteps / ITERS budget): DEFAULT densify thresholds
    # (0.0002/0.0001), progressive duration growth from start_duration=2 to
    # the full 8 (sample window +time_interval every growth step, done by
    # ~1/3 of the run like the reference's 10->300 over 40k), reference
    # cadence ratios for densify (300/500/0.75) and extraction (~1/10).
    # Q2_EXTRACT=0: extraction-off ablation (VERDICT r4 #8) — the N3V
    # schedule lives or dies on static->dynamic extraction at the
    # worst-loss timestamp (c_gaussian_model.py:1147-1227); this measures
    # the held-out delta it buys on the surface scene.
    extract_on = os.environ.get("Q2_EXTRACT", "1") == "1"
    opt = OptimizationConfig(
        iterations=ITERS,
        position_lr_init=0.0016, position_lr_final=0.00016,
        feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.005, disp_lr=0.001,
        densification_interval=300, densify_from_iter=500,
        densify_until_iter=int(ITERS * 0.75),
        # extraction-off keeps extract_from_iter (it also gates progressive
        # growth) and instead disables both extraction triggers: the
        # interval event and the growth-driven mark (extract_every)
        extract_from_iter=500,
        extracton_interval=max(1, ITERS // 10) if extract_on else ITERS + 1,
        # off-value must keep progressive_growing_steps * extract_every
        # inside int32 (train/step.py:112 folds it into a jit argument)
        extract_every=1 if extract_on else 10**5,
        progressive_growing_steps=max(1, ITERS // 10),
        make_dynamic_interval=100,
        prune_invisible_interval=10_000,
        random_background=False, static_reg=0.0,
    )
else:
    # round-2 softened schedule (kept for A/B against the full one)
    opt = OptimizationConfig(
        iterations=ITERS,
        position_lr_init=0.0016, position_lr_final=0.00016,
        feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.005, disp_lr=0.001,
        densification_interval=100, densify_from_iter=100,
        densify_until_iter=int(ITERS * 0.6),
        densify_grad_threshold=0.0008, densify_dgrad_threshold=0.0004,
        extract_from_iter=200, extracton_interval=250,
        progressive_growing_steps=100000, make_dynamic_interval=50,
        prune_invisible_interval=10_000,
        random_background=False, static_reg=0.0,
    )

info = SceneInfo(
    point_cloud=PointCloud(pts0, cols0),
    train_cameras=train_infos,
    test_cameras=test_infos,
    nerf_normalization={"translate": np.zeros(3), "radius": 3.0},
    ply_path="",
)
scene = Scene(cfg, scene_info=info)
tr = Trainer(cfg, opt, scene, model=init_model, capacity=CAPACITY,
             max_per_tile=4096, seed=1, backend="pallas",
             metrics_path=f"/tmp/q2_metrics_{TARGET_KIND}.jsonl", log_every=50,
             # held-out PSNR trajectory: localizes any train/test gap in
             # time (SH-degree bumps at 1000/2000/3000 vs densify from 600)
             test_iterations=tuple(range(250, ITERS + 1, 250)))
t0 = time.time()
tr.train(iterations=ITERS)
wall = time.time() - t0
mpix_train = ITERS * W * H / wall / 1e6  # incl. schedule/host events

tr.save(f"/tmp/q2_model_{TARGET_KIND}")  # post-mortem: full checkpoint + PLY pair

# held-out metrics (production pallas renderer)
rows = []
for inf in test_infos:
    gt = np.asarray(Image.open(inf.image_path), np.float32)[..., :3] / 255.0
    img = render(cams[inf.uid], tr.model, cfg, t=jnp.asarray(inf.timestamp),
                 bg=jnp.zeros(3), capacity=CAPACITY, max_per_tile=4096,
                 backend="pallas").render
    img = np.clip(np.asarray(img), 0, 1)
    rows.append({
        "name": inf.image_name,
        "psnr": float(psnr(jnp.asarray(img), jnp.asarray(gt))),
        "ssim": float(ssim_torch(img, gt)),
        "ssim_sk": float(ssim_skimage(img, gt)),
    })
    print(rows[-1], flush=True)
    Image.fromarray((img * 255).astype(np.uint8)).save(
        f"/tmp/q2_render_{TARGET_KIND}_{inf.image_name}")

# render-only FPS on the production path (one camera re-rendered; the
# reference recipe is 20x500 with 100 warmup — use 5x100/50 here to keep the
# single-chip queue reasonable, same estimator). Buffers sized to the actual
# instance count like the reference (rasterizer_impl.cu:298-299 allocates
# per num_rendered), not the training capacity.
from ex4dgs_tpu.models.state import round_capacity

_probe = render(cams[1], tr.model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                capacity=CAPACITY, max_per_tile=4096, backend="pallas")
RCAP = min(CAPACITY, round_capacity(int(_probe.binning_total) * 5 // 4, 65536))
rfn = jax.jit(lambda m, t: render(
    cams[1], m, cfg, t=t, bg=jnp.zeros(3), capacity=RCAP,
    max_per_tile=4096, backend="pallas").render)
for _ in range(50):
    rfn(tr.model, jnp.asarray(1.0)).block_until_ready()
t0 = time.time()
R = 500
for _ in range(R):
    rfn(tr.model, jnp.asarray(1.0)).block_until_ready()
dt = time.time() - t0
fps = R / dt

summary = {
    "config": "2. 50k static + 5k dynamic, 8 timesteps, 800x600",
    "target": TARGET_KIND,
    "n_cams": N_CAMS,
    "iters": ITERS,
    "psnr": float(np.mean([r["psnr"] for r in rows])),
    "ssim": float(np.mean([r["ssim"] for r in rows])),
    "ssim_sk": float(np.mean([r["ssim_sk"] for r in rows])),
    "train_wall_s": round(wall, 1),
    "train_mpix_s": round(mpix_train, 2),
    "render_fps": round(fps, 1),
    "render_mpix_s": round(fps * W * H / 1e6, 1),
    "n_static": int(tr.model.n_static()),
    "n_dynamic": int(tr.model.n_dynamic()),
}
print("SUMMARY " + json.dumps(summary), flush=True)
