"""VERDICT r4 #3: the quality headline AT THE REFERENCE OPERATING POINT.

Surface scene (the N3V analog) at the reference's N3V training resolution
1352x1014 (configs/N3V/n3v_base.json:9 -> scene/cameras.py:201-202), full
reference-shaped schedule, trained Q3_ITERS steps (>=20k; reference trains
40k, render.py:35-123), and — unlike the 800x600 rounds — evaluated
END-TO-END through the production harness eval/render_sets.render_set:
full metric suite (PSNR / SSIM torch / SSIM skimage x2 / LPIPS when
weights exist), per-frame JSONs, and the reference's 20x500 FPS recipe.

Checkpoints save every Q3_CKPT iters so a wall-clock abort still yields an
evaluable model.
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
from ex4dgs_tpu.eval.render_sets import render_set
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.ops.math3d import sh0_to_rgb
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_surface_scene, rig_cameras
from ex4dgs_tpu.train.trainer import Trainer

W, H = 1352, 1014
N_T = 8
N_CAMS = 19
ITERS = int(os.environ.get("Q3_ITERS", 20000))
CKPT_EVERY = int(os.environ.get("Q3_CKPT", 2500))
CAPACITY = int(os.environ.get("Q3_CAP", 1572864))  # 1.5M initial; growth owns the rest
OUT = os.environ.get("Q3_OUT", "/tmp/q3_out")

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1, sh_degree=3)
target, _ = make_surface_scene(n_static=50_000, n_dynamic=5_000,
                               duration=8.0, seed=7,
                               static_capacity=65_536,
                               dynamic_capacity=8_192, cfg=cfg)
cams = rig_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
fov = math.radians(60)

out_dir = "/tmp/q3_frames"
os.makedirs(out_dir, exist_ok=True)
infos = []
t_gt = time.time()
for ci, cam in enumerate(cams):
    for t in range(N_T):
        path = os.path.join(out_dir, f"c{ci}_t{t}.png")
        if not os.path.exists(path):
            img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                         bg=jnp.zeros(3), capacity=2 * CAPACITY,
                         max_per_tile=4096, backend="jnp").render
            img = np.clip(np.asarray(img), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
            image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
            near=cfg.near, far=cfg.far, timestamp=float(t),
        ))
print(f"GT frames ready ({time.time() - t_gt:.0f}s)", flush=True)

test_infos = [i for i in infos if i.uid == 0]  # cam00 analog held out
train_infos = [i for i in infos if i.uid != 0]

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

# Reference-shaped schedule scaled to this scene (same shape as the 800x600
# headline run, tools/tpu_probes/_tpu_quality2.py)
opt = OptimizationConfig(
    iterations=ITERS,
    position_lr_init=0.0016, position_lr_final=0.00016,
    feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.005, disp_lr=0.001,
    densification_interval=300, densify_from_iter=500,
    densify_until_iter=int(ITERS * 0.75),
    extract_from_iter=500, extracton_interval=max(1, ITERS // 10),
    progressive_growing_steps=max(1, ITERS // 10),
    make_dynamic_interval=100,
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
             metrics_path="/tmp/q3_metrics.jsonl", log_every=100,
             test_iterations=tuple(range(1000, ITERS + 1, 1000)))

t0 = time.time()
# Wall-clock budget: stop training at the last checkpoint boundary that fits
# (the end-to-end eval below must still run). ITERS remains the target.
BUDGET_S = float(os.environ.get("Q3_TIME_BUDGET_S", 1e12))
while tr.iteration < ITERS:
    tr.train(iterations=min(tr.iteration + CKPT_EVERY, ITERS))
    tr.save(OUT)
    el = time.time() - t0
    s_per = el / tr.iteration
    print(f"checkpoint @ {tr.iteration} "
          f"({el:.0f}s, {s_per:.2f} s/iter, "
          f"n_static={int(tr.model.n_static())}, "
          f"n_dyn={int(tr.model.n_dynamic())})", flush=True)
    if tr.iteration < ITERS and el + CKPT_EVERY * s_per > BUDGET_S:
        print(f"time budget: stopping at {tr.iteration} iters", flush=True)
        break
wall = time.time() - t0
ITERS = tr.iteration

# ---- END-TO-END eval through the production harness -----------------------
eval_dir = os.path.join(OUT, "test")
res = render_set(tr.model, cfg, scene, "test", out_dir=eval_dir,
                 save_images=True, measure_fps=True,
                 fps_rounds=int(os.environ.get("Q3_FPS_ROUNDS", 20)),
                 fps_inner=int(os.environ.get("Q3_FPS_INNER", 500)))
summary = {
    "config": "2@N3V-res: 50k+5k, 8 ts, 1352x1014, full schedule, pallas",
    "iters": ITERS,
    "train_wall_s": round(wall, 1),
    "train_s_per_iter": round(wall / ITERS, 3),
    "n_static": int(tr.model.n_static()),
    "n_dynamic": int(tr.model.n_dynamic()),
    "harness": "eval/render_sets.render_set",
    **{k: res[k] for k in ("psnr", "ssim", "ssim_sk", "ssim_sk2", "fps",
                           "mpixels_per_s", "times", "n_frames")
       if k in res},
}
print("SUMMARY " + json.dumps(summary), flush=True)
