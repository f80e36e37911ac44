"""Diagnose the at-scale held-out collapse (train 38 dB vs test 13.4 dB in
the 3000-iter q2 run): hypothesis = higher SH bands overfit the 9 ring
training views once the 1000-iteration oneupSHdegree ramp activates them
(the <=600-iter CPU repros never reached degree>0, which is why they all
converged). Protocol: same scene/schedule shape as _cpu_quality_repro.py,
but active_sh_degree forced to sh_degree from iteration 0; evaluate the
held-out camera with the full model AND with f_rest zeroed."""
import math
import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ex4dgs_tpu.data.cameras import CameraInfo
from ex4dgs_tpu.data.readers import PointCloud, SceneInfo
from ex4dgs_tpu.data.scene import Scene
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.models.state import create_from_pcd
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops.losses import psnr
from ex4dgs_tpu.ops.math3d import sh0_to_rgb
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.trainer import Trainer

W, H = 224, 160
N_CAMS, N_T = 10, 8  # 10 cams like q2 (9 train + held-out cam 0)
ITERS = int(os.environ.get("QR_ITERS", 600))
CAPACITY = 128 * 1024
SH_FROM_START = os.environ.get("SH_FROM_START", "1") == "1"

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=8, duration=8,
                  near=0.2, far=50.0, resolution=1, sh_degree=3)
target, _ = make_scene(n_static=3_000, n_dynamic=300, duration=8.0, seed=7,
                       static_capacity=4096, dynamic_capacity=512, cfg=cfg,
                       opacity=0.85)
cams = ring_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
fov = math.radians(60)

out_dir = "/tmp/shdiag_frames"
os.makedirs(out_dir, exist_ok=True)
infos = []
for ci, cam in enumerate(cams):
    for t in range(N_T):
        path = os.path.join(out_dir, f"c{ci}_t{t}.png")
        if not os.path.exists(path):
            img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                         bg=jnp.zeros(3), capacity=CAPACITY,
                         max_per_tile=2048, backend="jnp").render
            img = np.clip(np.asarray(img), 0, 1)
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
            image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
            near=cfg.near, far=cfg.far, timestamp=float(t),
        ))
print("GT rendered", flush=True)

test_infos = [i for i in infos if i.uid == 0]
train_infos = [i for i in infos if i.uid != 0]

rng = np.random.default_rng(0)
pd0 = point_data_at_t(target, cfg, jnp.asarray(0.0), mode=0)
act = np.asarray(pd0.mask)
pts0 = np.asarray(pd0.means3d)[act] + rng.normal(
    scale=0.02, size=(int(act.sum()), 3)).astype(np.float32)
cols0 = np.clip(np.asarray(sh0_to_rgb(pd0.features[act][:, 0])), 0, 1)
init_model = create_from_pcd(pts0, cols0, cfg, duration=8)
init_model = init_model._replace(params={
    **init_model.params,
    "scaling": jnp.minimum(init_model.params["scaling"], np.log(0.03)),
})
if SH_FROM_START:
    init_model = init_model._replace(
        active_sh_degree=jnp.asarray(cfg.sh_degree))

opt = OptimizationConfig(
    iterations=ITERS,
    position_lr_init=0.0016, position_lr_final=0.00016,
    feature_lr=0.025, opacity_lr=0.05, scaling_lr=0.005, disp_lr=0.001,
    densification_interval=ITERS * 300 // 4000,
    densify_from_iter=ITERS * 500 // 4000,
    densify_until_iter=int(ITERS * 0.75),
    extract_from_iter=ITERS * 500 // 4000,
    extracton_interval=max(1, ITERS // 10),
    progressive_growing_steps=max(1, ITERS // 10),
    make_dynamic_interval=max(1, ITERS // 40),
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
             max_per_tile=2048, seed=1, backend="jnp",
             metrics_path="/tmp/shdiag_metrics.jsonl", log_every=50,
             test_iterations=tuple(range(100, ITERS + 1, 100)))
tr.train(iterations=ITERS)
print("n_static", int(tr.model.n_static()), "n_dyn", int(tr.model.n_dynamic()))


def eval_heldout(model, tag):
    vs = []
    for inf in test_infos:
        gt = np.asarray(Image.open(inf.image_path), np.float32)[..., :3] / 255.0
        img = render(cams[inf.uid], model, cfg, t=jnp.asarray(inf.timestamp),
                     bg=jnp.zeros(3), capacity=CAPACITY, max_per_tile=2048,
                     backend="jnp").render
        vs.append(float(psnr(jnp.clip(img, 0, 1), jnp.asarray(gt))))
    print(f"held-out PSNR [{tag}]", np.mean(vs), flush=True)
    return np.mean(vs)


def eval_train(model, tag):
    vs = []
    for inf in train_infos[:8]:
        gt = np.asarray(Image.open(inf.image_path), np.float32)[..., :3] / 255.0
        img = render(cams[inf.uid], model, cfg, t=jnp.asarray(inf.timestamp),
                     bg=jnp.zeros(3), capacity=CAPACITY, max_per_tile=2048,
                     backend="jnp").render
        vs.append(float(psnr(jnp.clip(img, 0, 1), jnp.asarray(gt))))
    print(f"train PSNR [{tag}]", np.mean(vs), flush=True)


eval_train(tr.model, "full")
full = eval_heldout(tr.model, "full")

# zero the SH rest bands (features [:, 1:, :] := 0) on both clouds
p = dict(tr.model.params)
p["f_rest"] = jnp.zeros_like(p["f_rest"])
if "motion_f_rest" in p:
    p["motion_f_rest"] = jnp.zeros_like(p["motion_f_rest"])
norest_model = tr.model._replace(params=p)
norest = eval_heldout(norest_model, "f_rest=0")
print(f"DIAG delta (f_rest=0 minus full) = {norest - full:+.2f} dB", flush=True)
