"""CPU validation of the surface-target quality harness: same scene/rig shape
as _tpu_quality2.py Q2_TARGET=surface at repro scale (280x210, 19 cams), full
reference-shaped schedule, held-out trajectory via test_iterations. The dust
target plateaued at ~17 dB held-out while train hit 34 dB (novel views of
random volumetric dust are ill-posed); a reconstructable surface target must
show held-out PSNR tracking train PSNR."""
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
from ex4dgs_tpu.synthetic import make_surface_scene, rig_cameras
from ex4dgs_tpu.train.trainer import Trainer

W, H = 280, 210
N_CAMS, N_T = 19, 8
ITERS = int(os.environ.get("QR_ITERS", 1200))
CAPACITY = 256 * 1024

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1, sh_degree=3)
target, _ = make_surface_scene(n_static=6_000, n_dynamic=600, duration=8.0,
                               seed=7, static_capacity=8192,
                               dynamic_capacity=1024, cfg=cfg)
cams = rig_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
fov = math.radians(60)

out_dir = "/tmp/qsurf_frames"
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
print("GT rendered", flush=True)

test_infos = [i for i in infos if i.uid == 0]
train_infos = [i for i in infos if i.uid != 0]

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
             max_per_tile=4096, seed=1, backend="jnp",
             metrics_path="/tmp/qsurf_metrics.jsonl", log_every=50,
             test_iterations=tuple(range(ITERS // 8, ITERS + 1, ITERS // 8)))
tr.train(iterations=ITERS)
print("n_static", int(tr.model.n_static()), "n_dyn", int(tr.model.n_dynamic()))

vs = []
for inf in test_infos:
    gt = np.asarray(Image.open(inf.image_path), np.float32)[..., :3] / 255.0
    img = render(cams[inf.uid], tr.model, cfg, t=jnp.asarray(inf.timestamp),
                 bg=jnp.zeros(3), capacity=CAPACITY, max_per_tile=4096,
                 backend="jnp").render
    img = np.clip(np.asarray(img), 0, 1)
    vs.append(float(psnr(jnp.asarray(img), jnp.asarray(gt))))
    Image.fromarray((img * 255).astype(np.uint8)).save(
        f"/tmp/qsurf_render_{inf.image_name}")
print("held-out PSNR", float(np.mean(vs)), flush=True)
