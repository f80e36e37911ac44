"""Round-5 verify drive: render through the public API with the new
KernelConfig knobs + tight_cull, then a short pipelined Trainer run."""
import os

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ex4dgs_tpu.kernel_config import KernelConfig, configure
from ex4dgs_tpu.models import ModelConfig
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_surface_scene, rig_cameras

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=2, duration=8,
                  near=0.2, far=50.0, resolution=1, sh_degree=3)
target, _ = make_surface_scene(n_static=4000, n_dynamic=400, duration=8.0,
                               seed=7, static_capacity=8192,
                               dynamic_capacity=1024, cfg=cfg)
cams = rig_cameras(5, 3.0, 320, 240, far=cfg.far)

# render with tight_cull OFF and ON through the public API; images must agree
imgs = {}
for tc in (False, True):
    configure(KernelConfig(tight_cull=tc))
    out = render(cams[1], target, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
                 capacity=262144, max_per_tile=4096)
    imgs[tc] = np.clip(np.asarray(out.render), 0, 1)
    print(f"tight_cull={tc}: binning_total={int(out.binning_total)} "
          f"mean={imgs[tc].mean():.5f}")
diff = np.abs(imgs[False] - imgs[True]).max()
print("cull on/off max image diff:", diff)
assert diff < 1e-5, diff
Image.fromarray((imgs[True] * 255).astype(np.uint8)).save("/tmp/r5_verify.png")

# short pipelined trainer run on a tiny disk scene (public Trainer path)
import math
from ex4dgs_tpu.data.cameras import CameraInfo
from ex4dgs_tpu.data.readers import PointCloud, SceneInfo
from ex4dgs_tpu.data.scene import Scene
from ex4dgs_tpu.models import OptimizationConfig
from ex4dgs_tpu.models.state import create_from_pcd
from ex4dgs_tpu.models.temporal import point_data_at_t
from ex4dgs_tpu.ops.math3d import sh0_to_rgb
from ex4dgs_tpu.train.trainer import Trainer

W, H = 160, 120
os.makedirs("/tmp/r5_frames", exist_ok=True)
infos = []
fov = math.radians(60)
for ci, cam in enumerate(rig_cameras(4, 3.0, W, H, far=cfg.far)):
    for t in range(4):
        path = f"/tmp/r5_frames/c{ci}_t{t}.png"
        img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                     bg=jnp.zeros(3), capacity=262144, max_per_tile=4096,
                     backend="jnp").render
        Image.fromarray(
            (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)).save(path)
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
            image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
            near=cfg.near, far=cfg.far, timestamp=float(t)))

rng = np.random.default_rng(0)
pd0 = point_data_at_t(target, cfg, jnp.asarray(0.0), mode=0)
act = np.asarray(pd0.mask)
pts0 = np.asarray(pd0.means3d)[act]
cols0 = np.clip(np.asarray(sh0_to_rgb(pd0.features[act][:, 0])), 0, 1)
init_model = create_from_pcd(pts0, cols0, cfg, duration=2)
opt = OptimizationConfig(
    iterations=240, densification_interval=30, densify_from_iter=20,
    extract_from_iter=20, densify_until_iter=1000,
    progressive_growing_steps=40, make_dynamic_interval=10,
    extracton_interval=60, prune_invisible_interval=100000,
    random_background=False)
info = SceneInfo(point_cloud=PointCloud(pts0, cols0),
                 train_cameras=[i for i in infos if i.uid != 0],
                 test_cameras=[i for i in infos if i.uid == 0],
                 nerf_normalization={"translate": np.zeros(3), "radius": 3.0},
                 ply_path="")
scene = Scene(cfg, scene_info=info)
tr = Trainer(cfg, opt, scene, model=init_model, capacity=262144,
             max_per_tile=4096, seed=1)
m = tr.train(iterations=240)
losses = np.asarray(m["loss"])
print(f"trainer: loss {losses[:20].mean():.4f} -> {losses[-20:].mean():.4f}, "
      f"psnr last {np.asarray(m['psnr'])[-20:].mean():.2f}")
assert np.isfinite(losses).all()
# convergence starts ~iter 100 on this scene (LR warmup + densify events)
assert losses[-20:].mean() < 0.5 * losses[:20].mean()
img = render(cams[0], tr.model, cfg, t=jnp.asarray(1.0), bg=jnp.zeros(3),
             capacity=262144, max_per_tile=4096).render
Image.fromarray(
    (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
).save("/tmp/r5_trained.png")
print("OK")
