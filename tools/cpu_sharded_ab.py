"""VERDICT r2 #7: trainer-level sharded-vs-unsharded A/B on the CPU mesh.

Trains the same synthetic 4D scene twice with the same seed — once through
the single-device step, once through the shard_map step on a virtual
(data=1, gauss=G) mesh — and reports the final test-PSNR delta, the same
way the pallas/jnp backend divergence was quantified
(tools/tpu_probes/_tpu_parity_train.py). Quantifies the training-trajectory
impact of the sharded step's gradient tail (retiled reductions + slab-local
binning/pack) through the density-control events.

Run: env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
     XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python tools/cpu_sharded_ab.py
"""
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
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.ops.losses import psnr
from ex4dgs_tpu.parallel.mesh import make_mesh
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.trainer import Trainer

W, H = 256, 192
N_CAMS, N_T = 4, 4
ITERS = int(os.environ.get("AB_ITERS", 500))
GAUSS = int(os.environ.get("AB_GAUSS", 4))
CAPACITY = 128 * 1024

cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=3, duration=4,
                  near=0.2, far=50.0, resolution=1)
target, _ = make_scene(n_static=1500, n_dynamic=150, duration=4.0, seed=5,
                       static_capacity=2048, dynamic_capacity=256, cfg=cfg)
cams = ring_cameras(N_CAMS, 3.0, W, H, far=cfg.far)
fov = math.radians(60)

out_dir = "/tmp/ab_frames"
os.makedirs(out_dir, exist_ok=True)
infos = []
for ci, cam in enumerate(cams):
    for t in range(N_T):
        img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                     bg=jnp.zeros(3), capacity=CAPACITY,
                     max_per_tile=1024, backend="jnp").render
        img = np.clip(np.asarray(img), 0, 1)
        path = os.path.join(out_dir, f"c{ci}_t{t}.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(path)
        view = np.asarray(cam.view)
        infos.append(CameraInfo(
            uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
            image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
            near=cfg.near, far=cfg.far, timestamp=float(t),
        ))
print("GT frames rendered", flush=True)

rng = np.random.default_rng(0)
n = 1500
pts0 = np.asarray(target.params["xyz"][:n]) + rng.normal(
    scale=0.02, size=(n, 3)).astype(np.float32)
from ex4dgs_tpu.ops.math3d import sh0_to_rgb

cols0 = np.clip(np.asarray(sh0_to_rgb(target.params["f_dc"][:n, 0])), 0, 1)

opt = OptimizationConfig(
    iterations=ITERS,
    position_lr_init=0.0016, position_lr_final=0.00016,
    feature_lr=0.025, opacity_lr=0.1, scaling_lr=0.01, disp_lr=0.001,
    densification_interval=100, densify_from_iter=60,
    extract_from_iter=60, densify_until_iter=100000,
    progressive_growing_steps=180, make_dynamic_interval=30,
    extracton_interval=250, prune_invisible_interval=10_000,
    random_background=False, static_reg=0.0,
)


def run(mesh):
    info = SceneInfo(
        point_cloud=PointCloud(pts0.copy(), cols0.copy()),
        train_cameras=list(infos),
        test_cameras=infos[:4],
        nerf_normalization={"translate": np.zeros(3), "radius": 3.0},
        ply_path="",
    )
    scene = Scene(cfg, scene_info=info)
    tr = Trainer(cfg, opt, scene, capacity=CAPACITY, max_per_tile=1024,
                 seed=1, backend="jnp", mesh=mesh)
    t0 = time.time()
    tr.train(iterations=ITERS)
    wall = time.time() - t0
    vs = []
    for inf in infos:
        gt = np.asarray(Image.open(inf.image_path), np.float32)[..., :3] / 255.0
        cam_i = cams[inf.uid]
        img = render(cam_i, tr.model, cfg, t=jnp.asarray(inf.timestamp),
                     bg=jnp.zeros(3), capacity=CAPACITY, max_per_tile=1024,
                     backend="jnp").render
        vs.append(float(psnr(jnp.clip(img, 0, 1), jnp.asarray(gt))))
    name = "sharded" if mesh is not None else "single"
    print(f"[{name}] wall={wall:.0f}s PSNR={float(np.mean(vs)):.3f} "
          f"n_static={int(tr.model.n_static())} "
          f"n_dyn={int(tr.model.n_dynamic())}", flush=True)
    return float(np.mean(vs))


p_single = run(None)
mesh = make_mesh(GAUSS, data=1, gauss=GAUSS)
p_shard = run(mesh)
print(f"RESULT sharded-vs-single trainer delta: {p_shard - p_single:+.4f} dB "
      f"(single {p_single:.3f}, sharded {p_shard:.3f})", flush=True)
