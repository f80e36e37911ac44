"""End-to-end 4D fit: render GT frames from a known dynamic scene, train a
fresh model through the full Trainer (densify/prune/extract schedule on), and
verify the reconstruction improves substantially and tracks time."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ex4dgs_tpu.data.cameras import CameraInfo
from ex4dgs_tpu.data.readers import PointCloud, SceneInfo
from ex4dgs_tpu.data.scene import Scene
from ex4dgs_tpu.models import ModelConfig, OptimizationConfig
from ex4dgs_tpu.ops.losses import psnr
from ex4dgs_tpu.rendering import render
from ex4dgs_tpu.synthetic import make_scene, ring_cameras
from ex4dgs_tpu.train.trainer import Trainer

W, H = 96, 64
N_CAMS, N_T = 4, 4


@pytest.mark.slow
def test_4d_fit(tmp_path):
    from PIL import Image

    cfg = ModelConfig(time_interval=2, time_pad=1, start_duration=3, duration=4,
                      near=0.2, far=50.0, resolution=1)
    target, _ = make_scene(n_static=400, n_dynamic=60, duration=4.0, seed=5,
                          static_capacity=512, dynamic_capacity=64, cfg=cfg)
    cams = ring_cameras(N_CAMS, 3.0, W, H, far=cfg.far)

    # ground-truth renders + synthetic scene records
    infos = []
    rng = np.random.default_rng(0)
    pts_dir = str(tmp_path / "frames")
    os.makedirs(pts_dir, exist_ok=True)
    import math

    fov = math.radians(60)
    for ci, cam in enumerate(cams):
        for t in range(N_T):
            img = render(cam, target, cfg, t=jnp.asarray(float(t)),
                         bg=jnp.zeros(3), capacity=65536,
                         max_per_tile=512).render
            img = np.clip(np.asarray(img), 0, 1)
            path = os.path.join(pts_dir, f"c{ci}_t{t}.png")
            Image.fromarray((img * 255).astype(np.uint8)).save(path)
            view = np.asarray(cam.view)
            infos.append(CameraInfo(
                uid=ci, R=view[:3, :3].T, T=view[:3, 3], fovx=fov, fovy=fov,
                image_path=path, image_name=f"c{ci}_t{t}.png", width=W, height=H,
                near=cfg.near, far=cfg.far, timestamp=float(t),
            ))

    # init point cloud: target's active static means + colors (jittered)
    n = 400
    pts = np.asarray(target.params["xyz"][:n]) + rng.normal(scale=0.02,
                                                            size=(n, 3)).astype(np.float32)
    from ex4dgs_tpu.ops.math3d import sh0_to_rgb

    cols = np.clip(np.asarray(sh0_to_rgb(target.params["f_dc"][:n, 0])), 0, 1)
    info = SceneInfo(
        point_cloud=PointCloud(pts.astype(np.float32), cols.astype(np.float32)),
        train_cameras=infos,
        test_cameras=infos[:2],
        nerf_normalization={"translate": np.zeros(3), "radius": 3.0},
        ply_path="",
    )
    scene = Scene(cfg, scene_info=info)

    opt = OptimizationConfig(
        iterations=400,
        position_lr_init=0.0016, position_lr_final=0.00016,
        feature_lr=0.025, opacity_lr=0.1, scaling_lr=0.01, disp_lr=0.001,
        densification_interval=100, densify_from_iter=60,
        extract_from_iter=60, densify_until_iter=2000,
        progressive_growing_steps=120, make_dynamic_interval=30,
        extracton_interval=200, prune_invisible_interval=10_000,
        random_background=False, static_reg=0.0,
    )
    trainer = Trainer(cfg, opt, scene, capacity=65536, max_per_tile=512, seed=1)

    # baseline PSNR of the un-trained model on frame (cam0, t=1)
    gt = np.asarray(Image.open(infos[1].image_path), np.float32)[..., :3] / 255.0
    before = render(cams[0], trainer.model, cfg, t=jnp.asarray(1.0),
                    bg=jnp.zeros(3), capacity=65536, max_per_tile=512).render
    psnr_before = float(psnr(jnp.clip(before, 0, 1), jnp.asarray(gt)))

    metrics = trainer.train(iterations=400)
    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all()

    after = render(cams[0], trainer.model, cfg, t=jnp.asarray(1.0),
                   bg=jnp.zeros(3), capacity=65536, max_per_tile=512).render
    psnr_after = float(psnr(jnp.clip(after, 0, 1), jnp.asarray(gt)))
    assert psnr_after > psnr_before + 3.0, (psnr_before, psnr_after)
    assert psnr_after > 20.0, psnr_after

    # the model must track time: renders at t=0 and t=3 differ where the
    # dynamic splats moved
    r0 = np.asarray(render(cams[0], trainer.model, cfg, t=jnp.asarray(0.0),
                           bg=jnp.zeros(3), capacity=65536,
                           max_per_tile=512).render)
    r3 = np.asarray(render(cams[0], trainer.model, cfg, t=jnp.asarray(3.0),
                           bg=jnp.zeros(3), capacity=65536,
                           max_per_tile=512).render)
    gt0 = np.asarray(Image.open(infos[0].image_path), np.float32)[..., :3] / 255.0
    gt3 = np.asarray(Image.open(infos[3].image_path), np.float32)[..., :3] / 255.0
    # temporal PSNR: each render closer to its own timestamp's GT
    assert float(psnr(jnp.asarray(r0), jnp.asarray(gt0))) > float(
        psnr(jnp.asarray(r3), jnp.asarray(gt0))) - 1.0
