"""Offline render + metric harness — the reference's render.py:35-161.

Renders train/test camera sets from a trained model, computes
PSNR/SSIM/LPIPS per frame, measures render FPS with the reference's timing
recipe (20 x 500 re-renders of one camera, 100-iteration warmup,
render.py:91-96), and writes mean_metrics.json / all_metrics.json.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..data.scene import Scene, load_image
from ..models.config import ModelConfig
from ..models.state import GaussianModel
from ..rendering import default_capacity, render
from . import metrics as M


def render_set(
    model: GaussianModel,
    cfg: ModelConfig,
    scene: Scene,
    split: str,
    out_dir: str | None = None,
    *,
    capacity: int | None = None,
    max_per_tile: int | None = None,
    save_images: bool = False,
    measure_fps: bool = True,
    lpips_nets: tuple = ("alex", "vgg"),
    fps_rounds: int = 20,
    fps_inner: int = 500,
    fps_warmup: int = 100,
) -> dict:
    cams = (scene.sampled_test_cameras() if split == "test"
            else scene.sampled_train_cameras())
    if not cams:
        return {"split": split, "n_frames": 0}
    if capacity is None:
        capacity = default_capacity(
            model.static_capacity + model.dynamic_capacity,
            cams[0].width, cams[0].height,
        )
    if max_per_tile is None:
        max_per_tile = min(capacity, 4096)
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.white_background else [0.0, 0.0, 0.0])

    @jax.jit
    def render_one(model, cam, t):
        return render(cam, model, cfg, t=t, bg=bg, capacity=capacity,
                      max_per_tile=max_per_tile).render

    lpips = {n: M.LPIPS(n) for n in lpips_nets}
    rows = []
    if out_dir and save_images:
        os.makedirs(os.path.join(out_dir, "renders"), exist_ok=True)
        os.makedirs(os.path.join(out_dir, "gt"), exist_ok=True)

    for i, cam in enumerate(cams):
        img = render_one(model, cam.render_camera(),
                         jnp.asarray(cam.timestamp, jnp.float32))
        img = np.clip(np.asarray(img), 0.0, 1.0)
        gt = load_image(cam.image_path, (cam.width, cam.height), cam.im_scale)
        row = {
            "frame": cam.image_name,
            "timestamp": cam.timestamp,
            "psnr": M.psnr(img, gt),
            "ssim": M.ssim(img, gt),
            "ssim_sk": M.ssim_skimage(img, gt),
            # the reference's second skimage variant uses data_range=2
            # (render.py:79) — kept for metric-for-metric comparability
            "ssim_sk2": M.ssim_skimage(img, gt, data_range=2.0),
        }
        for n, fn in lpips.items():
            row[f"lpips_{n}"] = fn(img, gt)
        rows.append(row)
        if out_dir and save_images:
            from PIL import Image

            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_dir, "renders", f"{i:05d}.png"))
            Image.fromarray((gt * 255).astype(np.uint8)).save(
                os.path.join(out_dir, "gt", f"{i:05d}.png"))

    result = {"split": split, "n_frames": len(rows)}
    for key in ("psnr", "ssim", "ssim_sk", "ssim_sk2", "lpips_alex",
                "lpips_vgg"):
        vals = [r[key] for r in rows if r.get(key) is not None]
        if vals:
            result[key] = float(np.mean(vals))
    # The reference's mean_metrics.json key names (render.py:98-106), so a
    # reference user's tooling reads our JSONs unchanged.
    _REF_KEYS = {"SSIM": "ssim", "SKSSIM": "ssim_sk", "SKSSIM2": "ssim_sk2",
                 "PSNR": "psnr", "LPIPS": "lpips_alex",
                 "LPIPSVGG": "lpips_vgg"}
    for ref_k, ours_k in _REF_KEYS.items():
        if ours_k in result:
            result[ref_k] = result[ours_k]

    if measure_fps:
        cam = cams[0].render_camera()
        t = jnp.asarray(cams[0].timestamp, jnp.float32)
        # Render-time buffers are sized to the actual instance count like the
        # reference (it allocates per num_rendered, rasterizer_impl.cu:
        # 298-299); the TRAINING capacity can be several x larger, and every
        # capacity-shaped op (expand/sort/pack) would tax each frame.
        from ..models.state import round_capacity
        from ..rendering import render as _render

        probe = _render(cam, model, cfg, t=t, bg=bg, capacity=capacity,
                        max_per_tile=max_per_tile)
        snug = min(capacity,
                   round_capacity(int(probe.binning_total) * 5 // 4, 65536))
        if snug != capacity:
            capacity = snug

            @jax.jit
            def render_one(model, cam, t):  # noqa: F811 — re-jit at snug size
                return render(cam, model, cfg, t=t, bg=bg, capacity=capacity,
                              max_per_tile=max_per_tile).render

        # The reference recipe (render.py:91-96): 20 rounds x 500 renders,
        # timing each call individually and keeping only calls past the
        # per-round 100-iteration warmup. Its render() synchronizes per call
        # (gaussian_renderer/__init__.py:111), so the per-call timing blocks
        # here too.
        warm = fps_warmup if fps_inner > fps_warmup else fps_inner // 2
        times = []
        for _ in range(fps_rounds):
            for idx in range(fps_inner):
                t0 = time.perf_counter()
                out = render_one(model, cam, t)
                jax.block_until_ready(out)
                if idx > warm:
                    times.append(time.perf_counter() - t0)
        # "times" is the reference's mean_metrics.json key (render.py:105)
        result["times"] = float(np.mean(times))
        result["render_time_s"] = float(np.mean(times))
        result["fps"] = float(1.0 / np.mean(times))
        result["mpixels_per_s"] = float(cams[0].width * cams[0].height
                                        / np.mean(times) / 1e6)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        # all_metrics.json in the reference's per-view layout
        # ({METRIC: {image_name: value}}, render.py:111-121); the richer
        # per-frame row list goes to all_metrics_rows.json.
        per_view = {}
        for ref_k, ours_k in _REF_KEYS.items():
            vals = {r["frame"]: r[ours_k] for r in rows
                    if r.get(ours_k) is not None}
            if vals:
                per_view[ref_k] = vals
        with open(os.path.join(out_dir, "all_metrics.json"), "w") as f:
            json.dump(per_view, f, indent=1)
        with open(os.path.join(out_dir, "all_metrics_rows.json"), "w") as f:
            json.dump(rows, f, indent=1)
        with open(os.path.join(out_dir, "mean_metrics.json"), "w") as f:
            json.dump(result, f, indent=1)
    return result
