#!/usr/bin/env python
"""Evaluation/render CLI — the reference's render.py:126-161 surface.

Loads a trained model (checkpoint .npz or PLY pair), renders the train/test
sets, computes PSNR/SSIM/LPIPS + FPS, writes mean_metrics.json.
"""
from __future__ import annotations

import argparse
import json
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", required=True)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--save_images", action="store_true")
    parser.add_argument("--fps_inner", type=int, default=500,
                        help="re-renders per timing round (reference: 500)")
    args = parser.parse_args(argv)

    from ex4dgs_tpu.models.config import ModelConfig, OptimizationConfig, overlay_json

    cfg_path = os.path.join(args.model_path, "cfg_args.json")
    cfg = overlay_json(ModelConfig(), cfg_path)

    from ex4dgs_tpu.data.scene import Scene
    from ex4dgs_tpu.models.density import push

    scene = Scene(cfg, model_path=args.model_path)

    it = args.iteration
    if it == -1:  # newest
        pc_dir = os.path.join(args.model_path, "point_cloud")
        iters = [int(d.split("_")[-1]) for d in os.listdir(pc_dir)] if os.path.isdir(pc_dir) else []
        ckpts = [int(f[6:-4]) for f in os.listdir(args.model_path)
                 if f.startswith("chkpnt") and f.endswith(".npz")]
        it = max(iters + ckpts)

    ckpt = os.path.join(args.model_path, f"chkpnt{it}.npz")
    if os.path.exists(ckpt):
        from ex4dgs_tpu.io.checkpoint import load_checkpoint

        hm, _, extra = load_checkpoint(ckpt)
    else:
        from ex4dgs_tpu.io.model_ply import load_model_ply

        hm = load_model_ply(
            os.path.join(args.model_path, "point_cloud", f"iteration_{it}",
                         "point_cloud.ply"),
            cfg, duration=scene.duration,
        )
    model, _ = push(hm, cfg)
    scene.set_sampling_len(hm.duration)

    from ex4dgs_tpu.eval.render_sets import render_set

    results = {}
    for split, skip in (("test", args.skip_test), ("train", args.skip_train)):
        if skip:
            continue
        out_dir = os.path.join(args.model_path, split, f"ours_{it}")
        results[split] = render_set(model, cfg, scene, split, out_dir,
                                    save_images=args.save_images,
                                    measure_fps=(split == "test"),
                                    fps_inner=args.fps_inner)
        print(split, json.dumps(results[split], indent=1), flush=True)
    return results


if __name__ == "__main__":
    main()
