#!/usr/bin/env python
"""Training CLI — the reference's train.py:371-420 surface.

Usage:
  python train.py --config configs/n3v_base.json --source_path <scene> \
      --model_path out/scene [--iterations N] [--start_checkpoint ckpt.npz]

Flags mirror the reference's argparse groups (arguments/__init__.py) via the
dataclass configs; any Model/Optimization/Pipeline field is settable as
--<name> and a JSON config overlays first (unknown keys ignored).
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _add_dataclass_args(parser, cls):
    for f in dataclasses.fields(cls):
        if f.type in ("bool", bool):
            parser.add_argument(f"--{f.name}", type=lambda s: s.lower() in ("1", "true", "yes"),
                                default=None)
        else:
            ftype = {"int": int, "float": float, "str": str}.get(str(f.type), str)
            parser.add_argument(f"--{f.name}", type=ftype, default=None)


def main(argv=None):
    from ex4dgs_tpu.models.config import (ModelConfig, OptimizationConfig,
                                          PipelineConfig, overlay_json)

    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--save_iterations", type=int, nargs="*", default=[])
    # reference flag alias: checkpoints save alongside PLYs in Trainer.save
    parser.add_argument("--checkpoint_iterations", type=int, nargs="*", default=[])
    parser.add_argument("--test_iterations", type=int, nargs="*", default=[])
    parser.add_argument("--ip", type=str, default="127.0.0.1",
                        help="live SIBR viewer listen address (train.py:377)")
    parser.add_argument("--port", type=int, default=0,
                        help="live viewer port; 0 disables the viewer "
                             "(reference default 6009)")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--backend", type=str, default=None,
                        help="pallas | jnp | None=auto")
    parser.add_argument("--mesh_data", type=int, default=1,
                        help="data-parallel mesh axis (cameras per step)")
    parser.add_argument("--mesh_gauss", type=int, default=1,
                        help="model-parallel mesh axis (splat + tile sharding)")
    parser.add_argument("--debug", action="store_true",
                        help="dump a state snapshot when a step produces NaNs")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="multi-host: coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    _add_dataclass_args(parser, ModelConfig)
    _add_dataclass_args(parser, OptimizationConfig)
    args = parser.parse_args(argv)

    # Multi-host wiring (runtime/distributed.py): must run before any jax use.
    from ex4dgs_tpu.runtime.distributed import initialize

    dist_info = initialize(coordinator_address=args.coordinator,
                           num_processes=args.num_processes,
                           process_id=args.process_id)
    if dist_info["process_count"] > 1:
        print(f"distributed: {dist_info}", flush=True)

    cfg, opt, pipe = ModelConfig(), OptimizationConfig(), PipelineConfig()
    if args.config:
        cfg = overlay_json(cfg, args.config)
        opt = overlay_json(opt, args.config)
        pipe = overlay_json(pipe, args.config)
    overrides = {k: v for k, v in vars(args).items() if v is not None}
    cfg = overlay_json(cfg, {k: v for k, v in overrides.items()
                             if k in {f.name for f in dataclasses.fields(ModelConfig)}})
    opt = overlay_json(opt, {k: v for k, v in overrides.items()
                             if k in {f.name for f in dataclasses.fields(OptimizationConfig)}})
    if not cfg.source_path:
        parser.error("--source_path is required")
    model_path = cfg.model_path or os.path.join("output", os.path.basename(cfg.source_path))
    os.makedirs(model_path, exist_ok=True)
    with open(os.path.join(model_path, "cfg_args.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg), **dataclasses.asdict(opt)}, f, indent=1)

    from ex4dgs_tpu.data.scene import Scene
    from ex4dgs_tpu.train.trainer import Trainer

    scene = Scene(cfg, model_path=model_path, save_input=True)

    model = opt_state = None
    if args.start_checkpoint:
        from ex4dgs_tpu.io.checkpoint import load_checkpoint
        from ex4dgs_tpu.models.density import push

        hm, start_it, extra = load_checkpoint(args.start_checkpoint)
        model, opt_state = push(hm, cfg)

    mesh = None
    if args.mesh_data * args.mesh_gauss > 1:
        from ex4dgs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh_data * args.mesh_gauss,
                         data=args.mesh_data, gauss=args.mesh_gauss)

    gui = None
    if args.port:
        from ex4dgs_tpu.viewer import NetworkViewer

        gui = NetworkViewer(args.ip, args.port)
        try:
            print(f"viewer listening on {args.ip}:{gui.init()}", flush=True)
        except OSError as e:
            print(f"viewer disabled: {e}", flush=True)
            gui = None

    trainer = Trainer(cfg, opt, scene, model=model, opt_state=opt_state,
                      seed=args.seed, backend=args.backend, mesh=mesh,
                      test_iterations=tuple(args.test_iterations),
                      debug_snapshot_dir=(os.path.join(model_path, "debug")
                                          if args.debug else None),
                      gui=gui)
    if args.start_checkpoint:
        trainer.iteration = start_it
        if "sample_len" in extra:
            trainer.sample_len = float(extra["sample_len"])
            scene.set_sampling_len(trainer.sample_len, sample_every=cfg.sample_every)

    save_at = sorted(set(args.save_iterations) | set(args.checkpoint_iterations)
                     | {opt.iterations})

    def progress(it, loss, psnr_val):
        if args.quiet:
            return
        print(f"[{it}/{opt.iterations}] loss={loss:.5f} psnr={psnr_val:.2f} "
              f"static={int(trainer.model.n_static())} "
              f"dynamic={int(trainer.model.n_dynamic())}", flush=True)

    for target in save_at:
        if trainer.iteration >= target:
            continue
        trainer.train(iterations=target, progress=progress)
        print(f"[ITER {target}] saving", flush=True)
        trainer.save(model_path, target)
    print("done", flush=True)


if __name__ == "__main__":
    main()
