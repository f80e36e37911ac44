#!/usr/bin/env python
"""Export LPIPS backbone + linear-calibration weights to the .npz schema
consumed by ex4dgs_tpu/eval/lpips_jax.py.

Run this ONCE on any machine with network access and `torchvision` + `lpips`
(pip) installed, then copy the produced files into the directory pointed to
by EX4DGS_LPIPS_WEIGHTS (default ~/.cache/ex4dgs/lpips):

    python tools/convert_lpips_weights.py --out ~/.cache/ex4dgs/lpips

Schema per net: conv{i}_w [O,I,kh,kw], conv{i}_b [O], lin{i}_w [C]
(the 1x1 learned calibration of lpipsPyTorch/modules/lpips.py:8-36).
"""
import argparse
import os

import numpy as np


def export(net: str, out_dir: str) -> str:
    import lpips as lpips_pkg  # pip install lpips
    import torch

    model = lpips_pkg.LPIPS(net=net, verbose=False)
    arrays = {}
    convs = [m for m in model.net.modules()
             if isinstance(m, torch.nn.Conv2d)]
    for i, c in enumerate(convs):
        arrays[f"conv{i}_w"] = c.weight.detach().numpy()
        arrays[f"conv{i}_b"] = c.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        arrays[f"lin{i}_w"] = w.reshape(-1)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"lpips_{net}.npz")
    np.savez(path, **arrays)
    return path


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.expanduser("~/.cache/ex4dgs/lpips"))
    ap.add_argument("--nets", nargs="*", default=["alex", "vgg"])
    args = ap.parse_args()
    for net in args.nets:
        print("wrote", export(net, args.out))
