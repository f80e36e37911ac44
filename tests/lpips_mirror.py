"""Torch-module mirror of the reference's lpipsPyTorch for parity testing.

Builds the exact module structure of /root/reference/lpipsPyTorch/modules/
networks.py:12-96 (torchvision alexnet/vgg16 `features` stacks, 1-indexed
target_layers tap logic, z_score scaling, per-tap channel normalization,
bias-free 1x1 linear calibration, spatial mean, layer sum) in plain torch —
torchvision isn't in this image, but the `features` Sequentials are
canonical and written out here. Weights are injected (random, shared with
the JAX side), so any conv/stride/pad/tap mismatch in eval/lpips_jax.py
shows up as a numeric difference at some tap point.
"""
import numpy as np

# (out_channels, kernel, stride, pad) conv specs and 'M'/(k,s) pools, in the
# torchvision `features` order; target = 1-indexed module positions whose
# output is tapped (networks.py:80-83, 93-95).
ALEX_FEATURES = [
    ("conv", 64, 11, 4, 2), ("relu",), ("pool", 3, 2),
    ("conv", 192, 5, 1, 2), ("relu",), ("pool", 3, 2),
    ("conv", 384, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",),
    ("conv", 256, 3, 1, 1), ("relu",), ("pool", 3, 2),
]
ALEX_TARGETS = [2, 5, 8, 10, 12]

_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
VGG_FEATURES = []
for _v in _VGG_CFG:
    if _v == "M":
        VGG_FEATURES.append(("pool", 2, 2))
    else:
        VGG_FEATURES.append(("conv", _v, 3, 1, 1))
        VGG_FEATURES.append(("relu",))
VGG_TARGETS = [4, 9, 16, 23, 30]


def make_random_weights(net: str, rng: np.random.Generator,
                        scale: float = 0.2) -> dict:
    """Random weights in lpips_jax's npz key layout, deterministic in rng."""
    specs = ALEX_FEATURES if net == "alex" else VGG_FEATURES
    weights, cin, ci = {}, 3, 0
    taps = ALEX_TARGETS if net == "alex" else VGG_TARGETS
    tap_channels = []
    for i, spec in enumerate(specs, 1):
        if spec[0] == "conv":
            o, k = spec[1], spec[2]
            weights[f"conv{ci}_w"] = rng.normal(
                scale=scale / np.sqrt(cin * k * k),
                size=(o, cin, k, k)).astype(np.float32)
            weights[f"conv{ci}_b"] = rng.normal(
                scale=0.05, size=(o,)).astype(np.float32)
            cin = o
            ci += 1
        if i in taps:
            tap_channels.append(cin)
    for li, c in enumerate(tap_channels):
        weights[f"lin{li}_w"] = np.abs(
            rng.normal(size=(c,))).astype(np.float32)
    return weights


def torch_lpips(img_a: np.ndarray, img_b: np.ndarray, net: str,
                weights: dict):
    """The reference pipeline in torch; returns (distance, taps_a) where
    taps_a are the normalized tap activations of img_a (lpips.py:31-36)."""
    import torch
    import torch.nn as nn

    specs = ALEX_FEATURES if net == "alex" else VGG_FEATURES
    targets = ALEX_TARGETS if net == "alex" else VGG_TARGETS

    modules, cin, ci = [], 3, 0
    for spec in specs:
        if spec[0] == "conv":
            _, o, k, s, p = spec
            conv = nn.Conv2d(cin, o, k, s, p)
            with torch.no_grad():
                conv.weight.copy_(torch.from_numpy(weights[f"conv{ci}_w"]))
                conv.bias.copy_(torch.from_numpy(weights[f"conv{ci}_b"]))
            modules.append(conv)
            cin = o
            ci += 1
        elif spec[0] == "relu":
            modules.append(nn.ReLU())
        else:
            modules.append(nn.MaxPool2d(spec[1], spec[2]))
    seq = nn.Sequential(*modules)

    mean = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    std = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def normalize_activation(x, eps=1e-10):  # utils.py:6-8
        norm = torch.sqrt(torch.sum(x**2, dim=1, keepdim=True))
        return x / (norm + eps)

    def forward(img):  # networks.py:52-62 — [0,1] input, z_score only
        x = torch.from_numpy(img.transpose(2, 0, 1)[None].copy())
        x = (x - mean) / std
        out = []
        for i, layer in enumerate(seq, 1):
            x = layer(x)
            if i in targets:
                out.append(normalize_activation(x))
            if len(out) == len(targets):
                break
        return out

    with torch.no_grad():
        fa, fb = forward(img_a), forward(img_b)
        total = torch.zeros(())
        for li, (a, b) in enumerate(zip(fa, fb)):
            d = (a - b) ** 2
            lin = torch.from_numpy(weights[f"lin{li}_w"]).view(1, -1, 1, 1)
            total = total + (d * lin).sum(1, keepdim=True).mean((2, 3))
    return float(total), [t.numpy() for t in fa]
