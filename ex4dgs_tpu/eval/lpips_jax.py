"""LPIPS (Learned Perceptual Image Patch Similarity) in JAX.

Faithful re-implementation of the reference's lpipsPyTorch
(/root/reference/lpipsPyTorch/modules/lpips.py:8-36, networks.py:12-96,
utils.py:6-30): input scaling layer, backbone deep features at the standard
tap points, per-layer unit-normalization over channels, squared difference,
the learned 1x1 linear calibration, spatial mean, sum over layers.

The backbone + linear weights are NOT bundled (hundreds of MB, and this
environment has no network egress). They load from a single .npz produced by
`tools/convert_lpips_weights.py` on any machine with torchvision + lpips
installed; point `EX4DGS_LPIPS_WEIGHTS` at the directory holding
`lpips_alex.npz` / `lpips_vgg.npz` (default: ~/.cache/ex4dgs/lpips).

Without weights, callers must NOT report feature distances as LPIPS —
eval/metrics.py names the fallback `feat_dist_*` for exactly that reason.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# ImageNet-stat scaling layer (lpipsPyTorch/modules/networks.py:101-110)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# (out_ch, kernel, stride, pad, taps_after_relu?) per conv; 'M' = 3x3/2 maxpool
ALEX_LAYERS = [
    ("conv", 64, 11, 4, 2), ("tap",), ("pool", 3, 2),
    ("conv", 192, 5, 1, 2), ("tap",), ("pool", 3, 2),
    ("conv", 384, 3, 1, 1), ("tap",),
    ("conv", 256, 3, 1, 1), ("tap",),
    ("conv", 256, 3, 1, 1), ("tap",),
]
# VGG16 features with taps at relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG_LAYERS = [
    ("conv", 64, 3, 1, 1), ("conv", 64, 3, 1, 1), ("tap",), ("pool", 2, 2),
    ("conv", 128, 3, 1, 1), ("conv", 128, 3, 1, 1), ("tap",), ("pool", 2, 2),
    ("conv", 256, 3, 1, 1), ("conv", 256, 3, 1, 1), ("conv", 256, 3, 1, 1),
    ("tap",), ("pool", 2, 2),
    ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1),
    ("tap",), ("pool", 2, 2),
    ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1),
    ("tap",),
]


def weights_dir() -> str:
    return os.environ.get(
        "EX4DGS_LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/ex4dgs/lpips"),
    )


def load_weights(net: str) -> dict | None:
    """Load {conv{i}_w, conv{i}_b, lin{i}_w} arrays for `net` if present."""
    path = os.path.join(weights_dir(), f"lpips_{net}.npz")
    if not os.path.exists(path):
        return None
    z = np.load(path)
    return {k: z[k] for k in z.files}


def _conv(x, w, b, stride, pad):
    # x: [N, C, H, W]; w: [O, I, kh, kw] (torch layout)
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(w), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        # eval metric: keep f32 conv accuracy on TPU (the MXU's DEFAULT
        # precision is bf16, which would make the metric non-comparable to
        # the torch reference; perf is irrelevant here)
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + jnp.asarray(b).reshape(1, -1, 1, 1)


def _maxpool(x, k, s):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, k, k), (1, 1, s, s), "VALID"
    )


def _features(x, layers, weights):
    """Run the backbone, returning the tapped (post-relu) feature maps."""
    taps = []
    ci = 0
    for spec in layers:
        if spec[0] == "conv":
            _, _, k, stride, pad = spec
            x = _conv(x, weights[f"conv{ci}_w"], weights[f"conv{ci}_b"],
                      stride, pad)
            x = jax.nn.relu(x)
            ci += 1
        elif spec[0] == "pool":
            x = _maxpool(x, spec[1], spec[2])
        elif spec[0] == "tap":
            taps.append(x)
    return taps


def _unit_normalize(f, eps=1e-10):
    # networks.py normalize_activation: x / (||x||_2 over channels + eps)
    n = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
    return f / (n + eps)


def lpips_fn(img_a, img_b, layers, weights) -> jnp.ndarray:
    """LPIPS distance. img_*: [H, W, 3] float in [0, 1]."""
    def prep(im):
        # NCHW, values staying in [0, 1]: the reference feeds render.py's
        # clamped [0,1] tensors straight into BaseNet.z_score
        # (render.py:80-81, networks.py:50-53) — the vendored lpipsPyTorch
        # never rescales to the upstream convention's [-1, 1]. Parity means
        # mirroring that.
        im = im.transpose(2, 0, 1)[None]
        return (im - _SHIFT.reshape(1, 3, 1, 1)) / _SCALE.reshape(1, 3, 1, 1)

    fa = _features(prep(img_a), layers, weights)
    fb = _features(prep(img_b), layers, weights)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2  # [1, C, H, W]
        lin = jnp.asarray(weights[f"lin{i}_w"]).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * lin, axis=1))  # 1x1 conv + avg
    return total


class LPIPSJax:
    """Jitted LPIPS evaluator; None-producing if weights are unavailable."""

    def __init__(self, net: str = "alex"):
        assert net in ("alex", "vgg")
        self.net = net
        self.layers = ALEX_LAYERS if net == "alex" else VGG_LAYERS
        self.weights = load_weights(net)
        self._jit = None

    @property
    def available(self) -> bool:
        return self.weights is not None

    def __call__(self, img_a: np.ndarray, img_b: np.ndarray) -> float | None:
        if self.weights is None:
            return None
        if self._jit is None:
            w = {k: jnp.asarray(v) for k, v in self.weights.items()}
            self._jit = jax.jit(
                functools.partial(lpips_fn, layers=self.layers, weights=w)
            )
        return float(self._jit(jnp.asarray(img_a, jnp.float32),
                               jnp.asarray(img_b, jnp.float32)))
