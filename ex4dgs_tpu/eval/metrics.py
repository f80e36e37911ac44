"""Evaluation metric suite: PSNR, SSIM (two variants), LPIPS (alex+vgg).

Mirrors render.py:76-81 in the reference:
  * `ssim` — the torch-style training SSIM (utils/loss_utils.py:22-81);
  * `ssim_skimage` — skimage.metrics.structural_similarity semantics
    (gaussian_weights=True, sigma 1.5, sample covariance N/(N-1), valid-region
    crop) which the reference also reports (render.py:78);
  * LPIPS — the full learned metric when weights are locally available
    (eval/lpips_jax.py), otherwise an honestly-named `feat_dist_*` is NOT
    produced here at all — callers get None and must not report it as LPIPS.
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter

from ..ops.losses import psnr as _psnr
from ..ops.losses import ssim as _ssim
from .lpips_jax import LPIPSJax


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_psnr(pred, gt))


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    return float(_ssim(pred, gt))


def ssim_skimage(pred: np.ndarray, gt: np.ndarray, data_range: float = 1.0) -> float:
    """skimage.metrics.structural_similarity with the reference's settings
    (render.py:78: gaussian_weights=True, channel_axis=-1, data_range=1).

    Differences from the torch-style `ssim` above, reproduced exactly:
    truncate=3.5 gaussian (radius 5 -> 11x11), *sample* covariance
    normalization NP/(NP-1), and the mean is taken over the valid region only
    (a (win-1)/2 = 5 pixel border crop), not over zero-padded convolutions.
    """
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    sigma, truncate = 1.5, 3.5
    r = int(truncate * sigma + 0.5)  # 5
    win = 2 * r + 1  # 11
    NP = win * win
    cov_norm = NP / (NP - 1.0)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2

    vals = []
    for c in range(pred.shape[-1]):
        X, Y = pred[..., c], gt[..., c]
        f = lambda a: gaussian_filter(a, sigma=sigma, truncate=truncate)
        ux, uy = f(X), f(Y)
        uxx, uyy, uxy = f(X * X), f(Y * Y), f(X * Y)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
            (ux * ux + uy * uy + C1) * (vx + vy + C2)
        )
        vals.append(S[r:-r, r:-r].mean())  # crop the filter-radius border
    return float(np.mean(vals))


# Backwards-compatible alias (pre-round-2 name); now a REAL skimage-style
# implementation instead of a relabeled torch SSIM.
ssim_skimage_style = ssim_skimage


class LPIPS:
    """LPIPS evaluator. Resolution order:
    1. the `lpips` pip package if importable (exact reference stack);
    2. the JAX re-implementation with vendored weights (lpips_jax.py);
    3. unavailable -> returns None (callers must not substitute a proxy
       under an lpips_* name; see feat_dist below for the labeled proxy).
    """

    def __init__(self, net: str = "alex"):
        self.net_name = net
        self._model = None
        self.error: str | None = None

    def _build(self):
        try:
            import lpips  # type: ignore

            self._model = ("pkg", lpips.LPIPS(net=self.net_name, verbose=False))
            return
        except Exception:
            pass
        jx = LPIPSJax(self.net_name)
        if jx.available:
            self._model = ("jax", jx)
            return
        self.error = (
            f"lpips_{self.net_name} unavailable: no `lpips` package and no "
            f"vendored weights (run tools/convert_lpips_weights.py and set "
            f"EX4DGS_LPIPS_WEIGHTS)"
        )

    def __call__(self, pred: np.ndarray, gt: np.ndarray) -> float | None:
        if self._model is None and self.error is None:
            self._build()
        if self._model is None:
            return None
        kind, m = self._model
        if kind == "jax":
            return m(pred, gt)
        import torch

        # [0,1] fed straight in, mirroring the reference: render.py:80-81
        # passes clamped [0,1] tensors to its vendored lpipsPyTorch without
        # the upstream [-1,1] rescale, so reference-comparable numbers
        # require the same (mis)use here.
        a = torch.from_numpy(np.ascontiguousarray(pred)).permute(2, 0, 1)[None]
        b = torch.from_numpy(np.ascontiguousarray(gt)).permute(2, 0, 1)[None]
        with torch.no_grad():
            return float(m(a.float(), b.float()).item())
