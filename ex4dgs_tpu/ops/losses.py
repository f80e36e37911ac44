"""Image losses and metrics: L1, windowed SSIM, PSNR.

Numerics mirror the reference (utils/loss_utils.py:22-81, utils/image_utils.py:14-19):
SSIM uses an 11x11 Gaussian window (sigma 1.5), same-padding depthwise conv,
C1=0.01^2, C2=0.03^2. Images are channel-last [H, W, C] here (TPU-friendly);
the depthwise convolution lowers to XLA's fused conv on the MXU.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the whole image (image_utils.py:17-19)."""
    mse = jnp.mean((pred - gt) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> tuple:
    g = [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2)) for x in range(window_size)]
    s = sum(g)
    return tuple(v / s for v in g)


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, window_size: int, sigma: float):
    """[n, n] banded blur operator: out = B^T x blurs along an axis of length
    n with zero boundary handling (the band simply truncates at the edges —
    identical to F.conv2d's zero same-padding in the reference)."""
    import numpy as np

    g = _gaussian_window(window_size, sigma)
    m = np.zeros((n, n), np.float32)
    half = window_size // 2
    for i in range(n):
        lo = i - half
        for k in range(window_size):
            j = lo + k
            if 0 <= j < n:
                m[j, i] = g[k]
    return m  # numpy: jnp conversion happens per-trace (never cache tracers)


def _depthwise_blur_shifts(img: jnp.ndarray, window_size: int,
                           sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W, C] with zero same-padding, as
    window_size shifted multiply-adds per axis on the VPU.

    Exact f32 (no MXU involved): the alternative to the banded-matmul blur
    below when the matmul must run at HIGHEST precision — 2x11 fused
    elementwise passes beat 2x6 dense f32 MXU passes over a 97%-zero band
    matrix. Zero boundary semantics are identical (pad + truncated taps)."""
    g = _gaussian_window(window_size, sigma)
    half = window_size // 2
    h, w, c = img.shape

    def axis0_blur(x, n):  # [n, m]: taps shift along the SUBLANE axis —
        # contiguous aligned slices that fuse into one pass (lane-axis
        # shifts would be stride-c rotates, measured ~5x slower)
        xp = jnp.pad(x, ((half, half), (0, 0)))
        out = None
        for k, gk in enumerate(g):
            t = jnp.float32(gk) * lax.slice_in_dim(xp, k, k + n, axis=0)
            out = t if out is None else out + t
        return out

    x = axis0_blur(img.reshape(h, w * c), h)
    x = jnp.swapaxes(x.reshape(h, w, c), 0, 1).reshape(w, h * c)
    x = axis0_blur(x, w)
    return jnp.swapaxes(x.reshape(w, h, c), 0, 1)


def _depthwise_blur_matmul(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of [H, W, C] with zero same-padding, as two
    banded-matrix matmuls.

    An 11-tap depthwise conv over C=3 NHWC uses 3 of 128 lanes on TPU; the
    same blur phrased as [H,H]x[H,W*C] and [H*C,W]x[W,W] MXU matmuls runs ~7x
    faster (measured 17 ms -> 2.3 ms at 1352x1014) and is numerically
    identical (the band encodes the reference's zero padding exactly)."""
    h, w, c = img.shape
    bh = jnp.asarray(_band_matrix(h, window_size, sigma), img.dtype)
    bw = jnp.asarray(_band_matrix(w, window_size, sigma), img.dtype)
    # precision=HIGHEST: the TPU MXU multiplies in bf16 by DEFAULT, which
    # rounds the image operand to an 8-bit mantissa. The SSIM variance
    # sigma^2 = blur(x^2) - mu^2 then carries ~4e-3 absolute noise — bigger
    # than C2 = 9e-4 — so in flat regions (black background) the denominator
    # b2 goes NEGATIVE and the SSIM map explodes to +-hundreds. This single
    # flag was the root cause of the 800x600 quality-run collapse (loss
    # oscillating +-0.8 / SSIM outside [-1,1] / NaN cascade, BASELINE.md
    # round-4 note); f32-accumulating 6-pass matmuls restore CPU-identical
    # statistics at a measured ~x3 blur cost.
    x = img.reshape(h, w * c)
    x = lax.dot_general(bh, x, (((0,), (0,)), ((), ())),
                        preferred_element_type=img.dtype,
                        precision=lax.Precision.HIGHEST)
    x = x.reshape(h, w, c).transpose(0, 2, 1).reshape(h * c, w)
    x = lax.dot_general(x, bw, (((1,), (0,)), ((), ())),
                        preferred_element_type=img.dtype,
                        precision=lax.Precision.HIGHEST)
    return x.reshape(h, c, w).transpose(0, 2, 1)


from ..kernel_config import current as _kernel_config

# Rebindable (kernel_config.configure()): EX4DGS_SSIM_BLUR override.
SSIM_BLUR = _kernel_config().ssim_blur


def _depthwise_blur(img: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    if SSIM_BLUR == "matmul":
        return _depthwise_blur_matmul(img, window_size, sigma)
    return _depthwise_blur_shifts(img, window_size, sigma)


_C1 = 0.01**2
_C2 = 0.03**2


def _ssim_stats(img1, img2, window_size, sigma):
    # One blur for all five moment maps: the separable blur treats channels
    # independently, so stacking on C amortizes the pad/shift passes 5x.
    c = img1.shape[-1]
    stacked = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=-1)
    b = _depthwise_blur(stacked, window_size, sigma)
    return b[..., :c], b[..., c:2*c], b[..., 2*c:3*c], b[..., 3*c:4*c], b[..., 4*c:]


def _ssim_map_from_stats(mu1, mu2, s11, s22, s12):
    a1 = 2 * mu1 * mu2 + _C1
    a2 = 2 * (s12 - mu1 * mu2) + _C2
    b1 = mu1 * mu1 + mu2 * mu2 + _C1
    b2 = (s11 - mu1 * mu1) + (s22 - mu2 * mu2) + _C2
    return (a1 * a2) / (b1 * b2), (a1, a2, b1, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _ssim_map(img1, img2, window_size, sigma):
    mu1, mu2, s11, s22, s12 = _ssim_stats(img1, img2, window_size, sigma)
    return _ssim_map_from_stats(mu1, mu2, s11, s22, s12)[0]


def _ssim_map_fwd(img1, img2, window_size, sigma):
    stats = _ssim_stats(img1, img2, window_size, sigma)
    s, coefs = _ssim_map_from_stats(*stats)
    return s, (img1, img2, stats, coefs, s)


def _ssim_map_bwd(window_size, sigma, res, g):
    """Closed-form windowed-SSIM gradient: 3 transposed blurs per input (the
    Gaussian window is symmetric, so blur^T == blur) instead of autodiff's ~10.

    With S = A1 A2 / (B1 B2): dS/dA1 = S/A1 etc.; the moment partials are
    dA1/dmu1 = 2 mu2, dA2/dmu1 = -2 mu2, dB1/dmu1 = 2 mu1, dB2/dmu1 = -2 mu1,
    dA2/ds12 = 2, dB2/ds11 = 1; and mu/s are window-blurs of x, x^2, xy."""
    img1, img2, (mu1, mu2, s11, s22, s12), (a1, a2, b1, b2), s = res
    gs = g * s
    c_mu1 = 2 * gs * (mu2 / a1 - mu2 / a2 - mu1 / b1 + mu1 / b2)
    c_mu2 = 2 * gs * (mu1 / a1 - mu1 / a2 - mu2 / b1 + mu2 / b2)
    c_s11 = -gs / b2
    c_s12 = 2 * gs / a2
    # Cotangent maps blurred channel-stacked (see _ssim_stats) — but in TWO
    # stacks, keyed by which input consumes them: training differentiates
    # only img1 (img2 = ground truth), and keeping c_mu2 out of the d1 stack
    # lets XLA dead-code the whole d2 blur when d2's cotangent is unused
    # (one concat over all four fields would pin all 12 channels live).
    c = img1.shape[-1]
    b = _depthwise_blur(
        jnp.concatenate([c_mu1, c_s11, c_s12], axis=-1), window_size, sigma)
    b_mu1, b_s11, b_s12 = b[..., :c], b[..., c:2*c], b[..., 2*c:]
    d1 = b_mu1 + 2 * img1 * b_s11 + img2 * b_s12
    b2_ = _depthwise_blur(
        jnp.concatenate([c_mu2, c_s11, c_s12], axis=-1), window_size, sigma)
    b_mu2, b_s11b, b_s12b = b2_[..., :c], b2_[..., c:2*c], b2_[..., 2*c:]
    d2 = b_mu2 + 2 * img2 * b_s11b + img1 * b_s12b
    return d1, d2


_ssim_map.defvjp(_ssim_map_fwd, _ssim_map_bwd)


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    reduce: bool = True,
) -> jnp.ndarray:
    """SSIM of [H, W, C] images; reduce=False returns the per-pixel map [H, W, C]."""
    ssim_map = _ssim_map(img1, img2, window_size, sigma)
    return ssim_map.mean() if reduce else ssim_map


def combined_loss(pred: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float = 0.2):
    """(1-λ)·L1 + λ·(1-SSIM) — the training loss (train.py:144-145)."""
    ll1 = l1_loss(pred, gt)
    return (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(pred, gt)), ll1
