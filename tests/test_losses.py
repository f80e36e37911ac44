"""Losses vs. independent torch implementations of the standard formulas."""
import numpy as np
import pytest

from ex4dgs_tpu.ops import losses

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _torch_ssim(img1, img2, window_size=11, sigma=1.5):
    """Standard windowed SSIM (Wang et al.) with a Gaussian window and zero
    same-padding — the formulation the reference uses (loss_utils.py:43-81)."""
    xs = torch.arange(window_size, dtype=torch.float64) - window_size // 2
    g = torch.exp(-(xs**2) / (2 * sigma**2))
    g = (g / g.sum()).float()
    win2d = torch.outer(g, g)[None, None]
    c = img1.shape[1]
    win = win2d.expand(c, 1, -1, -1)
    pad = window_size // 2
    mu1 = F.conv2d(img1, win, padding=pad, groups=c)
    mu2 = F.conv2d(img2, win, padding=pad, groups=c)
    s11 = F.conv2d(img1 * img1, win, padding=pad, groups=c) - mu1**2
    s22 = F.conv2d(img2 * img2, win, padding=pad, groups=c) - mu2**2
    s12 = F.conv2d(img1 * img2, win, padding=pad, groups=c) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s11 + s22 + c2)
    )


@pytest.mark.parametrize("shape", [(33, 47), (64, 64)])
def test_ssim_matches_torch(shape):
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(*shape, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)

    ours_map = np.asarray(losses.ssim(a, b, reduce=False))
    ta = torch.from_numpy(a).permute(2, 0, 1)[None]
    tb = torch.from_numpy(b).permute(2, 0, 1)[None]
    ref_map = _torch_ssim(ta, tb)[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours_map, ref_map, atol=2e-5)

    ours = float(losses.ssim(a, b))
    np.testing.assert_allclose(ours, ref_map.mean(), atol=2e-5)


def test_psnr_l1():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    b = np.clip(a + 0.1, 0, 1).astype(np.float32)
    mse = np.mean((a - b) ** 2)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20 * np.log10(1 / np.sqrt(mse)), rtol=1e-5)
    np.testing.assert_allclose(float(losses.l1_loss(a, b)), np.abs(a - b).mean(), rtol=1e-6)


def test_ssim_custom_vjp_matches_autodiff():
    """The closed-form SSIM backward must equal autodiff through the blurs."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    a = rng.uniform(size=(40, 56, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.15, size=a.shape), 0, 1).astype(np.float32)
    w = rng.normal(size=(40, 56, 3)).astype(np.float32)  # random cotangent

    def naive(img1, img2):
        blur = lambda x: losses._depthwise_blur(x, 11, 1.5)
        mu1, mu2 = blur(img1), blur(img2)
        s11 = blur(img1 * img1) - mu1 * mu1
        s22 = blur(img2 * img2) - mu2 * mu2
        s12 = blur(img1 * img2) - mu1 * mu2
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s11 + s22 + c2))
        return (m * w).sum()

    def ours(img1, img2):
        return (losses.ssim(img1, img2, reduce=False) * w).sum()

    # forward values agree
    np.testing.assert_allclose(float(ours(a, b)), float(naive(a, b)), rtol=1e-5)
    g_ref = jax.grad(naive, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    g_our = jax.grad(ours, argnums=(0, 1))(jnp.asarray(a), jnp.asarray(b))
    for x, y, name in zip(g_our, g_ref, ("img1", "img2")):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4,
                                   rtol=1e-3, err_msg=name)


def test_package_pins_f32_matmul_precision():
    """The TPU MXU's DEFAULT matmul precision rounds f32 operands to bf16,
    which put ~4e-3 noise into the SSIM variance statistics and made the
    denominator negative in flat image regions — the root cause of the
    800x600 quality-run collapse (BASELINE.md round 4). The package pins
    jax_default_matmul_precision at import; this guards against the pin
    being dropped (CPU tests are otherwise blind: CPU matmuls are f32)."""
    import os

    import jax

    import ex4dgs_tpu  # noqa: F401  (import installs the config)

    expect = os.environ.get("EX4DGS_MATMUL_PRECISION", "highest")
    assert jax.config.jax_default_matmul_precision == expect
