"""Probe SSIM blur formulations on TPU at 1352x1014x3 (fwd and fwd+bwd)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

W, H = 1352, 1014
rng = np.random.default_rng(0)
img1 = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
img2 = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))

WIN, SIGMA = 11, 1.5
g = np.exp(-((np.arange(WIN) - WIN // 2) ** 2) / (2 * SIGMA**2))
g = (g / g.sum()).astype(np.float32)
gj = jnp.asarray(g)


def timeit(name, fn, *args, n=20):
    jf = jax.jit(fn)
    out = jax.block_until_ready(jf(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / n * 1e3:.2f} ms", flush=True)


# --- current: NHWC depthwise separable conv
def blur_nhwc(img):
    c = img.shape[-1]
    x = img[None]
    kh = jnp.tile(gj.reshape(WIN, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(gj.reshape(1, WIN, 1, 1), (1, 1, 1, c))
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    pad = WIN // 2
    x = lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn, feature_group_count=c)
    return x[0]


# --- channels-as-batch NCHW
def blur_nchw(img):
    x = img.transpose(2, 0, 1)[:, None]  # [3, 1, H, W]
    kh = gj.reshape(1, 1, WIN, 1)
    kw = gj.reshape(1, 1, 1, WIN)
    dn = lax.conv_dimension_numbers(x.shape, kh.shape, ("NCHW", "OIHW", "NCHW"))
    pad = WIN // 2
    x = lax.conv_general_dilated(x, kh, (1, 1), [(pad, pad), (0, 0)],
                                 dimension_numbers=dn)
    x = lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (pad, pad)],
                                 dimension_numbers=dn)
    return x[:, 0].transpose(1, 2, 0)


# --- shift-add along sublanes for H, matmul for W
BW = jnp.asarray(np.stack([np.roll(np.pad(g, (0, W - WIN)), i - WIN // 2)
                           for i in range(0)])) if False else None


def _band_matrix(n):
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        lo = i - WIN // 2
        for k in range(WIN):
            j = lo + k
            if 0 <= j < n:
                m[j, i] = g[k]
    return jnp.asarray(m)

BH = _band_matrix(H)
BWm = _band_matrix(W)


def blur_matmul(img):
    # H blur: [H, W*3] = BH^T @ img
    x = img.reshape(H, W * 3)
    x = jax.lax.dot_general(BH, x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # W blur: for each channel, x[h, w] -> sum_w' B[w', w] x[h, w']
    x = x.reshape(H, W, 3).transpose(0, 2, 1).reshape(H * 3, W)
    x = jax.lax.dot_general(x, BWm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x.reshape(H, 3, W).transpose(0, 2, 1)


def blur_matmul_bf16(img):
    x = img.astype(jnp.bfloat16).reshape(H, W * 3)
    x = jax.lax.dot_general(BH.astype(jnp.bfloat16), x, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = x.reshape(H, W, 3).transpose(0, 2, 1).reshape(H * 3, W).astype(jnp.bfloat16)
    x = jax.lax.dot_general(x, BWm.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return x.reshape(H, 3, W).transpose(0, 2, 1)


# --- shift-add both directions (pad + static slices; no cross-lane rotates:
# XLA lowers a W-direction shifted slice to a relayout copy, measure it)
def blur_shift(img):
    pad = WIN // 2
    x = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)))
    acc = None
    for k in range(WIN):
        t = g[k] * x[k:k + H]
        acc = t if acc is None else acc + t
    x = jnp.pad(acc, ((0, 0), (pad, pad), (0, 0)))
    acc = None
    for k in range(WIN):
        t = g[k] * x[:, k:k + W]
        acc = t if acc is None else acc + t
    return acc


C1, C2 = 0.01**2, 0.03**2


def ssim_with(blur, a, b):
    mu1, mu2 = blur(a), blur(b)
    s11, s22, s12 = blur(a * a), blur(b * b), blur(a * b)
    A1 = 2 * mu1 * mu2 + C1
    A2 = 2 * (s12 - mu1 * mu2) + C2
    B1 = mu1 * mu1 + mu2 * mu2 + C1
    B2 = (s11 - mu1 * mu1) + (s22 - mu2 * mu2) + C2
    return ((A1 * A2) / (B1 * B2)).mean()


for name, blur in (("nhwc(current)", blur_nhwc), ("nchw", blur_nchw),
                   ("matmul", blur_matmul), ("matmul_bf16", blur_matmul_bf16),
                   ("shift", blur_shift)):
    timeit(f"ssim fwd {name}", functools.partial(ssim_with, blur), img1, img2)
    timeit(f"ssim fwd+bwd {name}",
           jax.grad(functools.partial(ssim_with, blur)), img1, img2)

# sanity: all variants agree
v = [float(jax.jit(functools.partial(ssim_with, b))(img1, img2))
     for b in (blur_nhwc, blur_nchw, blur_matmul, blur_shift)]
print("values:", [round(x, 6) for x in v], flush=True)
vb = float(jax.jit(functools.partial(ssim_with, blur_matmul_bf16))(img1, img2))
print("bf16 value:", round(vb, 6), flush=True)
